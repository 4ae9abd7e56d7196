"""Compare flat int4 decode-attention kernel variants on chip.

Timing method: run the full 28-layer scan chained n times inside one jit
(q fed back through the output), measure n=2 and n=10, and report
(t10 - t2) / 8 — this cancels the ~35 ms fixed axon-tunnel dispatch
overhead that poisons naive per-call timing.

Variants:
  cur   — flat_decode.flat_decode_attend_int4 as shipped (bf16 NT score
          matmul, full dequant per block, grid = R/2048)
  f32   — same structure but dequant to f32 and f32 score matmul
          (escapes the bf16 minor-minor Mosaic slow path)
  dma   — grid-free single-program kernel: double-buffered manual DMA of a
          fused (R,128) uint8 KV block + (8,R) f32 meta block, unpack to
          int-valued f32, scale applied on the score tile, BLKH=2048
  dma4  — dma with BLKH=4096

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tools/bench_flat_variants.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4  # noqa: E402

L, H, Hkv, D = 28, 28, 4, 128
R = 157696
TCAP = 320
NEG_INF = float("-inf")


def log(m):
    print(m, file=sys.stderr, flush=True)


# --------------------------------------------------------------- f32 variant
def _int4_f32_kernel(meta_ref, q_ref, rh_ref, kq_ref, ks_ref, kz_ref,
                     vq_ref, vs_ref, vz_ref, kt_ref, vt_ref,
                     o_ref, m_scr, l_scr, acc_scr,
                     *, block, n_q, g, scale, dtype):
    kb = pl.program_id(0)
    nb = pl.num_programs(0)
    HT, Dd = q_ref.shape
    Tcap = kt_ref.shape[1]
    Hkv_ = kt_ref.shape[0]
    tail_len = meta_ref[0]

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, Dd), jnp.float32)

    q = q_ref[...].astype(jnp.float32)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (HT, 1), 0)
    q_kvhead = (r_ids // n_q) // g

    def dequant(p_ref, s_ref, z_ref):
        pi = p_ref[...].astype(jnp.int32)
        hi = (pi >> 4).astype(jnp.float32)
        lo = (pi & 0xF).astype(jnp.float32)
        x = jnp.concatenate([hi, lo], axis=-1)
        s = s_ref[...].reshape(block, 1)
        z = z_ref[...].reshape(block, 1)
        return x * s + z  # f32 (block, D)

    k_blk = dequant(kq_ref, ks_ref, kz_ref)
    v_blk = dequant(vq_ref, vs_ref, vz_ref)

    s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    mask = rh_ref[...] == q_kvhead
    s = jnp.where(mask, s, NEG_INF)
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[...] = m_new

    @pl.when(kb == nb - 1)
    def _():
        rows_h = g * n_q
        col_t = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 0) % n_q
        maskt = col_t < tail_len + qi + 1
        for hh in range(Hkv_):
            sl = slice(hh * rows_h, (hh + 1) * rows_h)
            st = jax.lax.dot_general(
                q[sl], kt_ref[hh].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            st = jnp.where(maskt, st, NEG_INF)
            m_prev = m_scr[sl]
            m_new = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
            a2 = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
            pt = jnp.where(jnp.isfinite(st), jnp.exp(st - m_new), 0.0)
            l_scr[sl] = l_scr[sl] * a2 + jnp.sum(pt, axis=1, keepdims=True)
            acc_scr[sl] = acc_scr[sl] * a2 + jax.lax.dot_general(
                pt, vt_ref[hh].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[sl] = m_new
        o_ref[...] = (acc_scr[...] /
                      jnp.maximum(l_scr[...], 1e-37)).astype(dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block"))
def attend_int4_f32(q, k_flat_q, k_flat_s, k_flat_z, v_flat_q, v_flat_s,
                    v_flat_z, row_head, k_tail, v_tail, tail_len, *,
                    scale, block=2048):
    T, H_, D_ = q.shape
    Hkv_, Tcap, _ = k_tail.shape
    G = H_ // Hkv_
    R_ = k_flat_q.shape[0]
    BLK = block
    nb = R_ // BLK
    q2 = q.transpose(1, 0, 2).reshape(H_ * T, D_)
    meta = tail_len.astype(jnp.int32)[None]

    def blk1(kb, m):
        return (0, kb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((H_ * T, D_), lambda kb, m: (0, 0)),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((BLK, D_ // 2), lambda kb, m: (kb, 0)),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((BLK, D_ // 2), lambda kb, m: (kb, 0)),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((Hkv_, Tcap, D_), lambda kb, m: (0, 0, 0)),
            pl.BlockSpec((Hkv_, Tcap, D_), lambda kb, m: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((H_ * T, D_), lambda kb, m: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H_ * T, 1), jnp.float32),
            pltpu.VMEM((H_ * T, 1), jnp.float32),
            pltpu.VMEM((H_ * T, D_), jnp.float32),
        ],
    )
    kernel = functools.partial(_int4_f32_kernel, block=BLK, n_q=T, g=G,
                               scale=scale, dtype=q.dtype)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H_ * T, D_), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(meta, q2, row_head.astype(jnp.int32)[None],
      k_flat_q, k_flat_s.astype(jnp.float32)[None],
      k_flat_z.astype(jnp.float32)[None],
      v_flat_q, v_flat_s.astype(jnp.float32)[None],
      v_flat_z.astype(jnp.float32)[None], k_tail, v_tail)
    return out.reshape(H_, T, D_).transpose(1, 0, 2)


# --------------------------------------------------------------- dma variant
def _dma_kernel(q_ref, kt_ref, vt_ref, tl_ref, kq_hbm, vq_hbm, meta_hbm,
                o_ref, kq_buf, vq_buf, meta_buf, sem, m_scr, l_scr, acc_scr,
                *, blkh, nb, n_q, g, scale, dtype):
    HT, Dd = q_ref.shape
    Hkv_, Tcap, _ = kt_ref.shape

    def dma_kq(b, slot):
        return pltpu.make_async_copy(
            kq_hbm.at[pl.ds(b * blkh, blkh), :], kq_buf.at[slot],
            sem.at[slot, 0])

    def dma_vq(b, slot):
        return pltpu.make_async_copy(
            vq_hbm.at[pl.ds(b * blkh, blkh), :], vq_buf.at[slot],
            sem.at[slot, 1])

    def dma_meta(b, slot):
        return pltpu.make_async_copy(
            meta_hbm.at[:, pl.ds(b * blkh, blkh)], meta_buf.at[slot],
            sem.at[slot, 2])

    m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
    l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
    acc_scr[...] = jnp.zeros((HT, Dd), jnp.float32)

    q = q_ref[...].astype(jnp.float32)
    q_sum = jnp.sum(q, axis=1, keepdims=True)  # for the zero-point term
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (HT, 1), 0)
    q_kvhead = ((r_ids // n_q) // g).astype(jnp.float32)

    dma_kq(0, 0).start()
    dma_vq(0, 0).start()
    dma_meta(0, 0).start()

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nb)
        def _():
            dma_kq(b + 1, (b + 1) % 2).start()
            dma_vq(b + 1, (b + 1) % 2).start()
            dma_meta(b + 1, (b + 1) % 2).start()

        dma_kq(b, slot).wait()
        dma_vq(b, slot).wait()
        dma_meta(b, slot).wait()

        kqi = kq_buf[slot].astype(jnp.int32)      # (blkh, 64)
        vqi = vq_buf[slot].astype(jnp.int32)
        kx = jnp.concatenate(
            [(kqi >> 4), (kqi & 0xF)], axis=1).astype(jnp.float32)
        vx = jnp.concatenate(
            [(vqi >> 4), (vqi & 0xF)], axis=1).astype(jnp.float32)
        meta = meta_buf[slot]
        k_s = meta[0:1]                           # (1, blkh)
        k_z = meta[1:2]
        v_s = meta[2:3]
        v_z = meta[3:4]
        rh = meta[4:5]                            # head id as f32, -1 pad

        # s = scale * (k_s * (q . kx) + k_z * q_sum)
        s_raw = jax.lax.dot_general(q, kx, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = (s_raw * k_s + q_sum * k_z) * scale
        mask = rh == q_kvhead
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        # acc += (p * v_s) @ vx + (p . v_z) * ones(D)
        ps = p * v_s
        pz = jnp.sum(p * v_z, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + pz + jax.lax.dot_general(
            ps, vx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[...] = m_new
        return 0

    jax.lax.fori_loop(0, nb, body, 0)

    # tail (bf16, small)
    tail_len = tl_ref[0]
    rows_h = g * n_q
    col_t = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 1)
    qi = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 0) % n_q
    maskt = col_t < tail_len + qi + 1
    for hh in range(Hkv_):
        sl = slice(hh * rows_h, (hh + 1) * rows_h)
        st = jax.lax.dot_general(
            q[sl], kt_ref[hh].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        st = jnp.where(maskt, st, NEG_INF)
        m_prev = m_scr[sl]
        m_new = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
        a2 = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
        pt = jnp.where(jnp.isfinite(st), jnp.exp(st - m_new), 0.0)
        l_scr[sl] = l_scr[sl] * a2 + jnp.sum(pt, axis=1, keepdims=True)
        acc_scr[sl] = acc_scr[sl] * a2 + jax.lax.dot_general(
            pt, vt_ref[hh].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[sl] = m_new
    o_ref[...] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)).astype(dtype)


@functools.partial(jax.jit, static_argnames=("scale", "blkh"))
def attend_int4_dma(q, kq_flat, vq_flat, meta_fused, k_tail, v_tail,
                    tail_len, *, scale, blkh=2048):
    T, H_, D_ = q.shape
    Hkv_, Tcap, _ = k_tail.shape
    G = H_ // Hkv_
    R_ = kq_flat.shape[0]
    nb = R_ // blkh
    q2 = q.transpose(1, 0, 2).reshape(H_ * T, D_)
    kernel = functools.partial(_dma_kernel, blkh=blkh, nb=nb, n_q=T, g=G,
                               scale=scale, dtype=q.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H_ * T, D_), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),   # q
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),   # k_tail
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),   # v_tail
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),   # tail_len
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),    # kq
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),    # vq
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),    # meta
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, blkh, 64), jnp.uint8),
            pltpu.VMEM((2, blkh, 64), jnp.uint8),
            pltpu.VMEM((2, 8, blkh), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((H_ * T, 1), jnp.float32),
            pltpu.VMEM((H_ * T, 1), jnp.float32),
            pltpu.VMEM((H_ * T, D_), jnp.float32),
        ],
    )(q2, k_tail, v_tail, tail_len.astype(jnp.int32)[None],
      kq_flat, vq_flat, meta_fused)
    return out.reshape(H_, T, D_).transpose(1, 0, 2)


# ------------------------------------------------------------------ harness
def main():
    key = jax.random.PRNGKey(0)
    rows_per_head = R // Hkv
    row_head = np.repeat(np.arange(Hkv, dtype=np.int32), rows_per_head)
    data = dict(
        kq=jax.random.randint(key, (L, R, D // 2), 0, 255, jnp.uint8),
        vq=jax.random.randint(key, (L, R, D // 2), 0, 255, jnp.uint8),
        ks=jnp.full((L, R), 0.01, jnp.bfloat16),
        kz=jnp.full((L, R), -0.05, jnp.bfloat16),
        vs=jnp.full((L, R), 0.01, jnp.bfloat16),
        vz=jnp.full((L, R), -0.05, jnp.bfloat16),
        rh=jnp.asarray(np.broadcast_to(row_head, (L, R))),
        kt=jnp.zeros((L, Hkv, TCAP, D), jnp.bfloat16),
        vt=jnp.zeros((L, Hkv, TCAP, D), jnp.bfloat16),
    )
    # fused meta layout for dma variant
    meta = np.zeros((L, 8, R), np.float32)
    meta[:, 0] = np.asarray(data["ks"], np.float32)
    meta[:, 1] = np.asarray(data["kz"], np.float32)
    meta[:, 2] = np.asarray(data["vs"], np.float32)
    meta[:, 3] = np.asarray(data["vz"], np.float32)
    meta[:, 4] = np.asarray(data["rh"], np.float32)
    meta_fused = jnp.asarray(meta)
    tail_len = jnp.zeros((), jnp.int32)
    q0 = jax.random.normal(key, (1, H, D), jnp.bfloat16)
    scale = D ** -0.5

    def chain(layer_fn, n):
        @jax.jit
        def run(q):
            def rep(q, _):
                def body(qc, xs):
                    o = layer_fn(qc, xs)
                    return o, None
                q, _ = jax.lax.scan(body, q, data_stacked)
                return q, None
            q, _ = jax.lax.scan(rep, q, None, length=n)
            return q
        return run

    results = {}

    def measure(name, layer_fn, stacked):
        global data_stacked
        data_stacked = stacked
        r2 = chain(layer_fn, 2)
        r10 = chain(layer_fn, 10)
        try:
            out = jax.device_get(r2(q0))
            t0 = time.time(); jax.device_get(r2(q0)); t2 = time.time() - t0
            jax.device_get(r10(q0))
            t0 = time.time(); jax.device_get(r10(q0)); t10 = time.time() - t0
        except Exception as e:
            log(f"{name:8s} FAILED: {str(e)[:300]}")
            return
        per = (t10 - t2) / 8
        results[name] = per
        log(f"{name:8s} per-28-layer-step {per * 1e3:8.2f} ms   "
            f"(t2={t2 * 1e3:.1f} t10={t10 * 1e3:.1f})")

    # cur
    def cur_layer(q, xs):
        kq, ks, kz, vq, vs, vz, rh = xs
        return flat_decode_attend_int4(
            q, kq, ks, kz, vq, vs, vz, rh, data["kt"][0], data["vt"][0],
            tail_len, scale=scale)
    measure("cur", cur_layer,
            (data["kq"], data["ks"], data["kz"], data["vq"], data["vs"],
             data["vz"], data["rh"]))

    # f32
    def f32_layer(q, xs):
        kq, ks, kz, vq, vs, vz, rh = xs
        return attend_int4_f32(
            q, kq, ks, kz, vq, vs, vz, rh, data["kt"][0], data["vt"][0],
            tail_len, scale=scale)
    measure("f32", f32_layer,
            (data["kq"], data["ks"], data["kz"], data["vq"], data["vs"],
             data["vz"], data["rh"]))

    # dma
    def dma_layer(q, xs):
        kq, vq, mt = xs
        return attend_int4_dma(q, kq, vq, mt, data["kt"][0], data["vt"][0],
                               tail_len, scale=scale)
    measure("dma", dma_layer, (data["kq"], data["vq"], meta_fused))

    # dma with 4096 blocks (R divisible? 157696/4096 = 38.5 -> pad)
    R4 = ((R + 4095) // 4096) * 4096
    kq4 = jnp.pad(data["kq"], ((0, 0), (0, R4 - R), (0, 0)))
    vq4 = jnp.pad(data["vq"], ((0, 0), (0, R4 - R), (0, 0)))
    mt4 = np.zeros((L, 8, R4), np.float32)
    mt4[:, :, :R] = meta
    mt4[:, 4, R:] = -1.0
    mt4 = jnp.asarray(mt4)

    def dma4_layer(q, xs):
        kq, vq, mt = xs
        return attend_int4_dma(q, kq, vq, mt, data["kt"][0], data["vt"][0],
                               tail_len, scale=scale, blkh=4096)
    measure("dma4", dma4_layer, (kq4, vq4, mt4))

    # correctness cross-check: dma vs cur on one layer
    o_cur = jax.device_get(cur_layer(q0, (data["kq"][0], data["ks"][0],
                                          data["kz"][0], data["vq"][0],
                                          data["vs"][0], data["vz"][0],
                                          data["rh"][0])))
    o_dma = jax.device_get(dma_layer(
        q0, (data["kq"][0], data["vq"][0], meta_fused[0])))
    err = np.abs(o_cur.astype(np.float32) - o_dma.astype(np.float32)).max()
    log(f"dma vs cur max abs err: {err:.4f}")

    log(f"RESULTS: {results}")


if __name__ == "__main__":
    main()
