"""Pallas flash attention over the INT4 KV cache (prefill/scoring path).

Same masking semantics as ``ops.flash`` but the K/V blocks arrive packed
(split nibble layout, one quant group per row — ``ops.quant``). v2 design
(mirrors the flat-decode rework that took the decode kernel 28 -> 3.3 ms):

- **manual double-buffered DMA** with a dynamic kv trip count: the grid is
  only (kv_head, q_block); kv blocks beyond the live length are never
  fetched and never cost a grid step (the v1 pipelined grid paid the
  2-4 us/step floor + scalar index_map evals for every dead block of the
  full capacity);
- **K and V nibbles stored transposed** ``(Hkv, D//2, C)``: the score matmul
  is NN (the bf16 NT minor x minor contraction is a ~7x Mosaic slow path),
  and a row-major ``(BK, 64)`` uint8 manual DMA does not compile at all
  (sub-128 minor dim) while the transposed ``(64, BK)`` slice does;
- **quant params folded out of the matmuls** (x_r = n_r*s_r + z_r):
  scores  = (q @ n) * s_col + sum(q) * z_col, output = (p * s_v) @ n_v^T +
  (p . z_v) — both matmuls run directly against the raw nibble values, no
  dequantized tiles are ever built. The PV contraction runs in f32 (f32 NT
  escapes the bf16 NT slow path).
- **lo-only unpack**: the matmuls run against the raw PACKED bytes plus the
  low nibbles only (b = 16*hi + lo  =>  q.x = (q_hi/16).b + (q_lo-q_hi/16).lo)
  so the shift/concat half of the unpack chain disappears; the softmax scale
  is folded into the streamed K scale/zero columns host-side.

HBM traffic for the int4 prefill is ~4x below the bf16 path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _fused_trip(q2, qsum, kq_buf, ksz_buf, vq_buf, vsz_buf, slot,
                m_scr, l_scr, acc_scr, s_mask_fn, dtype):
    """One online-softmax trip with the v3 FUSED matmul structure.

    v2 paid the MXU twice at half depth and the VPU ~13 passes per
    (rows, BK) tile. v3:

    - scores: ONE depth-D matmul ``q2 @ [b; b&15]`` (both halves of the
      lo-only identity stacked — exact: nibbles/bytes are integers < 256,
      exact in bf16) instead of two depth-D/2 matmuls. A 64-deep bf16
      contraction uses half the 128x128 MXU; stacking restores full depth.
    - PV: ONE f32 NT matmul ``p @ [b*vs; lo*vs; vz; 1]^T`` — the value
      scale folds into the (D, BK) tile (64x cheaper than scaling the
      (rows, BK) probabilities), and the zero-point (pz) and softmax-l
      row sums ride along as two extra output columns, so the VPU never
      reduces the big tile again.
    - masking only where a block can actually cross the causal/live
      boundary (``s_mask_fn``); interior blocks skip the compare+select.
    """
    rows = q2.shape[0]
    D = q2.shape[1]

    kpi = kq_buf[slot].astype(jnp.int32)                 # (D//2, BK) packed
    k2 = jnp.concatenate([kpi, kpi & 0xF], axis=0).astype(q2.dtype)
    qn = jax.lax.dot_general(
        q2, k2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (rows, BK)
    # ks/kz arrive pre-multiplied by the softmax scale (host side)
    s = qn * ksz_buf[slot, 0:1] + qsum * ksz_buf[slot, 1:2]
    if s_mask_fn is not None:
        s = s_mask_fn(s)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    # exp(-inf) == 0 covers masked columns; every causal row sees at
    # least its own key so m_new is finite (no NaN from -inf - -inf)
    p = jnp.exp(s - m_new)

    vpi = vq_buf[slot].astype(jnp.int32)                 # (D//2, BK) packed
    vs = vsz_buf[slot, 0:1]
    v2 = jnp.concatenate([
        vpi.astype(jnp.float32) * vs,
        (vpi & 0xF).astype(jnp.float32) * vs,
        vsz_buf[slot, 1:2],
        jnp.ones((1, p.shape[1]), jnp.float32)], axis=0)  # (D+2, BK)
    mo = jax.lax.dot_general(
        p, v2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (rows, D+2)
    m1 = mo[:, :D // 2]
    m2 = mo[:, D // 2:D]
    pz = mo[:, D:D + 1]
    ls = mo[:, D + 1:D + 2]
    upd = jnp.concatenate([(m1 - m2) * (1.0 / 16.0), m2], axis=1)
    l_scr[...] = l_scr[...] * alpha + ls
    acc_scr[...] = acc_scr[...] * alpha + pz + upd
    m_scr[...] = m_new


def _kernel(lens_ref, pos_ref, q_ref, kq_hbm, ksz_hbm, vq_hbm, vsz_hbm,
            o_ref, kq_buf, ksz_buf, vq_buf, vsz_buf, sem,
            m_scr, l_scr, acc_scr,
            *, block_q: int, block_k: int, dtype):
    h = pl.program_id(0)
    qb = pl.program_id(1)
    G = q_ref.shape[1]
    BQ = block_q
    BK = block_k
    D = q_ref.shape[3]
    C = kq_hbm.shape[2]
    rows = G * BQ

    base = lens_ref[h]
    kv_end = jnp.minimum(base + (qb + 1) * BQ, C)
    nb = pl.cdiv(kv_end, BK)
    # blocks fully visible to EVERY row of this q block skip the causal
    # mask (compare+select over the (rows, BK) f32 tile x2 saved per trip)
    nb_full = jnp.minimum(base + qb * BQ + 1, C) // BK

    q = q_ref[0].reshape(rows, D)
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)  # (rows, 1)
    # lo-only unpack, stacked: byte row j = 16*x_j + x_{j+D/2}, so
    #   q . x = [q_hi/16, q_lo - q_hi/16] . [b; b & 15]
    # — the high nibble never materializes and the contraction runs at
    # full MXU depth D (v2 ran two D/2-deep matmuls at ~half utilization)
    q_hi = q[:, :D // 2] * q.dtype.type(1.0 / 16.0)
    q_lo = q[:, D // 2:] - q_hi
    q2 = jnp.concatenate([q_hi, q_lo], axis=1)           # (rows, D)

    m_scr[...] = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l_scr[...] = jnp.zeros((rows, 1), jnp.float32)
    acc_scr[...] = jnp.zeros((rows, D), jnp.float32)

    def dma(b, slot):
        return [pltpu.make_async_copy(
            src.at[h, :, pl.ds(b * BK, BK)], buf.at[slot], sem.at[slot, i])
            for i, (src, buf) in enumerate(
                ((kq_hbm, kq_buf), (ksz_hbm, ksz_buf),
                 (vq_hbm, vq_buf), (vsz_hbm, vsz_buf)))]

    for d in dma(0, 0):
        d.start()

    row_q = jax.lax.broadcasted_iota(jnp.int32, (rows, BK), 0) % BQ
    col_local = jax.lax.broadcasted_iota(jnp.int32, (rows, BK), 1)

    def body(b, masked):
        slot = b % 2
        nxt = (b + 1) % 2

        @pl.when(b + 1 < nb)
        def _():
            for d in dma(b + 1, nxt):
                d.start()

        for d in dma(b, slot):
            d.wait()

        def mask_fn(s):
            mask = col_local + b * BK < (base + qb * BQ + row_q + 1)
            return jnp.where(mask, s, NEG_INF)

        _fused_trip(q2, qsum, kq_buf, ksz_buf, vq_buf, vsz_buf, slot,
                    m_scr, l_scr, acc_scr, mask_fn if masked else None,
                    dtype)
        return 0

    jax.lax.fori_loop(0, nb_full, lambda b, _: body(b, False), 0)
    jax.lax.fori_loop(nb_full, nb, lambda b, _: body(b, True), 0)

    out = acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
    o_ref[0] = out.reshape(G, BQ, D).astype(dtype)


def _kernel_extra(lens_ref, q_ref, kq_hbm, ksz_hbm, vq_hbm, vsz_hbm,
                  kx_ref, kxsz_ref, vx_ref, vxsz_ref,
                  o_ref, kq_buf, ksz_buf, vq_buf, vsz_buf, sem,
                  m_scr, l_scr, acc_scr,
                  *, block_q: int, block_k: int, block_x: int, dtype):
    """READ-ONLY scoring variant: the cache rows [0, len) stream from HBM as
    in :func:`_kernel`, and the current chunk's own (quantized) K/V arrive
    as VMEM inputs — nothing is appended to the cache, so the scoring
    forward never writes (or copies) the multi-GB cache arrays. Same math
    as attending an appended cache: cache rows are fully visible, the
    chunk's rows causally."""
    h = pl.program_id(0)
    qb = pl.program_id(1)
    G = q_ref.shape[1]
    BQ = block_q
    BK = block_k
    D = q_ref.shape[3]
    rows = G * BQ
    Tx = kx_ref.shape[2]

    base = lens_ref[h]
    nb = pl.cdiv(base, BK)           # cache trips only (nothing appended)
    nb_full = base // BK             # only the last partial block masks

    q = q_ref[0].reshape(rows, D)
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    q_hi = q[:, :D // 2] * q.dtype.type(1.0 / 16.0)
    q_lo = q[:, D // 2:] - q_hi
    q2 = jnp.concatenate([q_hi, q_lo], axis=1)           # (rows, D)

    m_scr[...] = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l_scr[...] = jnp.zeros((rows, 1), jnp.float32)
    acc_scr[...] = jnp.zeros((rows, D), jnp.float32)

    def dma(b, slot):
        return [pltpu.make_async_copy(
            src.at[h, :, pl.ds(b * BK, BK)], buf.at[slot], sem.at[slot, i])
            for i, (src, buf) in enumerate(
                ((kq_hbm, kq_buf), (ksz_hbm, ksz_buf),
                 (vq_hbm, vq_buf), (vsz_hbm, vsz_buf)))]

    @pl.when(nb > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    col_local = jax.lax.broadcasted_iota(jnp.int32, (rows, BK), 1)

    def online(s, v_packed, v_sz):
        """One fused online-softmax update from a score tile + packed V
        (see :func:`_fused_trip` for the matmul structure)."""
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
        p = jnp.exp(s - m_new)
        vpi = v_packed.astype(jnp.int32)
        vs = v_sz[0:1]
        v2 = jnp.concatenate([
            vpi.astype(jnp.float32) * vs,
            (vpi & 0xF).astype(jnp.float32) * vs,
            v_sz[1:2],
            jnp.ones((1, p.shape[1]), jnp.float32)], axis=0)
        mo = jax.lax.dot_general(p, v2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        m1 = mo[:, :D // 2]
        m2 = mo[:, D // 2:D]
        upd = jnp.concatenate([(m1 - m2) * (1.0 / 16.0), m2], axis=1)
        l_scr[...] = l_scr[...] * alpha + mo[:, D + 1:D + 2]
        acc_scr[...] = acc_scr[...] * alpha + mo[:, D:D + 1] + upd
        m_scr[...] = m_new

    def body(b, masked):
        slot = b % 2
        nxt = (b + 1) % 2

        @pl.when(b + 1 < nb)
        def _():
            for d in dma(b + 1, nxt):
                d.start()

        for d in dma(b, slot):
            d.wait()

        kpi = kq_buf[slot].astype(jnp.int32)
        k2 = jnp.concatenate([kpi, kpi & 0xF], axis=0).astype(q.dtype)
        qn = jax.lax.dot_general(q2, k2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s = qn * ksz_buf[slot, 0:1] + qsum * ksz_buf[slot, 1:2]
        if masked:
            # cache rows all precede the chunk: visible iff live — every
            # q row has live columns here (base > b*BK), so m_new is finite
            s = jnp.where(col_local + b * BK < base, s, NEG_INF)
        online(s, vq_buf[slot], vsz_buf[slot])
        return 0

    jax.lax.fori_loop(0, nb_full, lambda b, _: body(b, False), 0)
    jax.lax.fori_loop(nb_full, nb, lambda b, _: body(b, True), 0)

    # ---- the chunk's own rows (VMEM inputs), causal within the chunk
    row_q = jax.lax.broadcasted_iota(jnp.int32, (rows, block_x), 0) % BQ
    col_x = jax.lax.broadcasted_iota(jnp.int32, (rows, block_x), 1)
    for xb in range(Tx // block_x):
        kpi = kx_ref[0, :, xb * block_x:(xb + 1) * block_x].astype(jnp.int32)
        k2 = jnp.concatenate([kpi, kpi & 0xF], axis=0).astype(q.dtype)
        qn = jax.lax.dot_general(q2, k2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ksz = kxsz_ref[0, :, xb * block_x:(xb + 1) * block_x]
        s = qn * ksz[0:1] + qsum * ksz[1:2]
        mask = col_x + xb * block_x < qb * BQ + row_q + 1
        s = jnp.where(mask, s, NEG_INF)
        online(s, vx_ref[0, :, xb * block_x:(xb + 1) * block_x],
               vxsz_ref[0, :, xb * block_x:(xb + 1) * block_x])

    out = acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
    o_ref[0] = out.reshape(G, BQ, D).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attend_int4(
    q: jax.Array,            # (T, H, D)
    k_q: jax.Array,          # (Hkv, D//2, C) uint8 split-packed TRANSPOSED
    k_s: jax.Array,          # (Hkv, C) scales (any float dtype)
    k_z: jax.Array,
    v_q: jax.Array,          # (Hkv, D//2, C) uint8 TRANSPOSED
    v_s: jax.Array,
    v_z: jax.Array,
    base_lens: jax.Array,    # (Hkv,) int32
    q_pos0: jax.Array,       # () int32
    *,
    scale: float,
    block_q: int = 256,
    block_k: int = 512,   # (G*BQ, BK) f32 score tile + iotas ~ VMEM budget
    interpret: bool = False,
) -> jax.Array:
    T, H, D = q.shape
    Hkv, _, C = v_q.shape
    G = H // Hkv

    BQ = min(block_q, T)
    while T % BQ:
        BQ //= 2
    BK = block_k
    while C % BK:
        BK //= 2

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)
    # softmax scale folded into the K scale/zero columns: one pass over the
    # (Hkv, 2, C) stack here instead of a per-element multiply in the kernel
    k_sz = jnp.stack([k_s, k_z], axis=1).astype(jnp.float32) * scale
    v_sz = jnp.stack([v_s, v_z], axis=1).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Hkv, T // BQ),
        in_specs=[
            pl.BlockSpec((1, G, BQ, D), lambda h, qb, l, p: (h, 0, qb, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, G, BQ, D),
                               lambda h, qb, l, p: (h, 0, qb, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, D // 2, BK), jnp.uint8),
            pltpu.VMEM((2, 2, BK), jnp.float32),
            pltpu.VMEM((2, D // 2, BK), jnp.uint8),
            pltpu.VMEM((2, 2, BK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, block_q=BQ, block_k=BK, dtype=q.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(base_lens.astype(jnp.int32), q_pos0.astype(jnp.int32)[None], qg,
      k_q, k_sz, v_q, v_sz)

    return out.transpose(2, 0, 1, 3).reshape(T, H, D)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "block_x", "interpret"))
def flash_attend_int4_extra(
    q: jax.Array,            # (T, H, D)
    k_q: jax.Array,          # (Hkv, D//2, C) uint8 split-packed TRANSPOSED
    k_s: jax.Array,          # (Hkv, C)
    k_z: jax.Array,
    v_q: jax.Array,
    v_s: jax.Array,
    v_z: jax.Array,
    base_lens: jax.Array,    # (Hkv,) int32 — live cache rows (nothing appended)
    kx_q: jax.Array,         # (T, Hkv, D//2) uint8 — the chunk's own K, packed
    kx_s: jax.Array,         # (T, Hkv, 1)
    kx_z: jax.Array,
    vx_q: jax.Array,
    vx_s: jax.Array,
    vx_z: jax.Array,
    *,
    scale: float,
    # 576 q rows (G*BQ = 4032 packed rows at 7B): chip-swept optimum —
    # +4% over 256 (fewer KV re-streams); >= 768 fails to compile (VMEM).
    # Scoring attention is COMPUTE-bound at ~67-69 TFLOP/s on this shape
    # (block_k 512 vs 2048 measured identical), bench_results/
    # probe_scoring_bq.log
    block_q: int = 576,
    block_k: int = 512,
    block_x: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """READ-ONLY scoring attention: cache rows [0, base) + the chunk's own
    quantized K/V as VMEM inputs (causal within the chunk). Identical math
    to appending the chunk then calling :func:`flash_attend_int4`, without
    ever writing the cache — the scoring forward's cache append defeated
    XLA donation and copied the full multi-GB cache every chunk."""
    T, H, D = q.shape
    Hkv, _, C = v_q.shape
    G = H // Hkv

    BQ = min(block_q, T)
    while T % BQ:
        BQ //= 2
    BK = block_k
    while C % BK:
        BK //= 2
    BX = min(block_x, T)
    while T % BX:
        BX //= 2

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)
    k_sz = jnp.stack([k_s, k_z], axis=1).astype(jnp.float32) * scale
    v_sz = jnp.stack([v_s, v_z], axis=1).astype(jnp.float32)
    # extras to the cache layouts: (Hkv, D//2, T) nibbles, (Hkv, 2, T) sz
    kx = kx_q.transpose(1, 2, 0)
    vx = vx_q.transpose(1, 2, 0)
    # (T, 2, Hkv) -> (Hkv, 2, T): heads lead (the kernel indexes blocks by
    # head); axes (2, 1, 0), NOT (1, 2, 0) — with Hkv == 2 the wrong perm
    # produces the same SHAPE and silently swaps scale/zero across heads
    kx_sz = jnp.stack([kx_s[..., 0], kx_z[..., 0]],
                      axis=1).astype(jnp.float32).transpose(2, 1, 0) * scale
    vx_sz = jnp.stack([vx_s[..., 0], vx_z[..., 0]],
                      axis=1).astype(jnp.float32).transpose(2, 1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, T // BQ),
        in_specs=[
            pl.BlockSpec((1, G, BQ, D), lambda h, qb, l: (h, 0, qb, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, D // 2, T), lambda h, qb, l: (h, 0, 0)),
            pl.BlockSpec((1, 2, T), lambda h, qb, l: (h, 0, 0)),
            pl.BlockSpec((1, D // 2, T), lambda h, qb, l: (h, 0, 0)),
            pl.BlockSpec((1, 2, T), lambda h, qb, l: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, G, BQ, D), lambda h, qb, l: (h, 0, qb, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, D // 2, BK), jnp.uint8),
            pltpu.VMEM((2, 2, BK), jnp.float32),
            pltpu.VMEM((2, D // 2, BK), jnp.uint8),
            pltpu.VMEM((2, 2, BK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_extra, block_q=BQ, block_k=BK, block_x=BX, dtype=q.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(base_lens.astype(jnp.int32), qg, k_q, k_sz, v_q, v_sz,
      kx, kx_sz, vx, vx_sz)

    return out.transpose(2, 0, 1, 3).reshape(T, H, D)
