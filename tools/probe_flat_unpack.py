"""Ablate the flat-int4 decode kernel's nibble-unpack cost.

probe_flat_blk.py showed the kernel pinned at ~175 GB/s independent of block
size -> VPU-bound, and the suspect is the unpack chain (u8->i32 cast, shift,
and, 2x i32->bf16 casts, concat copy ~= 7 VPU ops per packed byte at ~1e12
ops/s ~= 175 GB/s). Variants:

  A  current: full unpack, concat, one matmul per side
  B  lo-only algebra: q.x = (q_hi/16).B + (q_lo - q_hi/16).LO  (~4 ops/byte)
  D  floor: matmul the raw packed bytes only (wrong math; 2 casts/byte)
  C  int8 MXU rate test: s8 x s8 -> s32 dot_general on raw bytes (wrong
     math; tests whether Mosaic runs int8 matmuls at all and how fast)
  E  u8-native shifts: unpack with uint8-lane ops before widening

    PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python tools/probe_flat_unpack.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
L = 28
HT, D = 28, 128          # q rows (heads x 1 query token)
R = 786432               # ~3b/320k evicted row count
BLK = 16384


def log(m):
    print(m, file=sys.stderr, flush=True)


def _softmax_update(s, m_scr, l_scr):
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_new
    return p, alpha


def kernel_A(qref, rh, kq, ks, kz, vq, vs, vz, o_ref, m_scr, l_scr, acc_scr,
             *, scale):
    kb = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = qref[...]
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    kpi = kq[...].astype(jnp.int32)
    kn = jnp.concatenate([kpi >> 4, kpi & 0xF], axis=0).astype(q.dtype)
    qn = jax.lax.dot_general(q, kn, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (qn * ks[...] + qsum * kz[...]) * scale
    s = jnp.where(rh[...] == 0, s, NEG_INF)
    p, alpha = _softmax_update(s, m_scr, l_scr)

    vpi = vq[...].astype(jnp.int32)
    vn = jnp.concatenate([vpi >> 4, vpi & 0xF], axis=1).astype(q.dtype)
    ps = (p * vs[...]).astype(q.dtype)
    pz = jnp.sum(p * vz[...], axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + pz + jax.lax.dot_general(
        ps, vn, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kb == nb - 1)
    def _():
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
                      ).astype(qref.dtype)


def kernel_B(qref, rh, kq, ks, kz, vq, vs, vz, o_ref, m_scr, l_scr, acc_scr,
             *, scale):
    kb = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = qref[...]
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    # scores: q_hi @ HI + q_lo @ LO with HI = (B - LO)/16
    #       = (q_hi/16) @ B + (q_lo - q_hi/16) @ LO
    q_hi = q[:, :D // 2]
    q_lo = q[:, D // 2:]
    kpi = kq[...].astype(jnp.int32)          # (D//2, BLK) packed bytes
    kB = kpi.astype(q.dtype)
    kLO = (kpi & 0xF).astype(q.dtype)
    qn = (jax.lax.dot_general(q_hi * (1.0 / 16.0), kB,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(q_lo - q_hi * (1.0 / 16.0), kLO,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
    s = (qn * ks[...] + qsum * kz[...]) * scale
    s = jnp.where(rh[...] == 0, s, NEG_INF)
    p, alpha = _softmax_update(s, m_scr, l_scr)

    # output: out_hi = (ps@B - ps@LO)/16, out_lo = ps@LO
    vpi = vq[...].astype(jnp.int32)          # (BLK, D//2) packed bytes
    vB = vpi.astype(q.dtype)
    vLO = (vpi & 0xF).astype(q.dtype)
    ps = (p * vs[...]).astype(q.dtype)
    pz = jnp.sum(p * vz[...], axis=1, keepdims=True)
    m1 = jax.lax.dot_general(ps, vB, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    m2 = jax.lax.dot_general(ps, vLO, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    upd = jnp.concatenate([(m1 - m2) * (1.0 / 16.0), m2], axis=1)
    acc_scr[...] = acc_scr[...] * alpha + pz + upd

    @pl.when(kb == nb - 1)
    def _():
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
                      ).astype(qref.dtype)


def kernel_D(qref, rh, kq, ks, kz, vq, vs, vz, o_ref, m_scr, l_scr, acc_scr,
             *, scale):
    """Perf floor: matmul raw packed bytes only (wrong math)."""
    kb = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = qref[...]
    kB = kq[...].astype(jnp.int32).astype(q.dtype)
    qn = jax.lax.dot_general(q[:, :D // 2], kB, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = qn * ks[...] * scale
    s = jnp.where(rh[...] == 0, s, NEG_INF)
    p, alpha = _softmax_update(s, m_scr, l_scr)
    vB = vq[...].astype(jnp.int32).astype(q.dtype)
    ps = (p * vs[...]).astype(q.dtype)
    m1 = jax.lax.dot_general(ps, vB, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha + jnp.pad(m1, ((0, 0), (0, D // 2)))

    @pl.when(kb == nb - 1)
    def _():
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
                      ).astype(qref.dtype)


def kernel_C(qref, rh, kq, ks, kz, vq, vs, vz, o_ref, m_scr, l_scr, acc_scr,
             *, scale):
    """int8 MXU rate test: s8 x s8 -> s32 dots on raw bytes (wrong math)."""
    kb = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q8 = (qref[...] * 16.0).astype(jnp.int8)       # stand-in quantized q
    k8 = kq[...].astype(jnp.int8)                   # wrap cast
    qn = jax.lax.dot_general(q8[:, :D // 2], k8, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    s = qn.astype(jnp.float32) * ks[...] * scale
    s = jnp.where(rh[...] == 0, s, NEG_INF)
    p, alpha = _softmax_update(s, m_scr, l_scr)
    p8 = (p * 127.0).astype(jnp.int8)
    v8 = vq[...].astype(jnp.int8)
    m1 = jax.lax.dot_general(p8, v8, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    acc_scr[...] = (acc_scr[...] * alpha
                    + jnp.pad(m1.astype(jnp.float32), ((0, 0), (0, D // 2))))

    @pl.when(kb == nb - 1)
    def _():
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
                      ).astype(qref.dtype)


def kernel_E(qref, rh, kq, ks, kz, vq, vs, vz, o_ref, m_scr, l_scr, acc_scr,
             *, scale):
    """u8-lane unpack: shift/and on uint8 tiles, widen once."""
    kb = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = qref[...]
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    kb8 = kq[...]
    kn = jnp.concatenate([kb8 >> 4, kb8 & 0xF], axis=0)   # u8 ops
    knf = kn.astype(jnp.int32).astype(q.dtype)
    qn = jax.lax.dot_general(q, knf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (qn * ks[...] + qsum * kz[...]) * scale
    s = jnp.where(rh[...] == 0, s, NEG_INF)
    p, alpha = _softmax_update(s, m_scr, l_scr)
    vb8 = vq[...]
    vn = jnp.concatenate([vb8 >> 4, vb8 & 0xF], axis=1)
    vnf = vn.astype(jnp.int32).astype(q.dtype)
    ps = (p * vs[...]).astype(q.dtype)
    pz = jnp.sum(p * vz[...], axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + pz + jax.lax.dot_general(
        ps, vnf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kb == nb - 1)
    def _():
        o_ref[...] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
                      ).astype(qref.dtype)


def build_call(kernel):
    def blk1(kb):
        return (0, kb)

    return pl.pallas_call(
        functools.partial(kernel, scale=D ** -0.5),
        grid=(R // BLK,),
        in_specs=[
            pl.BlockSpec((HT, D), lambda kb: (0, 0)),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((D // 2, BLK), blk1),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((BLK, D // 2), lambda kb: (kb, 0)),
            pl.BlockSpec((1, BLK), blk1),
            pl.BlockSpec((1, BLK), blk1),
        ],
        out_specs=pl.BlockSpec((HT, D), lambda kb: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((HT, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((HT, 1), jnp.float32),
            pltpu.VMEM((HT, 1), jnp.float32),
            pltpu.VMEM((HT, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def main():
    key = jax.random.PRNGKey(0)
    data = dict(
        q=jax.random.normal(key, (HT, D), jnp.bfloat16),
        rh=jnp.zeros((1, R), jnp.int32),
        kq=jax.random.randint(key, (D // 2, R), 0, 255, jnp.uint8),
        ks=jnp.full((1, R), 0.01, jnp.float32),
        kz=jnp.full((1, R), -0.05, jnp.float32),
        vq=jax.random.randint(key, (R, D // 2), 0, 255, jnp.uint8),
        vs=jnp.full((1, R), 0.01, jnp.float32),
        vz=jnp.full((1, R), -0.05, jnp.float32),
    )
    order = ["q", "rh", "kq", "ks", "kz", "vq", "vs", "vz"]
    args = [data[k] for k in order]
    gb = (R * (D + 16 + 4)) / 1e9  # K+V nibbles + 4x f32 scales + rh i32

    for name, kern in [("A current", kernel_A), ("B lo-only", kernel_B),
                       ("D floor", kernel_D), ("C int8", kernel_C),
                       ("E u8-lane", kernel_E)]:
        try:
            call = build_call(kern)

            @functools.partial(jax.jit, static_argnames=("n",))
            def reps(n, *a):
                q = a[0]
                for _ in range(n):
                    q = call(q, *a[1:]) + q * 0  # chain dependency
                return q

            def t(n):
                jax.device_get(reps(n, *args))
                t0 = time.time()
                jax.device_get(reps(n, *args))
                return time.time() - t0

            t1, t2 = t(4), t(16)
            slope = (t2 - t1) / 12
            log(f"{name:12s} slope {slope * 1e3:8.3f} ms "
                f"({gb / slope:5.0f} GB/s)  [t4={t1 * 1e3:.0f} "
                f"t16={t2 * 1e3:.0f}]")
        except Exception as e:
            log(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
