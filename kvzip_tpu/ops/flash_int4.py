"""Pallas flash attention over the INT4 KV cache (prefill/scoring path).

Same masking semantics as ``ops.flash`` but the K/V blocks arrive packed
(split nibble layout, one quant group per row — ``ops.quant``) and are
dequantized in-register. Pipelined grid (kv_head, q_block, kv_major) with
index-clamped kv maps: blocks beyond the live length are mapped to the last
live block so Pallas skips their DMA entirely. HBM traffic for the int4
prefill is therefore ~4x below the bf16 path.

Scale/zero pairs ride as a (Hkv, C, 2) tensor — Mosaic block shapes require
the last dim to be lane-aligned or full, so the two scalars share the minor
dim instead of living in separate (Hkv, C) arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _kernel(lens_ref, pos_ref, q_ref, kq_ref, ksz_ref, vq_ref, vsz_ref,
            o_ref, m_scr, l_scr, acc_scr,
            *, block_q: int, block_km: int, block_k: int, scale: float,
            dtype):
    h = pl.program_id(0)
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    G = q_ref.shape[1]
    BQ = block_q
    D = q_ref.shape[3]
    rows = G * BQ

    base = lens_ref[h]
    kv_end = base + (qb + 1) * BQ
    nbm = pl.cdiv(kv_end, block_km)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((rows, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((rows, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((rows, D), jnp.float32)

    @pl.when(kb < nbm)
    def compute():
        q = q_ref[0].reshape(rows, D)
        row_q = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0) % BQ
        col_l = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)

        def dequant(p, sz):
            pi = p.astype(jnp.int32)
            hi = (pi >> 4).astype(jnp.float32)
            lo = (pi & 0xF).astype(jnp.float32)
            x = jnp.concatenate([hi, lo], axis=-1)  # (block_k, D)
            s = sz[:, 0:1].astype(jnp.float32)
            z = sz[:, 1:2].astype(jnp.float32)
            return (x * s + z).astype(dtype)

        @pl.loop(0, block_km, step=block_k, unroll=True)
        def _body(start):
            k_blk = dequant(kq_ref[0, pl.ds(start, block_k), :],
                            ksz_ref[0, pl.ds(start, block_k), :])
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            col = col_l + kb * block_km + start
            mask = col < (base + qb * BQ + row_q + 1)
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_scr[...]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.where(jnp.isfinite(m_prev),
                              jnp.exp(m_prev - m_new), 0.0)
            p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
            l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
            v_blk = dequant(vq_ref[0, pl.ds(start, block_k), :],
                            vsz_ref[0, pl.ds(start, block_k), :])
            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[...] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
                    ).reshape(G, BQ, D).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_km", "block_k", "interpret"))
def flash_attend_int4(
    q: jax.Array,            # (T, H, D)
    k_q: jax.Array,          # (Hkv, C, D//2) uint8 split-packed
    k_s: jax.Array,          # (Hkv, C) scales (any float dtype)
    k_z: jax.Array,
    v_q: jax.Array,
    v_s: jax.Array,
    v_z: jax.Array,
    base_lens: jax.Array,    # (Hkv,) int32
    q_pos0: jax.Array,       # () int32
    *,
    scale: float,
    block_q: int = 256,
    block_km: int = 512,   # 1024 overflows VMEM (unrolled dequant temps)
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    T, H, D = q.shape
    Hkv, C, _ = k_q.shape
    G = H // Hkv

    BQ = min(block_q, T)
    while T % BQ:
        BQ //= 2
    BKM = block_km
    while C % BKM:
        BKM //= 2
    BK = min(block_k, BKM)
    nkvm = C // BKM

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)
    k_sz = jnp.stack([k_s, k_z], axis=-1).astype(jnp.float32)  # (Hkv, C, 2)
    v_sz = jnp.stack([v_s, v_z], axis=-1).astype(jnp.float32)

    def kv_index(h, qb, kb, lens, pos):
        last = jax.lax.div(lens[h] + (qb + 1) * BQ - 1, BKM)
        return (h, jnp.minimum(kb, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Hkv, T // BQ, nkvm),
        in_specs=[
            pl.BlockSpec((1, G, BQ, D), lambda h, qb, kb, l, p: (h, 0, qb, 0)),
            pl.BlockSpec((1, BKM, D // 2), kv_index),
            pl.BlockSpec((1, BKM, 2), kv_index),
            pl.BlockSpec((1, BKM, D // 2), kv_index),
            pl.BlockSpec((1, BKM, 2), kv_index),
        ],
        out_specs=pl.BlockSpec((1, G, BQ, D),
                               lambda h, qb, kb, l, p: (h, 0, qb, 0)),
        scratch_shapes=[
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel, block_q=BQ, block_km=BKM, block_k=BK, scale=scale,
        dtype=q.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(base_lens.astype(jnp.int32), q_pos0.astype(jnp.int32)[None], qg,
      k_q, k_sz, v_q, v_sz)

    return out.transpose(2, 0, 1, 3).reshape(T, H, D)
