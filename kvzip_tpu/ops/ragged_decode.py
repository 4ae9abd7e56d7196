"""Pallas ragged decode attention: per-head KV lengths, small query counts.

The decode-path replacement for the reference's ``flash_attn_varlen_func``
over per-head varlen sequences (`attention/attn.py:61-71` +
`attention/kvcache.py:187-213`): after KVzip eviction every (layer, head)
holds a different number of live rows. Decode is bandwidth-bound, so the
kernel must read exactly ``sum_h len[h]`` rows — not the padded capacity:

- grid (kv_head, kv_major_block) with Pallas-pipelined K/V blocks;
- the block index_map clamps beyond-length blocks to the head's last live
  block — consecutive identical indices make Pallas skip the DMA entirely,
  so HBM traffic equals the live KV footprint;
- the GQA group (and up to a few queries) pack into the MXU row dimension;
- masking only touches the boundary block (`lax.cond`), interior blocks take
  the unmasked exp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _decode_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                   *, block_kv: int, scale: float, n_q: int, dtype):
    h = pl.program_id(0)
    kb = pl.program_id(1)
    G = q_ref.shape[1]
    D = q_ref.shape[3]
    rows = G * n_q

    base = lens_ref[h]
    kv_end = base + n_q                      # appended queries are attendable
    nbm = pl.cdiv(kv_end, block_kv)

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((rows, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((rows, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((rows, D), jnp.float32)

    @pl.when(kb < nbm)
    def compute():
        q = q_ref[0].reshape(rows, D)
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (rows, BKV)

        def masked(s):
            col = kb * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (rows, block_kv), 1)
            q_idx = jax.lax.broadcasted_iota(
                jnp.int32, (rows, block_kv), 0) % n_q
            return jnp.where(col < base + q_idx + 1, s, NEG_INF)

        is_boundary = (kb + 1) * block_kv > base
        s = jax.lax.cond(is_boundary, masked, lambda s: s, s)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[...] = m_new

    @pl.when(kb == pl.num_programs(1) - 1)
    def _():
        out = acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
        o_ref[0] = out.reshape(G, n_q, D).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_kv", "interpret"))
def ragged_decode_attend(
    q: jax.Array,            # (T, H, D), T small (decode steps)
    k_cache: jax.Array,      # (Hkv, C, D)
    v_cache: jax.Array,      # (Hkv, C, D)
    base_lens: jax.Array,    # (Hkv,) int32 — live rows before this block
    *,
    scale: float,
    block_kv: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    T, H, D = q.shape
    Hkv, C, _ = k_cache.shape
    G = H // Hkv
    BKV = block_kv
    while C % BKV:
        BKV //= 2
    nkvm = C // BKV

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)  # (Hkv, G, T, D)

    def kv_index(h, kb, lens):
        last = jax.lax.div(lens[h] + T - 1, BKV)
        return (h, jnp.minimum(kb, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, nkvm),
        in_specs=[
            pl.BlockSpec((1, G, T, D), lambda h, kb, lens: (h, 0, 0, 0)),
            pl.BlockSpec((1, BKV, D), kv_index),
            pl.BlockSpec((1, BKV, D), kv_index),
        ],
        out_specs=pl.BlockSpec((1, G, T, D), lambda h, kb, lens: (h, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((G * T, 1), jnp.float32),
            pltpu.VMEM((G * T, 1), jnp.float32),
            pltpu.VMEM((G * T, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, block_kv=BKV, scale=scale, n_q=T, dtype=q.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(base_lens.astype(jnp.int32), qg, k_cache, v_cache)

    return out.transpose(2, 0, 1, 3).reshape(T, H, D)
