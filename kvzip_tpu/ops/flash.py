"""Pallas TPU flash attention over the fixed-capacity KV cache (prefill path).

Replaces the reference's external flash-attn dependency
(`attention/attn.py:80-89`) with a TPU-native kernel:

- grid (kv_head, q_block); the GQA group is packed into the row dimension so
  the MXU sees (G*BQ, D) x (D, BK) matmuls;
- K/V stay in HBM (memory_space=ANY) and are streamed through VMEM with
  double-buffered async DMA; the per-head kv trip count is dynamic —
  blocks beyond ``base_len + q_end`` are never fetched, so attention cost
  tracks the *live* cache length, not the capacity padding;
- online softmax (running max/denominator) in fp32.

Causal rule matches ops.attention: key row j attendable by query i iff
``j < base_len + qb*BQ + i + 1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _flash_kernel(lens_ref, pos_ref, q_ref, k_hbm, v_hbm, o_ref,
                  k_buf, v_buf, sem, m_scr, l_scr, acc_scr,
                  *, block_q: int, block_k: int, scale: float,
                  window: int, dtype):
    h = pl.program_id(0)
    qb = pl.program_id(1)

    G = q_ref.shape[1]
    BQ = block_q
    D = q_ref.shape[3]
    C = k_hbm.shape[1]
    rows = G * BQ

    base = lens_ref[h]
    q_pos0 = pos_ref[0]

    # dynamic kv extent for this q block: everything attendable by its last query
    kv_end = jnp.minimum(base + (qb + 1) * BQ, C)
    nb = pl.cdiv(kv_end, block_k)

    q = q_ref[0].reshape(rows, D)  # keep bf16: full-rate MXU, f32 accum

    m_scr[...] = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l_scr[...] = jnp.zeros((rows, 1), jnp.float32)
    acc_scr[...] = jnp.zeros((rows, D), jnp.float32)

    def dma_k(b, slot):
        return pltpu.make_async_copy(
            k_hbm.at[h, pl.ds(b * block_k, block_k), :], k_buf.at[slot],
            sem.at[slot, 0])

    def dma_v(b, slot):
        return pltpu.make_async_copy(
            v_hbm.at[h, pl.ds(b * block_k, block_k), :], v_buf.at[slot],
            sem.at[slot, 1])

    dma_k(0, 0).start()
    dma_v(0, 0).start()

    row_q = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0) % BQ
    col_local = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)

    def body(b, _):
        slot = b % 2
        nxt = (b + 1) % 2

        @pl.when(b + 1 < nb)
        def _():
            dma_k(b + 1, nxt).start()
            dma_v(b + 1, nxt).start()

        dma_k(b, slot).wait()
        dma_v(b, slot).wait()

        # bf16 NN matmul (bf16 NT hits a Mosaic slow path; transpose k once)
        s = jax.lax.dot_general(
            q, k_buf[slot].T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (rows, BK) f32

        col = col_local + b * block_k
        q_idx = qb * BQ + row_q
        mask = col < (base + q_idx + 1)
        if window > 0:
            mask &= col > (q_pos0 + q_idx - window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)

        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v_buf.dtype), v_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[...] = m_new
        return 0

    jax.lax.fori_loop(0, nb, body, 0)

    out = acc_scr[...] / jnp.maximum(l_scr[...], 1e-37)
    o_ref[0] = out.reshape(G, BQ, D).astype(dtype)


def supported(head_dim: int, capacity: int) -> bool:
    """Mosaic constraint: minor dim must be 128-aligned for HBM DMA slices."""
    return head_dim % 128 == 0 and capacity % 128 == 0


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "block_q", "block_k", "interpret"))
def flash_attend(
    q: jax.Array,            # (T, H, D)
    k_cache: jax.Array,      # (Hkv, C, D)
    v_cache: jax.Array,      # (Hkv, C, D)
    base_lens: jax.Array,    # (Hkv,) int32
    q_pos0: jax.Array,       # () int32
    *,
    scale: float,
    window: int = 0,         # 0 = no sliding window
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    T, H, D = q.shape
    Hkv, C, _ = k_cache.shape
    G = H // Hkv

    BQ = min(block_q, T)
    # q blocks must tile T exactly; shrink until they do
    while T % BQ:
        BQ //= 2
    BK = block_k
    while C % BK:
        BK //= 2
    n_qb = T // BQ

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)  # (Hkv, G, T, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # base_lens, q_pos0
        grid=(Hkv, n_qb),
        in_specs=[
            pl.BlockSpec((1, G, BQ, D), lambda h, qb, lens, pos: (h, 0, qb, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, G, BQ, D), lambda h, qb, lens, pos: (h, 0, qb, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, BK, D), k_cache.dtype),
            pltpu.VMEM((2, BK, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, 1), jnp.float32),
            pltpu.VMEM((G * BQ, D), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _flash_kernel, block_q=BQ, block_k=BK, scale=scale, window=window,
        dtype=q.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(base_lens.astype(jnp.int32), q_pos0.astype(jnp.int32)[None],
      qg, k_cache, v_cache)

    return out.transpose(2, 0, 1, 3).reshape(T, H, D)
