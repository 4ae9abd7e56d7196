"""Pallas fused reconstruction-scoring kernel (the BASELINE.json north star).

Computes KVzip importance scores — max over (GQA group, query) of softmax
attention from the repeat pass onto the context window (reference
`attention/score.py:36-65`) — without ever materializing the full
(H_kv, G, T, K) probability tensor in HBM. The reference materializes it per
layer (~1 GB at 2k-chunks for a 7B model); here the key set
[sink ∥ ctx window ∥ repeat] lives in VMEM (a few thousand rows), each
(q-chunk × keys) probability tile exists only in registers/VMEM, and the
running per-column max accumulates directly into the (H_kv, ctx) output.

Grid: (kv_head, q_chunk); keys are DMA'd once per head (the key block index
is constant across q chunks, so Pallas skips the re-fetch on revisits).
Numerics parity: logits are quantized to the model dtype (bf16) before the
softmax, exactly like the reference (`score.py:61`, "not fp32").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _score_kernel(meta_ref, q_ref, keys_ref, out_ref, *,
                  block_q: int, sink: int, s_ctx: int, scale: float,
                  model_dtype):
    """meta = [ctx_len, q_valid]; q (1, G, BQ, D); keys (1, D, K) transposed;
    out (1, S_ctx) running max."""
    h = pl.program_id(0)
    qb = pl.program_id(1)
    G = q_ref.shape[1]
    BQ = block_q
    D = q_ref.shape[3]
    K = keys_ref.shape[2]
    rows = G * BQ
    s0 = sink + s_ctx  # start of the repeat region

    ctx_len = meta_ref[0]
    q_valid = meta_ref[1]

    # out block spans the whole (Hkv, S_ctx) array and is revisited by every
    # grid program; zero it once at the first program
    @pl.when((h == 0) & (qb == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    q = q_ref[0].reshape(rows, D)
    keys = keys_ref[0]  # (D, K) — NN matmul (bf16 NT is a Mosaic slow path)

    s = jax.lax.dot_general(
        q, keys, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (rows, K)

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1)
    q_idx = qb * BQ + jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0) % BQ
    # causal mask on the repeat block only (score.py:67-85) + ctx padding
    bad = (col >= s0) & (col - s0 > q_idx)
    bad |= (col >= sink + ctx_len) & (col < s0)
    s = jnp.where(bad, NEG_INF, s)

    # parity: softmax over model-dtype logits (score.py:61)
    s = s.astype(model_dtype).astype(jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.where(jnp.isfinite(s), jnp.exp(s - m), 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-37)

    # padded queries must not contribute (engine pads the repeat pass)
    p = jnp.where(q_idx < q_valid, p, 0.0)

    ctx_p = p[:, sink:s0]  # (rows, S_ctx)
    out_ref[h] = jnp.maximum(out_ref[h],
                             jnp.max(ctx_p, axis=0).astype(out_ref.dtype))


@functools.partial(
    jax.jit,
    static_argnames=("sink", "s_ctx", "scale", "block_q", "interpret",
                     "model_dtype"))
def fused_scores(
    q: jax.Array,          # (T, H, D) repeat-pass queries (padded)
    keys: jax.Array,       # (Hkv, K, D) = [sink ∥ ctx window ∥ repeat] keys
    ctx_len: jax.Array,    # () int32 true window length
    q_valid: jax.Array,    # () int32 true #queries
    *,
    sink: int,
    s_ctx: int,
    scale: float,
    block_q: int = 64,
    interpret: bool = False,
    model_dtype=jnp.bfloat16,
) -> jax.Array:
    """Returns (Hkv, S_ctx) scores; cols beyond ctx_len are zero."""
    T, H, D = q.shape
    Hkv, K, _ = keys.shape
    G = H // Hkv

    BQ = min(block_q, T)
    while T % BQ:
        BQ //= 2
    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)
    keys_t = keys.transpose(0, 2, 1)  # (Hkv, D, K) — NN score matmul

    meta = jnp.stack([ctx_len.astype(jnp.int32), q_valid.astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, T // BQ),
        in_specs=[
            pl.BlockSpec((1, G, BQ, D), lambda h, qb, m: (h, 0, qb, 0)),
            pl.BlockSpec((1, D, K), lambda h, qb, m: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Hkv, s_ctx), lambda h, qb, m: (0, 0)),
    )
    kernel = functools.partial(
        _score_kernel, block_q=BQ, sink=sink, s_ctx=s_ctx, scale=scale,
        model_dtype=model_dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, s_ctx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            # all programs accumulate into one shared out block
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(meta, qg, keys_t)
    return out
