"""Pallas fused windowed scoring-attention (VERDICT r4 item 2).

The opt-in ``Engine(scoring_attend="window")`` mode makes reconstruction
scoring O(ctx·window) instead of O(ctx²): each repeat pass attends only
[sink ∥ scored window ∥ repeat] instead of the full cache (reference-exact
scoring attends everything, `model/wrapper.py:223-249`, making scoring
FLOPs intrinsically 2× prefill's). The jnp implementation
(`ops/attention.py::windowed_scoring_attend`) realizes only ~1.2× of the
theoretical ~10×: it materializes the (Hkv, G, T, K) f32 logits AND probs
(~1.1 GB/layer/chunk at 7B) in HBM, so the saved FLOPs are spent on HBM
traffic.

This kernel streams instead: the whole key/value set for one kv head
(K = sink + window + repeat ≈ 4.5k rows ≈ 2.3 MB bf16) sits in VMEM, each
(G·BQ, K) probability tile lives only in registers/VMEM, and the attention
output is written directly. One-shot softmax per q block — no online
rescan needed because K fits. Masking matches the jnp path exactly
(causal only on the trailing T×T block, padded window columns dropped,
padded QUERY rows deliberately unmasked — their outputs are discarded by
the engine, see windowed_scoring_attend's docstring).

Same grid/VMEM strategy as `ops/score_kernel.py::fused_scores`; unlike it,
the softmax here is the model's attention (f32), not the score hook's
deliberate bf16 round-trip (`attention/score.py:61`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _windowed_attend_kernel(meta_ref, q_ref, keys_ref, vals_ref, o_ref, *,
                            block_q: int, sink: int, s_ctx: int,
                            scale: float, dtype):
    G = q_ref.shape[1]
    BQ = block_q
    D = q_ref.shape[3]
    K = keys_ref.shape[2]
    rows = G * BQ
    s0 = sink + s_ctx  # start of the repeat region
    qb = pl.program_id(1)

    ctx_len = meta_ref[0]

    q = q_ref[0].reshape(rows, D)
    keys = keys_ref[0]                     # (D, K) transposed — NN matmul

    s = jax.lax.dot_general(
        q, keys, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (rows, K)

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1)
    q_idx = qb * BQ + jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0) % BQ
    # causal on the trailing T×T block only + padded window columns
    bad = (col >= s0) & (col - s0 > q_idx)
    bad |= (col >= sink + ctx_len) & (col < s0)
    s = jnp.where(bad, NEG_INF, s)

    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.where(jnp.isfinite(s), jnp.exp(s - m), 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-37)

    out = jax.lax.dot_general(
        p.astype(vals_ref.dtype), vals_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (rows, D)
    o_ref[0] = out.reshape(G, BQ, D).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sink", "s_ctx", "scale", "block_q", "interpret"))
def windowed_attend(
    q: jax.Array,          # (T, H, D) repeat-pass queries (padded)
    keys: jax.Array,       # (Hkv, K, D) = [sink ∥ ctx window ∥ repeat]
    vals: jax.Array,       # (Hkv, K, D)
    ctx_len: jax.Array,    # () int32 true window length
    *,
    sink: int,
    s_ctx: int,
    scale: float,
    block_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Returns the (T, H, D) attention output of the windowed scoring pass."""
    T, H, D = q.shape
    Hkv, K, _ = keys.shape
    G = H // Hkv

    BQ = min(block_q, T)
    while T % BQ:
        BQ //= 2
    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)  # (Hkv, G, T, D)
    keys_t = keys.transpose(0, 2, 1)                    # (Hkv, D, K)

    meta = jnp.asarray(ctx_len, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, T // BQ),
        in_specs=[
            pl.BlockSpec((1, G, BQ, D), lambda h, qb, m: (h, 0, qb, 0)),
            pl.BlockSpec((1, D, K), lambda h, qb, m: (h, 0, 0)),
            pl.BlockSpec((1, K, D), lambda h, qb, m: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, G, BQ, D), lambda h, qb, m: (h, 0, qb, 0)),
    )
    kernel = functools.partial(
        _windowed_attend_kernel, block_q=BQ, sink=sink, s_ctx=s_ctx,
        scale=scale, dtype=q.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(meta, qg, keys_t, vals)
    return out.transpose(2, 0, 1, 3).reshape(T, H, D)


def windowed_scoring_attend_fused(
    q: jax.Array,          # (T, H, D)
    k_sink: jax.Array,     # (Hkv, S_sink, D)
    k_ctx: jax.Array,      # (Hkv, S_ctx, D)
    k_rep: jax.Array,      # (T, Hkv, D)
    v_sink: jax.Array,
    v_ctx: jax.Array,
    v_rep: jax.Array,
    ctx_len: jax.Array,
    *,
    scale: float,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused replacement for
    `ops/attention.py::windowed_scoring_attend` (same signature + semantics;
    equality tested in tests/test_scoring_window.py)."""
    sink, s_ctx = k_sink.shape[1], k_ctx.shape[1]
    keys = jnp.concatenate(
        [k_sink, k_ctx, jnp.swapaxes(k_rep, 0, 1)], axis=1)
    vals = jnp.concatenate(
        [v_sink, v_ctx, jnp.swapaxes(v_rep, 0, 1)], axis=1)
    return windowed_attend(
        q.astype(out_dtype), keys, vals, ctx_len, sink=sink, s_ctx=s_ctx,
        scale=scale, interpret=interpret).astype(out_dtype)
