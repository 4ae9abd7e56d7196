"""Fused Pallas scoring kernel vs the jnp reference op (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from kvzip_tpu.ops.attention import reconstruction_scores
from kvzip_tpu.ops.score_kernel import fused_scores


def test_fused_scores_match_reference_op():
    rng = np.random.default_rng(0)
    Hkv, G, D = 2, 3, 16
    H = Hkv * G
    sink, s_ctx = 4, 24
    T = 32                      # padded repeat length
    true_ctx, true_q = 17, 27

    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    k_sink = jnp.asarray(rng.standard_normal((Hkv, sink, D)), jnp.float32)
    k_ctx = jnp.asarray(rng.standard_normal((Hkv, s_ctx, D)), jnp.float32)
    k_rep = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float32)

    want = reconstruction_scores(
        q, k_sink, k_ctx, k_rep, jnp.asarray(true_ctx, jnp.int32),
        scale=D ** -0.5, q_valid=jnp.asarray(true_q, jnp.int32),
        out_dtype=jnp.float32)

    keys = jnp.concatenate([k_sink, k_ctx, jnp.swapaxes(k_rep, 0, 1)], axis=1)
    got = fused_scores(
        q, keys, jnp.asarray(true_ctx, jnp.int32),
        jnp.asarray(true_q, jnp.int32), sink=sink, s_ctx=s_ctx,
        scale=D ** -0.5, block_q=8, interpret=True, model_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_scores_zero_sink():
    rng = np.random.default_rng(1)
    Hkv, G, D, T = 1, 2, 8, 16
    s_ctx = 16
    q = jnp.asarray(rng.standard_normal((T, Hkv * G, D)), jnp.float32)
    k_ctx = jnp.asarray(rng.standard_normal((Hkv, s_ctx, D)), jnp.float32)
    k_rep = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float32)
    k_sink = jnp.zeros((Hkv, 0, D), jnp.float32)

    want = reconstruction_scores(
        q, k_sink, k_ctx, k_rep, jnp.asarray(s_ctx, jnp.int32),
        scale=0.5, q_valid=jnp.asarray(T, jnp.int32), out_dtype=jnp.float32)
    keys = jnp.concatenate([k_ctx, jnp.swapaxes(k_rep, 0, 1)], axis=1)
    got = fused_scores(q, keys, jnp.asarray(s_ctx, jnp.int32),
                       jnp.asarray(T, jnp.int32), sink=0, s_ctx=s_ctx,
                       scale=0.5, block_q=8, interpret=True,
                       model_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
