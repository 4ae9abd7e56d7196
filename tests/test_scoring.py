"""Unit tests for the reconstruction-scoring op against a naive numpy
reimplementation of the reference semantics (`attention/score.py:36-65`):
keys = [sink ∥ ctx window ∥ repeat], causal mask only on the trailing repeat
block, softmax (model dtype), ctx-column slice, amax over (group, query)."""

import jax.numpy as jnp
import numpy as np

from kvzip_tpu.ops.attention import reconstruction_scores
from kvzip_tpu.prune import threshold_global, threshold_uniform


def naive_scores(q, k_sink, k_ctx, k_rep, scale):
    """Direct transcription of the reference math in numpy (fp32)."""
    T, H, D = q.shape
    Hkv = k_sink.shape[0]
    G = H // Hkv
    keys = np.concatenate([k_sink, k_ctx, k_rep.transpose(1, 0, 2)], axis=1)
    K = keys.shape[1]
    S0 = k_sink.shape[1] + k_ctx.shape[1]

    out = np.zeros((Hkv, k_ctx.shape[1]), np.float32)
    for h in range(Hkv):
        probs_all = []
        for g in range(G):
            logits = (q[:, h * G + g] @ keys[h].T) * scale  # (T, K)
            for i in range(T):
                for j in range(S0, K):
                    if j - S0 > i:
                        logits[i, j] = -np.inf
            e = np.exp(logits - logits.max(-1, keepdims=True))
            probs_all.append(e / e.sum(-1, keepdims=True))
        probs = np.stack(probs_all)  # (G, T, K)
        out[h] = probs[:, :, k_sink.shape[1]:S0].max(axis=(0, 1))
    return out


def test_reconstruction_scores_match_naive():
    rng = np.random.default_rng(0)
    T, Hkv, G, D = 6, 2, 3, 8
    H = Hkv * G
    S_sink, S_ctx = 3, 10
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k_sink = rng.standard_normal((Hkv, S_sink, D)).astype(np.float32)
    k_ctx = rng.standard_normal((Hkv, S_ctx, D)).astype(np.float32)
    k_rep = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    scale = D ** -0.5

    got = reconstruction_scores(
        jnp.asarray(q), jnp.asarray(k_sink), jnp.asarray(k_ctx),
        jnp.asarray(k_rep), jnp.asarray(S_ctx, jnp.int32), scale=scale,
        out_dtype=jnp.float32)
    want = naive_scores(q, k_sink, k_ctx, k_rep, scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_reconstruction_scores_padding_and_qvalid():
    """Padded ctx columns must come back zero-masked; padded queries must not
    contribute to the amax."""
    rng = np.random.default_rng(1)
    T, Hkv, G, D = 8, 1, 2, 4
    H = Hkv * G
    S_sink, S_ctx, true_ctx, true_q = 2, 12, 7, 5
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k_sink = rng.standard_normal((Hkv, S_sink, D)).astype(np.float32)
    k_ctx = rng.standard_normal((Hkv, S_ctx, D)).astype(np.float32)
    k_rep = rng.standard_normal((T, Hkv, D)).astype(np.float32)

    got = reconstruction_scores(
        jnp.asarray(q), jnp.asarray(k_sink), jnp.asarray(k_ctx),
        jnp.asarray(k_rep), jnp.asarray(true_ctx, jnp.int32), scale=0.5,
        q_valid=jnp.asarray(true_q, jnp.int32), out_dtype=jnp.float32)
    got = np.asarray(got)
    assert got.shape == (Hkv, S_ctx)
    assert np.all(got[:, true_ctx:] == 0)

    # reference: only the first true_q queries with only true_ctx ctx columns
    want = naive_scores(q[:true_q], k_sink, k_ctx[:, :true_ctx],
                        k_rep[:true_q], 0.5)
    np.testing.assert_allclose(got[:, :true_ctx], want, rtol=1e-5, atol=1e-6)


def test_threshold_global_semantics():
    """Exact reference `_threshold` (score.py:88-102): descending sort, index
    max(int(n*ratio)-1, 0), strict > threshold."""
    score = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4) / 24.0)
    valid, thres = threshold_global(score, 0.5)
    flat_sorted = np.sort(np.asarray(score).reshape(-1))[::-1]
    want_thres = flat_sorted[max(int(24 * 0.5) - 1, 0)]
    assert np.isclose(thres, want_thres)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(score) > want_thres)


def test_threshold_uniform_semantics():
    rng = np.random.default_rng(2)
    score = jnp.asarray(rng.standard_normal((3, 2, 10)).astype(np.float32))
    valid, _ = threshold_uniform(score, 0.4)
    v = np.asarray(valid)
    assert v.sum(-1).min() == v.sum(-1).max() == 4  # uniform per-head budgets
    s = np.asarray(score)
    for l in range(3):
        for h in range(2):
            kept = set(np.nonzero(v[l, h])[0])
            topk = set(np.argsort(s[l, h])[::-1][:4])
            assert kept == topk


def test_threshold_hybrid_static_only():
    score = jnp.asarray(np.random.default_rng(3).random((4, 2, 8)), jnp.float32)
    valid, _ = threshold_global(score, 0.25, static_layers=[1, 3])
    v = np.asarray(valid)
    assert v[0].all() and v[2].all()          # sliding layers untouched
    assert not v[[1, 3]].all()                # static layers pruned
