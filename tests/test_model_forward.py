"""Core decoder correctness: cache-incremental forward == one-shot forward,
attention backends agree, rope variants sane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.cache import init_cache
from kvzip_tpu.config import tiny_config
from kvzip_tpu.models.params import init_params
from kvzip_tpu.models.transformer import forward
from kvzip_tpu.ops import attention as attn_ops


@pytest.fixture(scope="module", params=["llama", "qwen2", "qwen3", "gemma3"])
def model(request):
    cfg = tiny_config(request.param)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def run_all(cfg, params, ids, capacity=128, chunks=None, impl="dense"):
    cache = init_cache(cfg, capacity, jnp.float32)
    logits = []
    pos = 0
    for n in (chunks or [len(ids)]):
        res = forward(params, cfg, jnp.asarray(ids[pos:pos + n]), cache,
                      collect_logits="all", attn_impl=impl)
        cache = res.cache
        logits.append(res.logits)
        pos += n
    return jnp.concatenate(logits, 0), cache


def test_chunked_prefill_matches_oneshot(model):
    cfg, params = model
    ids = np.arange(1, 31) % cfg.vocab_size
    full, _ = run_all(cfg, params, ids)
    chunked, cache = run_all(cfg, params, ids, chunks=[7, 16, 4, 3])
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=2e-4, atol=2e-4)
    assert int(cache.seen) == 30
    assert np.all(np.asarray(cache.lengths) == 30)


def test_blockwise_matches_dense(model):
    cfg, params = model
    ids = np.arange(1, 41) % cfg.vocab_size
    dense, _ = run_all(cfg, params, ids, impl="dense")
    block, _ = run_all(cfg, params, ids, impl="blockwise")
    np.testing.assert_allclose(np.asarray(dense), np.asarray(block),
                               rtol=2e-4, atol=2e-4)


def test_decode_step_matches_prefill(model):
    cfg, params = model
    ids = np.arange(1, 25) % cfg.vocab_size
    full, _ = run_all(cfg, params, ids)

    # prefill first 20, then 4 single-token decode steps
    cache = init_cache(cfg, 128, jnp.float32)
    res = forward(params, cfg, jnp.asarray(ids[:20]), cache, collect_logits="all")
    cache = res.cache
    outs = [res.logits]
    for t in ids[20:]:
        res = forward(params, cfg, jnp.asarray([t]), cache, collect_logits="all")
        cache = res.cache
        outs.append(res.logits)
    step = jnp.concatenate(outs, 0)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step),
                               rtol=2e-4, atol=2e-4)


def test_attend_dense_vs_naive():
    rng = np.random.default_rng(0)
    T, Hkv, G, C, D = 5, 3, 2, 32, 8
    H = Hkv * G
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    base = jnp.asarray([10, 12, 7], jnp.int32)

    out = attn_ops.attend_dense(q, k, v, base, None, scale=D ** -0.5)
    # naive per-head loop
    for h in range(H):
        hk = h // G
        for i in range(T):
            n = int(base[hk]) + i + 1
            s = (np.asarray(k[hk, :n]) @ np.asarray(q[i, h])) * D ** -0.5
            p = np.exp(s - s.max())
            p /= p.sum()
            expect = p @ np.asarray(v[hk, :n])
            np.testing.assert_allclose(np.asarray(out[i, h]), expect,
                                       rtol=1e-4, atol=1e-4)


def test_valid_mask_blocks_attention():
    """Masking rows == physically compacting them (retain path ≡ evict path).

    One appended query (its own KV at row base) over an 8-row cache with rows
    [2,4) pruned, vs the compacted 6-row cache.
    """
    rng = np.random.default_rng(1)
    Hkv, G, C, D = 2, 2, 16, 4
    q = jnp.asarray(rng.standard_normal((1, Hkv * G, D)), jnp.float32)
    k = np.asarray(rng.standard_normal((Hkv, C, D)), np.float32)
    v = np.asarray(rng.standard_normal((Hkv, C, D)), np.float32)

    valid = np.ones((Hkv, C), bool)
    valid[:, 2:4] = False
    out_masked = attn_ops.attend_dense(
        q, jnp.asarray(k), jnp.asarray(v), jnp.asarray([8, 8], jnp.int32),
        jnp.asarray(valid), scale=D ** -0.5)

    keep = [0, 1, 4, 5, 6, 7, 8]  # rows 0..8 minus pruned, incl. own row 8
    k2 = np.zeros((Hkv, C, D), np.float32)
    v2 = np.zeros((Hkv, C, D), np.float32)
    k2[:, :7] = k[:, keep]
    v2[:, :7] = v[:, keep]
    out_removed = attn_ops.attend_dense(
        q, jnp.asarray(k2), jnp.asarray(v2), jnp.asarray([6, 6], jnp.int32),
        None, scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_removed),
                               rtol=1e-5, atol=1e-5)
