"""End-to-end engine pipeline on a tiny model: prefill → scoring → prune →
generate, plus the KVzip invariants the reference enforces at runtime
(score length == ctx_len; retain ≡ evict on the same scores; ratio=1.0 ≡ full
cache — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine

CTX = ("The quick brown fox jumps over the lazy dog. " * 40 +
       "The secret passcode is 7194. " +
       "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 30)


def make_engine(kv_type, **kw):
    cfg = tiny_config("llama")
    return Engine("tiny-llama", kv_type=kv_type, config=cfg,
                  dtype=jnp.float32, max_new_tokens=8, decode_budget=256,
                  capacity_granularity=256, score_chunk_size=384, **kw)


@pytest.fixture(scope="module")
def retain_state():
    eng = make_engine("retain")
    state = eng.prefill(CTX, prefill_chunk_size=400)
    return eng, state


def test_padded_tail_chunk_equals_exact():
    """The final partial prefill chunk is padded to a 256 multiple (fewer
    compile shapes) and the counters rolled back — cache contents over the
    live rows, scores, and generations must equal an unpadded decomposition."""
    eng_a = make_engine("retain")
    # chunk 512: the tail (prefill_len % 512) goes through the padded path
    st_a = eng_a.prefill(CTX, prefill_chunk_size=512)
    eng_b = make_engine("retain", params=jax.tree.map(jnp.copy, eng_a.params),
                        tokenizer=eng_a.tokenizer)
    # chunk 256: every chunk is ladder-exact, no padding
    st_b = eng_b.prefill(CTX, prefill_chunk_size=256)

    assert int(jax.device_get(st_a.cache.seen)) == \
        int(jax.device_get(st_b.cache.seen))
    n = int(jax.device_get(st_a.cache.seen))
    np.testing.assert_allclose(
        np.asarray(jax.device_get(st_a.cache.k))[:, :, :n],
        np.asarray(jax.device_get(st_b.cache.k))[:, :, :n],
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(st_a.score)),
        np.asarray(jax.device_get(st_b.score)), rtol=1e-4, atol=1e-4)

    q = eng_a.apply_template("What is the passcode?")
    assert eng_a.generate(q, st_a) == eng_b.generate(q, st_b)


def test_scoring_shape_and_range(retain_state):
    eng, state = retain_state
    assert state.score is not None
    L, H = eng.config.num_layers, eng.config.num_kv_heads
    assert state.score.shape == (L, H, state.ctx_len)
    s = np.asarray(jax.device_get(state.score))
    assert np.all(s >= 0) and np.all(s <= 1.0 + 1e-3)
    # random-init attention is near-uniform (~1/n_keys); scores must still
    # be populated and non-degenerate
    assert s.max() > 0 and s.std() > 0


def test_generate_restores_cache(retain_state):
    eng, state = retain_state
    lens_before = np.asarray(jax.device_get(state.cache.lengths)).copy()
    _ = eng.generate(eng.apply_template("What is the passcode?"), state)
    lens_after = np.asarray(jax.device_get(state.cache.lengths))
    np.testing.assert_array_equal(lens_before, lens_after)


def test_prune_ratio_one_is_noop(retain_state):
    eng, state = retain_state
    out_full = eng.generate(eng.apply_template("What is the passcode?"), state)
    thres, true_ratio = eng.prune(state, 1.0, "pair")
    assert true_ratio == 1.0
    out_pruned = eng.generate(eng.apply_template("What is the passcode?"), state)
    assert out_full == out_pruned


@pytest.mark.parametrize("level", ["pair", "pair-uniform"])
def test_prune_levels_ratio(retain_state, level):
    eng, state = retain_state
    thres, true_ratio = eng.prune(state, 0.5, level)
    assert 0.3 < true_ratio < 0.7
    valid = np.asarray(jax.device_get(state.cache.valid))
    # sink + trailing rows always attendable
    assert valid[:, :, :state.sink].all()
    assert valid[:, :, state.prefill_len:].all()


def test_retain_equals_evict():
    """The central cross-path property: masked attention over the full cache
    must equal attention over the physically compacted cache."""
    eng_r = make_engine("retain")
    st_r = eng_r.prefill(CTX, prefill_chunk_size=300)

    eng_e = make_engine("evict")
    # share scores: prefill without scoring, copy from the retain engine
    st_e = eng_e.prefill(CTX, prefill_chunk_size=300, do_score=False)
    eng_e.scoring(st_e, st_e.ctx_ids)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(st_r.score)),
        np.asarray(jax.device_get(st_e.score)), rtol=1e-4, atol=1e-4)

    q = eng_r.apply_template("What is the passcode?")
    score_e = st_e.score
    for ratio in (0.7, 0.4):
        eng_r.prune(st_r, ratio, "pair")
        # evict prune is one-shot (reference kvcache.py:123-185: prepare_init
        # flattens once) — re-prefill per ratio, reusing the scores
        if st_e.pruned:
            st_e = eng_e.prefill(CTX, prefill_chunk_size=300, do_score=False)
            st_e.score = score_e
        eng_e.prune(st_e, ratio, "pair")

        # identical kept sets: retained-mask row counts == compacted lengths
        kept_e = np.asarray(jax.device_get(st_e.cache.lengths))
        kept_r = np.asarray(jax.device_get(
            st_r.cache.valid))[:, :, :st_r.prefill_len].sum(-1)
        np.testing.assert_array_equal(kept_e, kept_r)

        # identical predictions up to numerical noise (the two paths may use
        # different attention impls; strings can flip on a random-init model)
        p_r = eng_r.prob(q, st_r)
        p_e = eng_e.prob(q, st_e)
        np.testing.assert_allclose(p_r, p_e, atol=3e-3, rtol=0)

    # a second prune on the SAME evicted state must refuse loudly
    with pytest.raises(RuntimeError, match="one-shot"):
        eng_e.prune(st_e, 0.2, "pair")


def test_evict_cache_shrinks():
    eng = make_engine("evict")
    state = eng.prefill(CTX, prefill_chunk_size=300)
    full_bytes = state.cache.mem_bytes()
    eng.prune(state, 0.3, "pair")
    assert state.cache.mem_bytes() < full_bytes
    lens = np.asarray(jax.device_get(state.cache.lengths))
    assert (lens >= state.sink).all()
    # non-uniform head budgets from the global threshold
    assert lens.std() > 0


def test_prob_path(retain_state):
    eng, state = retain_state
    ids = np.concatenate([eng.apply_template("What is the passcode?"),
                          eng.encode("7194")])
    p = eng.prob(ids, state)
    assert p.shape == (len(ids), eng.config.vocab_size)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-4)


def test_update_cache_multiturn(retain_state):
    eng, state = retain_state
    seen0 = int(jax.device_get(state.cache.seen))
    n0 = len(state.prefill_ids)
    out = eng.generate(eng.apply_template("Hello"), state, update_cache=True)
    assert len(state.prefill_ids) > n0
    assert int(jax.device_get(state.cache.seen)) > seen0
    # restore for other tests (reference multi-turn keeps it; here we reset)
    state.prefill_ids = state.prefill_ids[:n0]
