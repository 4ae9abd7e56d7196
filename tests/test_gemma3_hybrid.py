"""Gemma3 hybrid (sliding/static) engine pipeline: scoring only static
layers, sliding layers never pruned, retain-path forced (reference
`model/wrapper.py:74-76`, `attention/kvcache.py:350-599`)."""

import jax
import jax.numpy as jnp
import numpy as np

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine

CTX = ("Hybrid attention mixes sliding and static layers. " * 25 +
       "The checkpoint name is osprey-nine. " +
       "Sliding windows cover recent tokens only. " * 25)


def make_engine():
    cfg = tiny_config("gemma3")
    return Engine("tiny-gemma3", kv_type="evict", config=cfg,
                  dtype=jnp.float32, max_new_tokens=6, decode_budget=256,
                  capacity_granularity=256, score_chunk_size=256)


def test_hybrid_forced_retain():
    eng = make_engine()
    assert eng.kv_type == "retain"  # evict request downgraded like reference


def test_hybrid_pipeline():
    eng = make_engine()
    cfg = eng.config
    state = eng.prefill(CTX, prefill_chunk_size=300)

    # scores exist for every layer but only static layers' values are used
    assert state.score.shape[0] == cfg.num_layers
    static = set(cfg.static_layer_ids)
    assert 0 < len(static) < cfg.num_layers

    thres, true_ratio = eng.prune(state, 0.5, "pair")
    valid = np.asarray(jax.device_get(state.cache.valid))
    ctx_valid = valid[:, :, state.sink:state.prefill_len]
    for l in range(cfg.num_layers):
        if l in static:
            assert not ctx_valid[l].all(), f"static layer {l} not pruned"
        else:
            assert ctx_valid[l].all(), f"sliding layer {l} wrongly pruned"

    out = eng.generate(eng.apply_template("What is the checkpoint name?"), state)
    assert isinstance(out, str)

    # O(1) restore leaves lengths intact (no sliding-cache backup needed —
    # the reference must clone/restore ring buffers, kvcache.py:503-518)
    lens_before = np.asarray(jax.device_get(state.cache.lengths)).copy()
    eng.generate(eng.apply_template("Another question?"), state)
    np.testing.assert_array_equal(
        lens_before, np.asarray(jax.device_get(state.cache.lengths)))


def test_hybrid_prune_ratio_accounts_static_only():
    eng = make_engine()
    state = eng.prefill(CTX, prefill_chunk_size=300)
    _, true_ratio = eng.prune(state, 0.4, "pair")
    # true_ratio is measured over static layers' scores only; should track 0.4
    assert 0.2 < true_ratio < 0.6
