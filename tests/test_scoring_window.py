"""Windowed scoring (Engine(scoring_attend="window")) — the O(ctx·window)
opt-in approximation of the reconstruction-scoring forward.

Exactness property: when ONE scoring window covers the entire context, the
windowed key set [sink ∥ window ∥ repeat] equals the full cache, so scores
and downstream behavior must match the exact mode (up to reduction-order
float noise). Multi-window runs only assert the pipeline works end-to-end —
hidden states legitimately deviate there (documented approximation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine

CTX_SHORT = ("The survey ship Halcyon logged anomaly 4417 near the trench. "
             * 6)
CTX_LONG = ("Sector logs mention the frigate Peregrine and beacon 7731. "
            * 40)


def _engine(scoring_attend, ctx_chunk, kv_quant="none", params=None,
            tokenizer=None):
    cfg = tiny_config("llama", head_dim=128, num_heads=4, num_kv_heads=2,
                      hidden_size=128)
    return Engine("tiny-llama", kv_type="evict", config=cfg,
                  dtype=jnp.float32, max_new_tokens=6, decode_budget=256,
                  capacity_granularity=256, score_chunk_size=ctx_chunk,
                  kv_quant=kv_quant, scoring_attend=scoring_attend,
                  params=params, tokenizer=tokenizer, seed=5)


@pytest.mark.parametrize("kv_quant", ["none", "int4"])
def test_window_equals_full_when_window_covers_context(kv_quant):
    eng_f = _engine("full", 512, kv_quant)
    st_f = eng_f.prefill(CTX_SHORT, prefill_chunk_size=300)
    assert st_f.ctx_len <= 512, "context must fit one scoring window"

    eng_w = _engine("window", 512, kv_quant, params=eng_f.params,
                    tokenizer=eng_f.tokenizer)
    st_w = eng_w.prefill(CTX_SHORT, prefill_chunk_size=300)

    sf = np.asarray(jax.device_get(st_f.score), np.float32)
    sw = np.asarray(jax.device_get(st_w.score), np.float32)
    np.testing.assert_allclose(sw, sf, rtol=0, atol=3e-4)

    q = eng_f.apply_template("What anomaly number was logged?")
    eng_f.prune(st_f, 0.5, "pair")
    eng_w.prune(st_w, 0.5, "pair")
    assert eng_w.generate(q, st_w) == eng_f.generate(q, st_f)


def test_window_multi_chunk_pipeline():
    """Several scoring windows: the approximation runs the whole pipeline
    (scores finite and full-width, prune + decode fine)."""
    eng = _engine("window", 256)
    st = eng.prefill(CTX_LONG, prefill_chunk_size=300)
    assert st.ctx_len > 256  # really multi-window

    s = np.asarray(jax.device_get(st.score), np.float32)
    assert s.shape[-1] == st.ctx_len
    assert np.isfinite(s).all() and s.max() > 0

    eng.prune(st, 0.4, "pair")
    out = eng.generate(eng.apply_template("Which beacon is mentioned?"), st)
    assert isinstance(out, str)


def test_window_rejects_hybrid():
    cfg = tiny_config("gemma3")
    with pytest.raises(ValueError, match="hybrid"):
        Engine("tiny-gemma3", kv_type="retain", config=cfg,
               dtype=jnp.float32, scoring_attend="window")
