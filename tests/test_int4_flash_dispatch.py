"""The transformer's int4 prefill dispatch: flash_attend_int4 (interpret) for
large chunks must agree with the jnp blockwise path end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine

CTX = "Dispatch check context sentence repeated for length. " * 40


def build(attn_impl):
    # num_kv_heads=4, NOT 2: the scoring-extras scale stack is (Hkv, 2, T);
    # with Hkv == 2 a transposed (2, Hkv, T) layout has the same shape and
    # a layout bug passes silently (it shipped — caught on chip at Hkv=4)
    cfg = tiny_config("llama", head_dim=128, num_heads=4, num_kv_heads=4,
                      hidden_size=128)
    return Engine("tiny-llama", kv_type="evict", config=cfg,
                  dtype=jnp.float32, max_new_tokens=4, decode_budget=256,
                  capacity_granularity=256, score_chunk_size=256,
                  kv_quant="int4", attn_impl=attn_impl, flat_decode="off")


def test_int4_flash_prefill_matches_blockwise():
    eng_k = build("flash_interpret")  # kernel path for chunks > 8 tokens
    eng_b = build("blockwise")

    st_k = eng_k.prefill(CTX, prefill_chunk_size=300, do_score=False)
    st_b = eng_b.prefill(CTX, prefill_chunk_size=300, do_score=False)

    q = eng_k.apply_template("What repeats?")
    p_k = eng_k.prob(q, st_k)
    p_b = eng_b.prob(q, st_b)
    np.testing.assert_allclose(p_k, p_b, atol=3e-3, rtol=0)


def test_int4_readonly_scoring_matches_fallback():
    """Read-only scoring (kernel with VMEM extras, nothing appended) ==
    the local-append jnp fallback == pre-change append semantics; and the
    cache is untouched by scoring (counters identical)."""
    eng_k = build("flash_interpret")
    eng_b = build("blockwise")

    st_k = eng_k.prefill(CTX, prefill_chunk_size=300, do_score=False)
    seen0 = int(jax.device_get(st_k.cache.seen))
    eng_k.scoring(st_k, st_k.ctx_ids)
    assert int(jax.device_get(st_k.cache.seen)) == seen0
    assert int(jax.device_get(st_k.cache.lengths.max())) == seen0

    st_b = eng_b.prefill(CTX, prefill_chunk_size=300, do_score=False)
    eng_b.scoring(st_b, st_b.ctx_ids)

    s_k = np.asarray(jax.device_get(st_k.score))
    s_b = np.asarray(jax.device_get(st_b.score))
    np.testing.assert_allclose(s_k, s_b, atol=3e-3, rtol=0)

    # the pipeline continues identically after read-only scoring
    eng_k.prune(st_k, 0.5, "pair")
    eng_b.prune(st_b, 0.5, "pair")
    q = eng_k.apply_template("What repeats?")
    assert eng_k.generate(q, st_k) == eng_b.generate(q, st_b)
