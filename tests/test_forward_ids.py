"""forward_ids (reference __call__ parity): cache restore semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine

CTX = "Forward pass parity check context. " * 40


def test_forward_ids_restores_and_updates():
    eng = Engine("tiny-llama", kv_type="retain", config=tiny_config("llama"),
                 dtype=jnp.float32, max_new_tokens=4, decode_budget=256,
                 capacity_granularity=256, score_chunk_size=256)
    st = eng.prefill(CTX, prefill_chunk_size=300, do_score=False)
    seen0 = int(jax.device_get(st.cache.seen))

    ids = eng.encode("extra tokens to push through")
    logits = eng.forward_ids(ids, st, return_logits=True)
    assert logits.shape == (len(ids), eng.config.vocab_size)
    # default: cache restored (reference update_cache=False)
    assert int(jax.device_get(st.cache.seen)) == seen0

    eng.forward_ids(ids, st, update_cache=True)
    assert int(jax.device_get(st.cache.seen)) == seen0 + len(ids)
