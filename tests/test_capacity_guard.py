"""Capacity overflow must raise, not silently clamp-corrupt the cache."""

import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine

CTX = "Capacity guard context filler sentence. " * 40


def test_dense_overflow_raises():
    eng = Engine("tiny-llama", kv_type="retain", config=tiny_config("llama"),
                 dtype=jnp.float32, max_new_tokens=8, decode_budget=256,
                 capacity_granularity=256, score_chunk_size=256)
    st = eng.prefill(CTX, prefill_chunk_size=300, do_score=False)
    big_query = np.ones((st.cache.capacity,), np.int32)
    with pytest.raises(ValueError, match="capacity"):
        eng.generate(big_query, st)


def test_flat_tail_overflow_raises():
    cfg = tiny_config("llama", head_dim=128, num_heads=4, num_kv_heads=2,
                      hidden_size=128)
    eng = Engine("tiny-llama", kv_type="evict", config=cfg, dtype=jnp.float32,
                 max_new_tokens=8, decode_budget=256, capacity_granularity=256,
                 score_chunk_size=256, flat_decode="on")
    st = eng.prefill(CTX, prefill_chunk_size=300)
    eng.prune(st, 0.5, "pair")
    big_query = np.ones((300,), np.int32)
    with pytest.raises(ValueError, match="tail"):
        eng.generate(big_query, st)
