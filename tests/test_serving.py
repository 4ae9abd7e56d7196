"""Batched decode matches sequential decode (same contexts, same queries)."""

import jax.numpy as jnp
import numpy as np

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine
from kvzip_tpu.serving import batched_generate

CTXS = [
    "The first context hides the word falcon inside filler. " * 20,
    "A second, different context mentions the number 7188 often. " * 22,
]


def test_batched_matches_sequential():
    cfg = tiny_config("llama")
    eng = Engine("tiny-llama", kv_type="retain", config=cfg, dtype=jnp.float32,
                 max_new_tokens=6, decode_budget=256, capacity_granularity=256,
                 score_chunk_size=256, attn_impl="blockwise")

    states = [eng.prefill(c, prefill_chunk_size=300) for c in CTXS]
    for st in states:
        eng.prune(st, 0.6, "pair")
    queries = [eng.apply_template("What word is hidden?"),
               eng.apply_template("Which number appears?")]

    seq_out = [eng.generate(q, st) for q, st in zip(queries, states)]
    bat_out = batched_generate(eng, queries, states, max_new_tokens=6)
    assert bat_out == seq_out

    # caches restored for reuse
    for st in states:
        out2 = eng.generate(queries[0], st)
        assert isinstance(out2, str)
