"""Multi-device (8 virtual CPU devices) TP/DP tests: sharded pipeline runs
and matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine
from kvzip_tpu.parallel import make_mesh

CTX = ("Sharded caches should behave identically. " * 30 +
       "The secret word is zanzibar. " +
       "Filler sentence for the long tail of the context. " * 20)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_tp_matches_single_device():
    cfg = tiny_config("llama")  # 8 q heads, 4 kv heads

    def build(mesh):
        return Engine("tiny-llama", kv_type="evict", config=cfg,
                      dtype=jnp.float32, max_new_tokens=8, decode_budget=256,
                      capacity_granularity=256, score_chunk_size=256,
                      mesh=mesh, seed=3)

    ref = build(None)
    st_ref = ref.prefill(CTX, prefill_chunk_size=300)

    mesh = make_mesh(4, tp=4)
    eng = build(mesh)
    st = eng.prefill(CTX, prefill_chunk_size=300)

    np.testing.assert_allclose(
        np.asarray(jax.device_get(st.score)),
        np.asarray(jax.device_get(st_ref.score)), rtol=2e-4, atol=2e-4)

    ref.prune(st_ref, 0.5, "pair")
    eng.prune(st, 0.5, "pair")
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(st.cache.lengths)),
        np.asarray(jax.device_get(st_ref.cache.lengths)))

    q = eng.apply_template("What is the secret word?")
    p = eng.prob(q, st)
    p_ref = ref.prob(q, st_ref)
    np.testing.assert_allclose(p, p_ref, atol=3e-3, rtol=0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_tp_mesh_generate():
    cfg = tiny_config("llama")
    mesh = make_mesh(8, tp=4)  # data=2, model=4
    eng = Engine("tiny-llama", kv_type="retain", config=cfg,
                 dtype=jnp.float32, max_new_tokens=6, decode_budget=256,
                 capacity_granularity=256, score_chunk_size=256, mesh=mesh)
    st = eng.prefill(CTX, prefill_chunk_size=300)
    eng.prune(st, 0.5, "pair")
    out = eng.generate(eng.apply_template("What is the secret word?"), st)
    assert isinstance(out, str)
