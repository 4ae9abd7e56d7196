"""Fused W8A8 activation kernels (ops/fused_act.py) — QServe
RMSNormGeneral / SiluAndMulQuant parity (reference
`model/quant_model/w8a8kv4_llama.py:126-163`; VERDICT r3 missing 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.ops.fused_act import rmsnorm_quant, silu_mul_quant
from kvzip_tpu.ops.quant import quantize_act_int8


def _rms_ref(x, w, eps, gemma):
    xf = np.asarray(x, np.float32)
    var = (xf * xf).mean(axis=-1, keepdims=True)
    h = xf / np.sqrt(var + eps)
    wv = np.asarray(w, np.float32)
    return h * ((1.0 + wv) if gemma else wv)


@pytest.mark.parametrize("T,gemma", [(1, False), (8, False), (130, False),
                                     (8, True)])
def test_rmsnorm_quant_parity(T, gemma):
    rng = np.random.default_rng(0)
    D = 256
    x = jnp.asarray(rng.standard_normal((T, D)) * 2.0, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D,)) * 0.5, jnp.bfloat16)
    q, s = rmsnorm_quant(x, w, 1e-5, gemma=gemma, interpret=True)
    assert q.shape == (T, D) and q.dtype == jnp.int8
    assert s.shape == (T, 1) and s.dtype == jnp.float32

    # dequantized fused output tracks the f32 reference within one quant
    # step per element (the fused path skips the bf16 round-trip the
    # unfused rms_norm -> quantize_act_int8 chain pays, so compare against
    # the f32 composition, tolerance one scale unit + bf16 input noise)
    want = _rms_ref(np.asarray(x, np.float32), w, 1e-5, gemma)
    got = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    tol = np.asarray(s, np.float32) * 1.01 + np.abs(want) * 0.02
    assert (np.abs(got - want) <= tol).all()


def test_rmsnorm_quant_matches_unfused_scale():
    """The per-token scale equals quantize_act_int8's on the same (f32)
    normalized activation."""
    rng = np.random.default_rng(1)
    T, D = 16, 128
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    q, s = rmsnorm_quant(x, w, 1e-6, interpret=True)
    h = jnp.asarray(_rms_ref(x, w, 1e-6, False), jnp.float32)
    q2, s2 = quantize_act_int8(h)
    np.testing.assert_allclose(np.asarray(s)[:, 0], np.asarray(s2)[:, 0],
                               rtol=1e-6)
    # int8 codes may differ by 1 where rounding sits on a .5 boundary
    assert np.abs(np.asarray(q, np.int32) -
                  np.asarray(q2, np.int32)).max() <= 1


@pytest.mark.parametrize("T,act", [(1, "silu"), (8, "silu"), (70, "silu"),
                                   (8, "gelu_pytorch_tanh")])
def test_silu_mul_quant_parity(T, act):
    rng = np.random.default_rng(2)
    F = 384
    g = jnp.asarray(rng.standard_normal((T, F)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((T, F)), jnp.float32)
    q, s = silu_mul_quant(g, u, act=act, interpret=True)
    assert q.shape == (T, F) and s.shape == (T, 1)

    gf = np.asarray(g, np.float32)
    if act == "silu":
        href = gf / (1.0 + np.exp(-gf)) * np.asarray(u, np.float32)
    else:
        href = np.asarray(
            jax.nn.gelu(g, approximate=True) * u, np.float32)
    got = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    tol = np.asarray(s, np.float32) * 1.01 + np.abs(href) * 1e-5
    assert (np.abs(got - href) <= tol).all()


def test_engine_fused_act_equals_xla():
    """End-to-end: a W8A8 tiny model generates the SAME text with the
    fused Pallas activation path (interpret on CPU) as with the XLA-fused
    unfused ops, through prefill -> scoring -> prune -> decode."""
    from kvzip_tpu.config import tiny_config
    from kvzip_tpu.engine import Engine

    cfg = tiny_config("qwen2")  # qkv bias exercises the bias path
    ctx = ("The research vessel Meridian departed under callsign KX7Q "
           "carrying twelve crates of basalt cores. ") * 12
    q = "What is the callsign?"

    outs = []
    for fused in ("xla", "pallas"):
        eng = Engine("tiny-qwen2", kv_type="evict", config=cfg,
                     dtype=jnp.float32, max_new_tokens=6, decode_budget=256,
                     capacity_granularity=256, score_chunk_size=256,
                     weight_quant="w8a8", act_fused=fused, seed=3)
        st = eng.prefill(ctx, prefill_chunk_size=300)
        eng.prune(st, 0.5, "pair")
        outs.append(eng.generate(eng.apply_template(q), st))
    assert outs[0] == outs[1], outs
