"""Per-layer fused W4A8 megakernel vs the composed per-launch path.

The megakernel must reproduce o-proj -> residual -> RMSNorm -> gate/up ->
SiLU*up -> down -> residual -> next-layer RMSNorm -> qkv exactly as the
composed ops compute it (same bf16 rounding points), so decode results do
not change when the fusion is enabled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.ops.w4a8 import quantize_weight_int4
from kvzip_tpu.ops.w4a8_v2 import repack_scales_v2, w4a8_jnp_v2
from kvzip_tpu.ops.w4a8_fused import w4a8_layer_fused

L, D, I = 3, 256, 384
H, Hkv, Dh = 2, 1, 128
EPS = 1e-6


def _quant(rng, IN, OUT):
    w = jnp.asarray(rng.standard_normal((L, IN, OUT)) * 0.05, jnp.float32)
    return repack_scales_v2(quantize_weight_int4(w), in_dim=IN)


def _rms(x, w):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + EPS)
            * w.astype(jnp.float32)).astype(x.dtype)


@pytest.fixture(scope="module")
def weights():
    rng = np.random.default_rng(0)
    return dict(
        wo=_quant(rng, H * Dh, D),
        wgu=_quant(rng, D, 2 * I),
        wdn=_quant(rng, I, D),
        wqkv=_quant(rng, D, H * Dh + 2 * Hkv * Dh),
        lnm=jnp.asarray(rng.standard_normal((L, D)) * 0.1 + 1, jnp.bfloat16),
        lna=jnp.asarray(rng.standard_normal((L, D)) * 0.1 + 1, jnp.bfloat16),
    )


def _composed(x, attn_out, wts, layer):
    sl = lambda w: {k: v[layer] for k, v in w.items()}
    o = w4a8_jnp_v2(attn_out, sl(wts["wo"]))
    x1 = x + o
    h2 = _rms(x1, wts["lnm"][layer])
    gu = w4a8_jnp_v2(h2, sl(wts["wgu"]))
    hidden = jax.nn.silu(gu[:, :I]) * gu[:, I:]
    x2 = x1 + w4a8_jnp_v2(hidden, sl(wts["wdn"]))
    nxt = min(layer + 1, L - 1)
    h3 = _rms(x2, wts["lna"][nxt])
    qkv = w4a8_jnp_v2(h3, sl(wts["wqkv"]))
    return x2, qkv


@pytest.mark.parametrize("T", [1, 4])
@pytest.mark.parametrize("layer", [0, L - 1])
def test_megakernel_matches_composed(weights, T, layer):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((T, D)) * 0.3, jnp.bfloat16)
    attn = jnp.asarray(rng.standard_normal((T, H * Dh)) * 0.3, jnp.bfloat16)

    x_ref, qkv_ref = _composed(x, attn, weights, layer)
    x_got, qkv_got = w4a8_layer_fused(
        x, attn, weights["lnm"][:, None, :], weights["lna"][:, None, :],
        weights["wo"], weights["wgu"], weights["wdn"], weights["wqkv"],
        jnp.int32(layer), eps=EPS, interpret=True)

    assert x_got.shape == x_ref.shape and qkv_got.shape == qkv_ref.shape
    for got, ref, name in ((x_got, x_ref, "x"), (qkv_got, qkv_ref, "qkv")):
        g = np.asarray(got, np.float32)
        r = np.asarray(ref, np.float32)
        scale = np.abs(r).max() + 1e-6
        err = np.abs(g - r).max() / scale
        assert err < 3e-2, (name, err, scale)


def test_engine_decode_megakernel_matches_composed():
    """Engine-level: decode through the megakernel (fuse_layer='on',
    interpret on CPU) produces the same generation as the composed path."""
    from kvzip_tpu.config import tiny_config
    from kvzip_tpu.engine import Engine

    cfg = tiny_config("qwen2", head_dim=128, num_heads=4, num_kv_heads=2,
                      hidden_size=128)
    ctx = "The relay station Kestrel reported code 5521 at dawn. " * 8

    def run(fuse):
        eng = Engine("tiny-qwen2", kv_type="evict", config=cfg,
                     dtype=jnp.float32, max_new_tokens=8, decode_budget=256,
                     capacity_granularity=256, score_chunk_size=256,
                     weight_quant="w4a8", flat_decode="on", seed=11)
        eng.fuse_layer = fuse
        st = eng.prefill(ctx, prefill_chunk_size=200)
        eng.prune(st, 0.5, "pair")
        return eng.generate(eng.apply_template("Which code was reported?"),
                            st)

    assert run("on") == run("off")
