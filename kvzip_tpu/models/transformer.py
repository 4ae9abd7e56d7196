"""Pure-functional decoder forward for the KVzip-TPU engine.

One ``lax.scan`` over stacked layer parameters (compiled once for the whole
stack), threading the KV cache arrays through the carry so donated buffers are
updated in place. Covers the reference model families (llama3.x / qwen2.5 /
qwen3 / gemma3 text — `model/load.py:5-39`): GQA + RoPE variants, optional
QKV bias (qwen2), per-head QK-norm (qwen3/gemma3), gemma3 pre/post norms,
(1+w) RMSNorm, embedding scaling and hybrid sliding/static attention.

The KVzip hooks of the reference's monkeypatched attention
(`attention/attn.py:52-58`) are first-class here: ``scoring`` mode computes
reconstruction importance scores per layer, and the retain-mask / ragged
lengths of the cache drive pruned attention.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kvzip_tpu.cache import KVCache, append_layer
from kvzip_tpu.config import ModelConfig
from kvzip_tpu.models.rope import apply_rope, rope_cos_sin
from kvzip_tpu.ops import attention as attn_ops


class ForwardResult(NamedTuple):
    logits: Optional[jax.Array]        # (T, V) or (1, V) or None
    cache: KVCache
    chunk_scores: Optional[jax.Array]  # (L, H_kv, score_width) or None


def rms_norm(x: jax.Array, w: jax.Array, eps: float, gemma: bool = False) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps)
    if gemma:
        return (xn * (1.0 + w.astype(jnp.float32))).astype(x.dtype)
    return (xn * w.astype(jnp.float32)).astype(x.dtype)


def _act(x: jax.Array, kind: str) -> jax.Array:
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu_pytorch_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(kind)


def _head_norm(x: jax.Array, w: jax.Array, eps: float, gemma: bool) -> jax.Array:
    """Per-head RMSNorm on (T, H, D) with weight (D,) (qwen3/gemma3 qk-norm)."""
    return rms_norm(x, w, eps, gemma=gemma)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "collect_logits", "scoring", "score_width", "sink", "attn_impl"),
    donate_argnames=("cache",),
)
def forward(
    params,
    cfg: ModelConfig,
    ids: jax.Array,            # (T,) int32
    cache: KVCache,
    *,
    collect_logits: str = "none",   # "none" | "last" | "all"
    scoring: bool = False,
    score_start: Optional[jax.Array] = None,  # () int32 cache row of ctx window
    score_len: Optional[jax.Array] = None,    # () int32 true window length
    score_qlen: Optional[jax.Array] = None,   # () int32 true #repeat queries
    score_width: int = 0,                      # static padded window width
    sink: int = 0,                             # static sink length (sys prompt)
    attn_impl: str = "dense",                  # "dense" | "blockwise" | "pallas"
) -> ForwardResult:
    T = ids.shape[0]
    L, Hkv, C, Dh = cache.k.shape
    H = cfg.num_heads
    scale = cfg.query_scale if cfg.query_scale is not None else Dh ** -0.5
    dtype = params["embed"].dtype

    x = params["embed"][ids]
    if cfg.gemma_style_norm:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, dtype)

    positions = cache.seen + jnp.arange(T, dtype=jnp.int32)
    cos_g, sin_g = rope_cos_sin(cfg.rope, Dh, positions)
    if cfg.rope_local is not None:
        cos_l, sin_l = rope_cos_sin(cfg.rope_local, Dh, positions)
    else:
        cos_l, sin_l = cos_g, sin_g

    is_static_layers = jnp.asarray(
        [cfg.layer_is_static(l) for l in range(L)], jnp.bool_)
    if cfg.sliding_window is not None:
        # per-layer effective window; "no window" encoded as > any position
        windows = jnp.where(is_static_layers, jnp.int32(2 ** 30),
                            jnp.int32(cfg.sliding_window))
    else:
        windows = None

    lp = params["layers"]
    base_lens_all = cache.lengths             # (L, Hkv)
    q_pos0 = cache.seen

    def layer_fn(carry, xs):
        x, k_all, v_all = carry
        (layer_params, layer_idx, is_static, base_lens, valid_l) = xs

        h = rms_norm(x, layer_params["ln_attn"], cfg.rms_norm_eps,
                     gemma=cfg.gemma_style_norm)
        q = h @ layer_params["wq"]
        k = h @ layer_params["wk"]
        v = h @ layer_params["wv"]
        if cfg.attention_bias:
            q = q + layer_params["bq"]
            k = k + layer_params["bk"]
            v = v + layer_params["bv"]
        q = q.reshape(T, H, Dh)
        k = k.reshape(T, Hkv, Dh)
        v = v.reshape(T, Hkv, Dh)
        if cfg.qk_norm:
            q = _head_norm(q, layer_params["q_norm"], cfg.rms_norm_eps,
                           cfg.gemma_style_norm)
            k = _head_norm(k, layer_params["k_norm"], cfg.rms_norm_eps,
                           cfg.gemma_style_norm)

        if cfg.rope_local is not None:
            cos = jnp.where(is_static, cos_g, cos_l)
            sin = jnp.where(is_static, sin_g, sin_l)
        else:
            cos, sin = cos_g, sin_g
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # -- cache append (O(T), in-place on donated buffers) --
        k_cache = k_all[layer_idx]
        v_cache = v_all[layer_idx]
        k_cache, v_cache = append_layer(k_cache, v_cache, base_lens, k, v)
        k_all = k_all.at[layer_idx].set(k_cache)
        v_all = v_all.at[layer_idx].set(v_cache)

        # -- KVzip reconstruction scoring hook (attn.py:53-54) --
        if scoring:
            k_sink = k_cache[:, :sink]
            k_ctx = jax.lax.dynamic_slice(
                k_cache, (0, score_start, 0), (Hkv, score_width, Dh))
            layer_score = attn_ops.reconstruction_scores(
                q, k_sink, k_ctx, k, score_len, scale=scale,
                q_valid=score_qlen, out_dtype=dtype)
        else:
            layer_score = jnp.zeros((Hkv, 0), dtype)

        # -- attention over the cache --
        win = None
        if windows is not None:
            win = windows[layer_idx]
        if attn_impl in ("flash", "flash_interpret"):
            # Pallas kernel: streams only live KV (no valid-mask support —
            # the engine routes pruned-retain decode elsewhere)
            from kvzip_tpu.ops.flash import flash_attend
            attn_out = flash_attend(
                q, k_cache, v_cache, base_lens, q_pos0, scale=scale,
                interpret=(attn_impl == "flash_interpret"))
        elif attn_impl == "blockwise":
            attn_out = attn_ops.attend_blockwise(
                q, k_cache, v_cache, base_lens, valid_l, scale=scale,
                q_pos0=q_pos0, window=win)
        else:
            attn_out = attn_ops.attend_dense(
                q, k_cache, v_cache, base_lens, valid_l, scale=scale,
                q_pos0=q_pos0, window=win)

        attn_out = attn_out.reshape(T, H * Dh) @ layer_params["wo"]
        if cfg.post_norms:
            attn_out = rms_norm(attn_out, layer_params["ln_post_attn"],
                                cfg.rms_norm_eps, gemma=cfg.gemma_style_norm)
        x = x + attn_out

        h2 = rms_norm(x, layer_params["ln_mlp"], cfg.rms_norm_eps,
                      gemma=cfg.gemma_style_norm)
        mlp = (_act(h2 @ layer_params["w_gate"], cfg.hidden_act)
               * (h2 @ layer_params["w_up"])) @ layer_params["w_down"]
        if cfg.post_norms:
            mlp = rms_norm(mlp, layer_params["ln_post_mlp"], cfg.rms_norm_eps,
                           gemma=cfg.gemma_style_norm)
        x = x + mlp

        return (x, k_all, v_all), layer_score

    xs = (lp, jnp.arange(L, dtype=jnp.int32), is_static_layers,
          base_lens_all, cache.valid)
    (x, k_all, v_all), scores = jax.lax.scan(
        layer_fn, (x, cache.k, cache.v), xs)

    new_cache = dataclasses.replace(
        cache, k=k_all, v=v_all,
        lengths=cache.lengths + jnp.int32(T),
        seen=cache.seen + jnp.int32(T))

    logits = None
    if collect_logits != "none":
        xf = x if collect_logits == "all" else x[-1:]
        xf = rms_norm(xf, params["final_norm"], cfg.rms_norm_eps,
                      gemma=cfg.gemma_style_norm)
        head = params.get("lm_head", params["embed"])
        logits = xf @ head.T

    return ForwardResult(logits, new_cache, scores if scoring else None)
