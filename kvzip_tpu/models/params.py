"""Parameter pytrees: random init + HF safetensors conversion.

Layout: a dict with stacked per-layer arrays (leading ``L`` dim) so the whole
decoder runs as one ``lax.scan`` over layers — compiled once, not per layer.
Linear weights are stored as (in, out) so forward is ``x @ w`` (row-major
matmul onto the MXU without transposes).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from kvzip_tpu.config import ModelConfig

Params = Dict[str, Any]


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    """Random small-scale init (tests/benchmarks; real use loads safetensors)."""
    D, H, Hkv, Dh = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L, I, V = cfg.num_layers, cfg.intermediate_size, cfg.vocab_size
    ks = jax.random.split(key, 8)

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params: Params = {
        "embed": nrm(ks[0], (V, D)),
        "layers": {
            "wq": nrm(ks[1], (L, D, H * Dh)),
            "wk": nrm(ks[2], (L, D, Hkv * Dh)),
            "wv": nrm(ks[3], (L, D, Hkv * Dh)),
            "wo": nrm(ks[4], (L, H * Dh, D)),
            "w_gate": nrm(ks[5], (L, D, I)),
            "w_up": nrm(ks[6], (L, D, I)),
            "w_down": nrm(ks[7], (L, I, D)),
            "ln_attn": jnp.ones((L, D), dtype),
            "ln_mlp": jnp.ones((L, D), dtype),
        },
        "final_norm": jnp.ones((D,), dtype),
    }
    lp = params["layers"]
    if cfg.attention_bias:
        lp["bq"] = jnp.zeros((L, H * Dh), dtype)
        lp["bk"] = jnp.zeros((L, Hkv * Dh), dtype)
        lp["bv"] = jnp.zeros((L, Hkv * Dh), dtype)
    if cfg.qk_norm:
        lp["q_norm"] = jnp.ones((L, Dh), dtype)
        lp["k_norm"] = jnp.ones((L, Dh), dtype)
    if cfg.post_norms:
        lp["ln_post_attn"] = jnp.ones((L, D), dtype)
        lp["ln_post_mlp"] = jnp.ones((L, D), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nrm(jax.random.fold_in(key, 99), (V, D))
    return params


# HF tensor-name -> (slot, needs_transpose) mapping for one layer
_LAYER_MAP = {
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
    "self_attn.q_norm.weight": ("q_norm", False),
    "self_attn.k_norm.weight": ("k_norm", False),
    "mlp.gate_proj.weight": ("w_gate", True),
    "mlp.up_proj.weight": ("w_up", True),
    "mlp.down_proj.weight": ("w_down", True),
    "input_layernorm.weight": ("ln_attn", False),
    "post_attention_layernorm.weight": ("ln_mlp", False),
    # gemma3 extra norms: HF's post_attention_layernorm is applied to the attn
    # output (our ln_post_attn) and pre/post_feedforward to the MLP
    "pre_feedforward_layernorm.weight": ("ln_mlp_pre", False),
    "post_feedforward_layernorm.weight": ("ln_post_mlp", False),
}


def load_hf_params(cfg: ModelConfig, ckpt_dir: str, dtype=jnp.bfloat16) -> Params:
    """Convert a HuggingFace safetensors checkpoint directory to our pytree.

    Supports the reference model zoo families (llama/qwen2/qwen3/gemma3 text).
    """
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(ckpt_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {ckpt_dir}")

    raw: Dict[str, np.ndarray] = {}
    wanted_prefixes = ("model.", "lm_head.", "language_model.")
    for path in files:
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                if name.startswith(wanted_prefixes):
                    raw[name.replace("language_model.", "")] = f.get_tensor(name)

    def get(name):
        t = raw[name]
        if t.dtype == np.uint16:  # bfloat16 stored raw
            t = t.view(np.uint16)
            t = jnp.asarray(t).view(jnp.bfloat16)
        return jnp.asarray(t)

    L = cfg.num_layers
    layer_stacks: Dict[str, list] = {}
    for l in range(L):
        prefix = f"model.layers.{l}."
        for hf_suffix, (slot, transpose) in _LAYER_MAP.items():
            name = prefix + hf_suffix
            if name not in raw:
                continue
            t = get(name)
            if transpose:
                t = t.T
            layer_stacks.setdefault(slot, []).append(t)

    layers = {k: jnp.stack(v).astype(dtype) for k, v in layer_stacks.items()}
    # gemma3 naming: HF post_attention_layernorm is our ln_post_attn; HF
    # pre_feedforward_layernorm is the pre-MLP norm (our ln_mlp)
    if cfg.post_norms and "ln_mlp_pre" in layers:
        layers["ln_post_attn"] = layers.pop("ln_mlp")
        layers["ln_mlp"] = layers.pop("ln_mlp_pre")

    params: Params = {
        "embed": get("model.embed_tokens.weight").astype(dtype),
        "layers": layers,
        "final_norm": get("model.norm.weight").astype(dtype),
    }
    # some checkpoints (gemma3, small qwen3) omit lm_head when tied
    if not cfg.tie_word_embeddings and "lm_head.weight" in raw:
        params["lm_head"] = get("lm_head.weight").astype(dtype)
    return params


def init_params_w8a8(cfg: ModelConfig, key: jax.Array,
                     dtype=jnp.bfloat16) -> Params:
    """Random-init directly in W8A8 form, one weight stack at a time — a 7B
    bf16-init-then-quantize would transiently need ~21 GB and not fit one
    v5e chip; stack-wise the peak overhead is a single bf16 stack."""
    from kvzip_tpu.ops.quant import quantize_weight_int8

    D, H, Hkv, Dh = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                     cfg.head_dim)
    L, I, V = cfg.num_layers, cfg.intermediate_size, cfg.vocab_size

    shapes = {
        "wq": (L, D, H * Dh), "wk": (L, D, Hkv * Dh), "wv": (L, D, Hkv * Dh),
        "wo": (L, H * Dh, D), "w_gate": (L, D, I), "w_up": (L, D, I),
        "w_down": (L, I, D),
    }
    lp = {}
    for i, name in enumerate(shapes):
        lp[name] = jax.jit(
            lambda k, s=shapes[name]: quantize_weight_int8(
                (jax.random.normal(k, s, jnp.float32) * 0.02).astype(dtype))
        )(jax.random.fold_in(key, i))
        jax.block_until_ready(lp[name]["q"])
    lp["ln_attn"] = jnp.ones((L, D), dtype)
    lp["ln_mlp"] = jnp.ones((L, D), dtype)
    if cfg.attention_bias:
        lp["bq"] = jnp.zeros((L, H * Dh), dtype)
        lp["bk"] = jnp.zeros((L, Hkv * Dh), dtype)
        lp["bv"] = jnp.zeros((L, Hkv * Dh), dtype)
    if cfg.qk_norm:
        lp["q_norm"] = jnp.ones((L, Dh), dtype)
        lp["k_norm"] = jnp.ones((L, Dh), dtype)
    if cfg.post_norms:
        lp["ln_post_attn"] = jnp.ones((L, D), dtype)
        lp["ln_post_mlp"] = jnp.ones((L, D), dtype)

    params: Params = {
        "embed": (jax.random.normal(jax.random.fold_in(key, 98), (V, D),
                                    jnp.float32) * 0.02).astype(dtype),
        "layers": lp,
        "final_norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (jax.random.normal(
            jax.random.fold_in(key, 99), (V, D), jnp.float32) * 0.02
        ).astype(dtype)
    return params


def param_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
