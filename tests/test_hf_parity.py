"""Numerical parity vs HuggingFace Transformers (torch CPU).

Builds tiny random-init HF models (no network), saves safetensors, converts
via load_hf_params, and compares logits — validating RoPE conventions, norm
placement, GQA packing, and weight-layout conversion against the exact stack
the reference monkeypatches (`model/load.py`, `attention/attn.py`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kvzip_tpu.cache import init_cache  # noqa: E402
from kvzip_tpu.config import ModelConfig  # noqa: E402
from kvzip_tpu.models.params import load_hf_params  # noqa: E402
from kvzip_tpu.models.transformer import forward  # noqa: E402


def _build_hf(tmp_path, family: str):
    import transformers

    common = dict(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, torch_dtype="float32")
    if family == "llama":
        config = transformers.LlamaConfig(
            **common, head_dim=16, rope_theta=500000.0,
            rope_scaling={"rope_type": "llama3", "factor": 8.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 128},
            rms_norm_eps=1e-5, tie_word_embeddings=False)
        cls = transformers.LlamaForCausalLM
    elif family == "qwen2":
        config = transformers.Qwen2Config(
            **common, rope_theta=10000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=False)
        cls = transformers.Qwen2ForCausalLM
    elif family == "qwen3":
        config = transformers.Qwen3Config(
            **common, head_dim=16, rope_theta=1000000.0, rms_norm_eps=1e-6,
            tie_word_embeddings=False)
        cls = transformers.Qwen3ForCausalLM
    elif family == "gemma3":
        config = transformers.Gemma3TextConfig(
            **common, head_dim=16, rope_theta=1000000.0,
            rope_local_base_freq=10000.0, sliding_window=8,
            sliding_window_pattern=2, query_pre_attn_scalar=16,
            rms_norm_eps=1e-6)
        cls = transformers.Gemma3ForCausalLM
    else:
        raise ValueError(family)

    torch.manual_seed(0)
    model = cls(config)
    model.eval()
    out_dir = tmp_path / f"hf-{family}"
    model.save_pretrained(out_dir, safe_serialization=True)
    return model, str(out_dir)


@pytest.mark.parametrize("family", ["llama", "qwen2", "qwen3", "gemma3"])
def test_logits_match_hf(tmp_path, family):
    hf_model, ckpt = _build_hf(tmp_path, family)

    cfg = ModelConfig.from_json(f"{ckpt}/config.json", name=f"tiny-{family}")
    assert cfg.family == family
    params = load_hf_params(cfg, ckpt, dtype=jnp.float32)

    ids = np.array([3, 17, 92, 45, 8, 120, 7, 33, 99, 250], np.int32)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids[None].astype(np.int64))
                             ).logits[0].numpy()

    cache = init_cache(cfg, 64, jnp.float32)
    res = forward(params, cfg, jnp.asarray(ids), cache, collect_logits="all")
    ours = np.asarray(res.logits)

    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    # argmax chain identical (greedy decoding parity)
    np.testing.assert_array_equal(ours.argmax(-1), hf_logits.argmax(-1))


def test_decode_matches_hf_generate(tmp_path):
    """Greedy continuation parity including incremental decode."""
    hf_model, ckpt = _build_hf(tmp_path, "llama")
    cfg = ModelConfig.from_json(f"{ckpt}/config.json", name="tiny-llama")
    params = load_hf_params(cfg, ckpt, dtype=jnp.float32)

    prompt = np.array([5, 9, 14, 77], np.int32)
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor(prompt[None].astype(np.int64)), max_new_tokens=8,
            do_sample=False, pad_token_id=0)
    hf_tokens = hf_out[0, len(prompt):].numpy()

    cache = init_cache(cfg, 64, jnp.float32)
    res = forward(params, cfg, jnp.asarray(prompt), cache,
                  collect_logits="last")
    cache = res.cache
    ours = []
    tok = int(np.asarray(res.logits)[-1].argmax())
    for _ in range(8):
        ours.append(tok)
        res = forward(params, cfg, jnp.asarray([tok], jnp.int32), cache,
                      collect_logits="last")
        cache = res.cache
        tok = int(np.asarray(res.logits)[-1].argmax())

    np.testing.assert_array_equal(np.asarray(ours), hf_tokens)
