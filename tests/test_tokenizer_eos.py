"""Real-tokenizer eos semantics (VERDICT r1 weak #9).

The air-gapped default is the ByteTokenizer (eos 257); these tests fabricate
an actual HF *fast* tokenizer on disk (tokenizers lib is bundled with
transformers) with llama-style special tokens, load it through the normal
``load_tokenizer`` path, and verify the engine wires real eos ids into the
decode loop and that the loop stops on them.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.config import tiny_config
from kvzip_tpu.engine import Engine
from kvzip_tpu.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def hf_tok_dir(tmp_path_factory):
    """Write a minimal WordLevel fast tokenizer with llama-style specials."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers

    d = tmp_path_factory.mktemp("tok")
    words = ["the", "quick", "brown", "fox", "passcode", "is", "7194",
             "what", "context", "answer", "question", "secret", "."]
    vocab = {w: i for i, w in enumerate(words)}
    vocab["<unk>"] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    # llama-3-style specials appended at the end of the vocab
    tok.add_special_tokens(["<|begin_of_text|>", "<|end_of_text|>",
                            "<|start_header_id|>", "<|end_header_id|>",
                            "<|eot_id|>"])
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<|begin_of_text|>",
        "eos_token": "<|eot_id|>",
        "model_max_length": 8192,
    }))
    return str(d)


def test_load_real_tokenizer_and_eos_ids(hf_tok_dir):
    tok = load_tokenizer(hf_tok_dir)
    # must be the HF tokenizer, not the byte fallback
    assert tok.__class__.__name__ != "ByteTokenizer"
    eot = tok.convert_tokens_to_ids("<|eot_id|>")
    assert tok.eos_token_id == eot

    cfg = tiny_config("llama", vocab_size=64)
    eng = Engine("llama-tiny-real-tok", kv_type="retain", config=cfg,
                 dtype=jnp.float32, tokenizer=tok, max_new_tokens=4,
                 decode_budget=128, capacity_granularity=128,
                 score_chunk_size=128)
    # the template table adds llama family ids; the tokenizer's own eos
    # must be present regardless
    assert eot in eng.eos_ids

    ids = eng.encode("the quick brown fox")
    assert ids.dtype == np.int32 and len(ids) == 4
    assert eng.decode(ids).replace(" ", "") == "thequickbrownfox"


def test_decode_loop_stops_on_real_eos(hf_tok_dir):
    tok = load_tokenizer(hf_tok_dir)
    cfg = tiny_config("llama", vocab_size=64)
    eng = Engine("llama-tiny-real-tok", kv_type="retain", config=cfg,
                 dtype=jnp.float32, tokenizer=tok, max_new_tokens=6,
                 decode_budget=128, capacity_granularity=128,
                 score_chunk_size=128)
    st = eng.prefill("the quick brown fox passcode is 7194 .",
                     prefill_chunk_size=64)

    eot = int(tok.eos_token_id)
    run = eng._decode_loop(5, st.cache.capacity, "dense")
    tokens, n, done, cache = run(eng.params, st.cache, jnp.int32(eot))
    # first generated token IS eos: the loop must stop before decoding more
    assert bool(jax.device_get(done))
    assert int(jax.device_get(n)) == 0
    st.cache = cache
    st.restore_snapshot()
