"""Eval harness: datasets, metrics, evaluator, result IO, parse round-trip."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.config import tiny_config
from kvzip_tpu.data import DataWrapper, get_query, load_dataset_all
from kvzip_tpu.data.needle import NeedleHaystack
from kvzip_tpu.engine import Engine
from kvzip_tpu.eval import Evaluator
from kvzip_tpu.eval.metrics import (
    evaluate_answer, exact_match_score, f1_score, include_score,
    include_score_gsm, include_score_multi, normalize_answer, rouge_l_f)
from kvzip_tpu.tokenizer import ByteTokenizer
from kvzip_tpu.utils import save_result, set_gen_length


def test_normalize_answer():
    assert normalize_answer("The  Answer is: Seven!") == "answer is 7"


def test_metric_family():
    assert f1_score("the cat sat", "a cat sat") == 1.0  # articles normalized
    assert f1_score("cat sat here", "dog sat here", normalize=False) == pytest.approx(2 / 3)
    assert include_score("well the answer is paris.", "Paris") == 1.0
    assert include_score_multi("has a and c", "a, b, c", normalize=False) == pytest.approx(2 / 3)
    assert include_score_gsm("so we get 42", "work...\n#### 42", normalize=False) == 1.0
    assert exact_match_score("Seven", "seven") == 1.0
    assert rouge_l_f("a b c d", "a b x d") == pytest.approx(0.75)


def test_evaluate_answer_routing():
    s = evaluate_answer(["the answer is 12"], ["#### 12"], "gsm", "qa")
    assert s == [1.0]
    s = evaluate_answer(["value-123"], ["value-123"], "scbench_kv", "qa")
    assert s == [1.0]
    s = evaluate_answer([""], ["x"], "squad", "qa")
    assert s == [0.0]


def test_niah_generator():
    tok = ByteTokenizer()
    gen = NeedleHaystack(tok, context_lengths=[600])
    for depth in (0, 50, 100):
        rec = gen.generate_context_qa(600, depth)
        assert "Dolores Park" in rec["context"]
        assert len(tok.encode(rec["context"])) <= 620
        # needle position tracks depth
        pos = rec["context"].find("Dolores Park") / len(rec["context"])
        assert abs(pos - depth / 100) < 0.35


def test_datasets_offline():
    tok = ByteTokenizer()
    for name in ("squad", "gsm", "scbench_kv_tiny"):
        ds = load_dataset_all(name, tok, n_data=4)
        assert len(ds) >= 1
        rec = ds[0]
        assert rec["context"] and rec["question"] and rec["answers"]
        assert len(rec["question"]) == len(rec["answers"]) or "scbench" in name


def test_eval_pipeline_end_to_end(tmp_path):
    """Tiny model through the full eval sweep: prefill → answers → ratios →
    save → parse-able JSON (reference eval.py:29-46 semantics)."""
    cfg = tiny_config("llama")
    eng = Engine("tiny-llama", kv_type="retain", config=cfg, dtype=jnp.float32,
                 max_new_tokens=6, decode_budget=256, capacity_granularity=256,
                 score_chunk_size=256)
    ds = load_dataset_all("gsm", eng.tokenizer, n_data=2)
    ds = [dict(d, context=d["context"][:300]) for d in ds]
    wrapper = DataWrapper("gsm", ds, eng)

    state = wrapper.prefill_context(0)
    inputs, info = wrapper.generate_answer(0, state)
    # reason-task answers are tagged "qa"/"qa-i" (reference data/wrapper.py:63)
    assert "qa" in inputs["eval_task"]

    evaluator = Evaluator(eng, inputs, info)
    from collections import defaultdict

    outputs = defaultdict(list)
    for ratio in (0.8, 0.4):
        thres, true_ratio = eng.prune(state, ratio, "pair")
        results = evaluator(state, generate=True)
        for fmt, v in results.items():
            outputs[fmt].append([[ratio, true_ratio, thres], v])
        fwd = evaluator(state, generate=False)
        for v in fwd.values():
            assert "p_ans" in v and "idx_flip" in v

    out_file = save_result(outputs, "gsm", 0, eng.name, root=str(tmp_path))
    with open(out_file) as f:
        data = json.load(f)
    assert "qa" in data and len(data["qa"]) == 2


def test_set_gen_length():
    assert set_gen_length("needle") == 32
    assert set_gen_length("squad") == 256
    assert set_gen_length("gsm") == 512
    assert set_gen_length("scbench_kv") == 96
