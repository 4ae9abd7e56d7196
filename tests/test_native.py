"""Native C++ metric kernels vs Python references."""

import numpy as np
import pytest

native = pytest.importorskip("kvzip_tpu.native")

try:
    native._build()
    HAVE_LIB = True
except Exception:
    HAVE_LIB = False

pytestmark = pytest.mark.skipif(not HAVE_LIB, reason="g++ build unavailable")


def py_lcs(a, b):
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(cur[j], prev[j + 1]))
        prev = cur
    return prev[-1]


def test_lcs_vs_python():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = [str(x) for x in rng.integers(0, 12, rng.integers(0, 30))]
        b = [str(x) for x in rng.integers(0, 12, rng.integers(0, 30))]
        assert native.lcs_length(a, b) == py_lcs(a, b)


def test_rouge_l_matches_python_impl():
    from kvzip_tpu.eval.metrics import rouge_l_f

    pred = "the quick brown fox jumps over the dog"
    ref = "quick brown foxes jump over the lazy dog"
    got = native.rouge_l_f(pred.split(), ref.split())
    # python impl routes through native when available; compute manually
    lcs = py_lcs(pred.split(), ref.split())
    p, r = lcs / len(pred.split()), lcs / len(ref.split())
    want = 2 * p * r / (p + r)
    assert got == pytest.approx(want)
    assert rouge_l_f(pred, ref) == pytest.approx(want)


def test_token_f1():
    got = native.token_f1(["a", "b", "c"], ["a", "c", "d"])
    assert got == pytest.approx(2 / 3)


def test_bleu_identical_and_disjoint():
    toks = "def foo ( x ) : return x + 1".split()
    assert native.sentence_bleu(toks, toks) == pytest.approx(1.0, abs=1e-6)
    other = "class Bar { void baz ( ) { } }".split()
    assert native.sentence_bleu(toks, other) < 0.1  # smoothing floor differs
                                                    # slightly from nltk


def test_bleu_close_to_nltk():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    ref = "def compute ( a , b ) : return a * b + a".split()
    cand = "def compute ( a , b ) : return a * b".split()
    want = sentence_bleu([ref], cand,
                         smoothing_function=SmoothingFunction().method4)
    got = native.sentence_bleu(ref, cand)
    assert got == pytest.approx(want, abs=0.05)
