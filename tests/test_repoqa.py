"""RepoQA scorer: lexer-grade comment stripping on a fixture corpus of the
cases a naive regex mis-handles (reference strips with tree-sitter,
`results/repo_qa_utils.py:105-153` — these fixtures encode the same
comment-node semantics), plus a pass@1 smoke test."""

from kvzip_tpu.eval.repoqa import (compute_function_similarity,
                                   compute_pass_at_1, remove_comments,
                                   sanitize_output)


def test_python_hash_inside_string_survives():
    src = 'def f():\n    c = "color: #fff"  # strip me\n    return c\n'
    out = remove_comments(src, "python")
    assert "#fff" in out
    assert "strip me" not in out


def test_python_docstrings_survive():
    # tree-sitter keeps docstrings (string nodes, not comment nodes)
    src = 'def f():\n    """Docs with # hash."""\n    return 1  # comment\n'
    out = remove_comments(src, "python")
    assert 'Docs with # hash.' in out
    assert "comment" not in out.split('"""')[-1]


def test_python_truncated_code_does_not_crash():
    src = "def f(:\n    # broken\n    x = ("
    out = remove_comments(src, "python")
    assert "broken" not in out


def test_c_like_url_in_string_survives():
    src = ('String u = "https://example.com/x"; // real comment\n'
           'int y = 1; /* block\n comment */ int z = 2;\n')
    out = remove_comments(src, "java")
    assert "https://example.com/x" in out
    assert "real comment" not in out
    assert "block" not in out
    assert "int z = 2;" in out


def test_c_like_comment_chars_inside_strings():
    src = 'let s = "/* not a comment */ // nope";\nlet t = 1; // yes\n'
    out = remove_comments(src, "typescript")
    assert "/* not a comment */ // nope" in out
    assert "yes" not in out


def test_go_backtick_raw_string_survives():
    src = 'q := `SELECT // keep\n/* keep */`\nx := 1 // drop\n'
    out = remove_comments(src, "go")
    assert "SELECT // keep" in out
    assert "/* keep */" in out
    assert "drop" not in out


def test_rust_escaped_quote():
    src = 'let s = "a \\" // still string";\nlet t = 2; // gone\n'
    out = remove_comments(src, "rust")
    assert 'still string' in out
    assert "gone" not in out


def test_sanitize_and_pass_at_1():
    needle = "def target(a, b):\n    return a + b\n"
    other = "def other(x):\n    return x * 2\n"
    pred = f"Here is the function:\n```python\n{needle}```\n"
    results = [{"prediction": pred, "repo": "r", "func_name": "target",
                "lang": "python"}]
    needles = {"r": [{"name": "target", "needle": needle},
                     {"name": "other", "needle": other}]}
    assert compute_pass_at_1(results, needles, ignore_comments=True) == 1.0
    assert compute_pass_at_1(results, needles, ignore_comments=False) == 1.0

    # wrong function retrieved -> 0
    results[0]["func_name"] = "other"
    assert compute_pass_at_1(results, needles) == 0.0

    assert sanitize_output("text ```py\ncode\n``` tail") == "code\n"
    sim = compute_function_similarity(needle, needle)
    assert sim > 0.99
