"""CLI smoke tests: eval sweep writes result JSONs; parse aggregates them."""

import json
import os

import pytest

from kvzip_tpu import cli


def test_eval_and_parse(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    cli.main(["eval", "-m", "tiny-llama", "-d", "gsm", "--num", "1",
              "--dtype", "float32"])
    out_file = tmp_path / "results" / "gsm" / "0_tiny-llama" / "output-pair.json"
    assert out_file.exists()
    with open(out_file) as f:
        data = json.load(f)
    assert "qa" in data and len(data["qa"]) == 9  # ratios 0.9..0.1

    capsys.readouterr()
    cli.main(["parse", "-m", "tiny-llama", "-d", "gsm"])
    printed = capsys.readouterr().out
    assert "ratio avg_performance" in printed
    assert "0.10" in printed and "1.00" in printed


def test_demo_runs(monkeypatch, capsys):
    # shrink the demo context via a temp file
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("Tiny demo context. The maximum number of tokens per cache "
                "page is 256, and quantized layers support 2 to 8 bits. "
                + "filler " * 200)
        path = f.name
    cli.main(["demo", "--model", "tiny-llama", "--context_file", path,
              "-m", "kvzip"])
    out = capsys.readouterr().out
    assert "After Compression" in out or "Ground-truth" in out
    os.unlink(path)
