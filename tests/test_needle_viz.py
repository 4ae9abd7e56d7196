"""NIAH heatmap: score collection from result JSONs + PNG render."""

import json
import os

import numpy as np

from kvzip_tpu.eval.needle_viz import DEPTHS, collect_scores, plot_heatmap


def _write_result(root, idx, model, pred):
    d = os.path.join(root, "needle", f"{idx}_{model}")
    os.makedirs(d, exist_ok=True)
    payload = {"qa": [[[0.3, 0.3, 0.1],
                       {"pruned": pred, "full__": pred,
                        "answer": "Eat a sandwich and sit in Dolores Park "
                                  "on a sunny day."}]]}
    with open(os.path.join(d, "output-pair.json"), "w") as f:
        json.dump(payload, f)


def test_collect_and_plot(tmp_path):
    root = str(tmp_path)
    # one full length-row of 11 depths: alternate hit / miss
    for i in range(len(DEPTHS)):
        pred = ("eat a sandwich and sit in dolores park on a sunny day"
                if i % 2 == 0 else "no idea")
        _write_result(root, i, "tiny-llama", pred)

    grid = collect_scores(root, "tiny-llama", ratio=0.3)
    assert grid.shape[1] == len(DEPTHS)
    np.testing.assert_allclose(grid[0], [1, 0] * 5 + [1])

    out = plot_heatmap(grid, str(tmp_path / "hm.png"), lengths=[500])
    assert os.path.getsize(out) > 5000
