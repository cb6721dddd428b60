"""Offline analysis suite (mrcc_tpu.viz) — substance-checked outputs."""

import json
import os

import numpy as np

from mrcc_tpu.viz import confidence_plots, embedding_export, error_histograms


def _results():
    rng = np.random.default_rng(0)
    res = {}
    for pos in ("p1", "p2"):
        for i in range(10):
            res[f"{pos}/{i}.pickle"] = {
                "dist_position": float(rng.uniform(0, 0.05)),
                "dist_orientation": float(rng.uniform(0, 0.5)),
                "angle_diff": float(rng.uniform(0, 0.4)),
                "dist": float(rng.uniform(0, 0.1)),
                "confidence": float(rng.uniform(0, 1)),
                "position_confidence": float(rng.uniform(0, 1)),
                "orientation_confidence": float(rng.uniform(0, 1)),
            }
    splits = {"test": [
        {"filepath": f"/x/{i}.pickle", "position": pos,
         "arm_point_count": int(rng.integers(500, 60000))}
        for pos in ("p1", "p2") for i in range(10)]}
    return res, splits


def test_error_histograms(tmp_path):
    res, splits = _results()
    out = tmp_path / "err.png"
    curves = error_histograms(res, splits, str(out))
    assert out.exists() and out.stat().st_size > 1000
    assert set(curves) == {"dist_position", "dist_orientation", "angle_diff"}
    assert all(len(v) == 9 for v in curves.values())
    # binned means must be finite and bounded by the raw value range
    assert max(curves["dist_position"]) <= 0.05 + 1e-9


def test_error_histograms_from_files(tmp_path):
    res, splits = _results()
    rp, sp = tmp_path / "r.json", tmp_path / "s.json"
    rp.write_text(json.dumps(res))
    sp.write_text(json.dumps(splits))
    curves = error_histograms(str(rp), str(sp), str(tmp_path / "e.png"))
    assert curves


def test_confidence_plots(tmp_path):
    res, _ = _results()
    out = tmp_path / "conf.png"
    series = confidence_plots(res, str(out))
    assert out.exists()
    assert ("confidence", "dist") in series
    xs, ys = series[("confidence", "dist")]
    assert len(xs) == 20 and len(ys) == 20


def test_embedding_export(tmp_path):
    emb = np.random.default_rng(1).normal(size=(12, 16)).astype(np.float32)
    labels = [f"cls{i % 3}" for i in range(12)]
    vec, meta = embedding_export(emb, labels, str(tmp_path / "proj"))
    back = np.loadtxt(vec, delimiter="\t")
    np.testing.assert_allclose(back, emb, rtol=1e-4, atol=1e-5)
    lines = open(meta).read().strip().split("\n")
    assert lines[0] == "Index\tLabel" and len(lines) == 13
