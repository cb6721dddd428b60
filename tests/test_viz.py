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


def test_html_viewer(tmp_path):
    from mrcc_tpu.viz import write_html_viewer

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    rgb = rng.random((500, 3)).astype(np.float32)
    seg = rng.integers(0, 3, 500)
    path = write_html_viewer(str(tmp_path / "v.html"), pts, rgb, seg)
    html = open(path).read()
    assert "webgl" in html and "drawArrays" in html
    # the embedded buffer decodes back to the points
    import base64
    b64 = html.split('atob("')[1].split('")')[0]
    back = np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 3)
    np.testing.assert_allclose(back, pts, rtol=1e-6)


def test_html_viewer_subsamples(tmp_path):
    from mrcc_tpu.viz import write_html_viewer

    pts = np.zeros((5000, 3), np.float32)
    path = write_html_viewer(str(tmp_path / "v.html"), pts, max_points=1000)
    html = open(path).read()
    import base64
    b64 = html.split('atob("')[1].split('")')[0]
    assert len(base64.b64decode(b64)) == 1000 * 12


class TestViewers:
    """Headless one-off viewers (reference visualization/viz_*.py)."""

    @staticmethod
    def _sample(seed=11):
        from mrcc_tpu.data.synthetic import generate_sample

        return generate_sample(seed=seed, n_ee=256, n_arm=256, n_bg=512)

    def test_viz_segmentation(self, tmp_path):
        from mrcc_tpu.viz.viewers import viz_segmentation

        s = self._sample()
        pred = np.asarray(s["labels"]).astype(int).copy()
        pred[:50] = 0
        out = tmp_path / "seg.png"
        viz_segmentation(s, str(out), pred_labels=pred)
        assert out.stat().st_size > 10000

    def test_viz_ee_bbox_crops_ee(self, tmp_path):
        from mrcc_tpu.viz.viewers import viz_ee_bbox

        s = self._sample()
        inside = viz_ee_bbox(s, str(tmp_path / "bbox.png"))
        labels = np.asarray(s["labels"])
        # the reference's hand-tuned box must contain most EE points
        ee = labels == 2
        assert (inside & ee).sum() / max(ee.sum(), 1) > 0.9
        assert (tmp_path / "bbox.png").exists()

    def test_viz_pcd_and_pickle(self, tmp_path):
        from mrcc_tpu.viz.viewers import viz_pcd, viz_pickle

        s = self._sample()
        viz_pcd(np.asarray(s["points"]), str(tmp_path / "pcd.png"))
        viz_pickle(s, str(tmp_path / "pk.png"),
                   keypoints=np.asarray(s["points"])[:6])
        assert (tmp_path / "pcd.png").exists()
        assert (tmp_path / "pk.png").exists()

    def test_viz_cross_section(self, tmp_path):
        from mrcc_tpu.viz.viewers import viz_cross_section

        viz_cross_section(self._sample(), str(tmp_path / "cs.png"))
        assert (tmp_path / "cs.png").exists()

    def test_viz_data_instances(self, tmp_path):
        from mrcc_tpu.viz.viewers import viz_data_instances

        viz_data_instances([self._sample(1), self._sample(2)],
                           str(tmp_path / "inst.png"))
        assert (tmp_path / "inst.png").exists()

    def test_viz_collection_positions_recovers_extrinsic(self, tmp_path):
        """Synthetic samples share ONE base2cam extrinsic: every derived
        cam2base pose must coincide (spread ~ 0)."""
        from mrcc_tpu.viz.viewers import viz_data_collection_positions

        samples = [self._sample(i) for i in range(4)]
        cams = viz_data_collection_positions(samples,
                                             str(tmp_path / "pos.png"))
        assert cams.shape == (4, 7)
        assert np.allclose(cams[:, :3].std(axis=0), 0, atol=1e-4)
        assert (tmp_path / "pos.png").exists()
