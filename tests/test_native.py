"""Native C++ runtime vs numpy fallback and the device voxelizer."""

import numpy as np
import pytest

from mrcc_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_lib():
    # fallback paths are tested regardless; the native assertions only run
    # when the library was built (make -C runtime)
    yield


def _sample_cloud(rng, n=2000):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    feats = rng.normal(size=(n, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    return pts, feats, labels


class TestNativeVoxelize:
    def test_matches_fallback(self, rng):
        pts, feats, labels = _sample_cloud(rng)
        got = native.voxelize_host(pts, feats, 0.05, 4096, labels=labels)
        # force the numpy fallback for comparison
        lib = native._LIB
        native._LIB = False
        try:
            want = native.voxelize_host(pts, feats, 0.05, 4096, labels=labels)
        finally:
            native._LIB = lib

        assert got[4] == want[4]  # same voxel count
        # same voxel SET with same mean feats / labels (order may differ)
        def table(res):
            coords, f, lab, _, nv = res
            return {tuple(coords[i]): (f[i], None if lab is None else lab[i])
                    for i in range(nv)}

        tg, tw = table(got), table(want)
        assert set(tg) == set(tw)
        for k in tg:
            np.testing.assert_allclose(tg[k][0], tw[k][0], atol=1e-4)
            assert tg[k][1] == tw[k][1]

    def test_matches_device_voxelizer(self, rng):
        import jax.numpy as jnp

        from mrcc_tpu.sparse import voxelize

        pts, feats, labels = _sample_cloud(rng, n=800)
        coords_h, feats_h, labels_h, _, nv = native.voxelize_host(
            pts, feats, 0.05, 2048, labels=labels)
        vox, _, vlab = voxelize(pts[None], feats[None],
                                np.ones((1, 800), bool), 0.05, 2048,
                                labels=labels[None].astype(np.int32))
        nd = int(vox.count[0])
        assert nv == nd
        dev = {tuple(np.asarray(vox.coords()[0][i])):
               (np.asarray(vox.feats[0][i]), int(np.asarray(vlab[0][i])))
               for i in range(nd)}
        for i in range(nv):
            k = tuple(coords_h[i])
            assert k in dev
            np.testing.assert_allclose(feats_h[i], dev[k][0], atol=1e-4)
            assert labels_h[i] == dev[k][1]

    def test_point_to_voxel(self, rng):
        pts, feats, _ = _sample_cloud(rng, n=500)
        coords, _, _, pv, nv = native.voxelize_host(pts, feats, 0.05, 2048)
        want = np.floor(pts / 0.05).astype(np.int32)
        for i in range(500):
            assert (coords[pv[i]] == want[i]).all()


class TestNativeFpsBallQuery:
    def test_fps_matches_numpy(self, rng):
        from mrcc_tpu.data.labels import farthest_point_sample_idx

        pts = rng.normal(size=(300, 3)).astype(np.float32)
        got = native.fps_host(pts, 16, start_idx=0)
        # numpy oracle with the same deterministic start
        n = len(pts)
        dist = np.full(n, 1e10)
        far = 0
        want = []
        for _ in range(16):
            want.append(far)
            d = ((pts - pts[far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
        if native.available():
            np.testing.assert_array_equal(got, want)
        assert len(np.unique(got)) == 16

    def test_ball_query_semantics(self, rng):
        pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        queries = pts[:5]
        idx = native.ball_query_host(pts, queries, 0.4, 8)
        d2 = ((queries[:, None] - pts[None]) ** 2).sum(-1)
        for q in range(5):
            within = np.where(d2[q] < 0.16)[0][:8]
            np.testing.assert_array_equal(idx[q][:len(within)], within)
