"""Sparse voxel core vs pure-numpy oracles.

The oracles implement voxelization and sparse convolution the slow, obvious
way (python dicts over coordinates), independent of the JAX implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.sparse import (
    SparseVoxels,
    build_hierarchy,
    slice_to_points,
    voxelize,
)
from mrcc_tpu.sparse import conv as C
from mrcc_tpu.sparse.hierarchy import K3_OFFSETS


# ---------------------------------------------------------------- oracles

def oracle_voxelize(points, feats, qsize, labels=None, ignore=-100):
    """Dict-based quantization: returns {coord: (mean_feat, label)} plus
    per-point voxel coordinate."""
    coords = np.floor(points / qsize).astype(np.int64)
    vox = {}
    for i, c in enumerate(map(tuple, coords)):
        vox.setdefault(c, []).append(i)
    out = {}
    for c, idx in vox.items():
        f = feats[idx].mean(axis=0)
        lab = None
        if labels is not None:
            ls = set(labels[idx].tolist())
            lab = labels[idx][0] if len(ls) == 1 else ignore
        out[c] = (f, lab)
    return out, coords


def oracle_sparse_conv_k3(vox_feats, vox_coords, w):
    """Brute-force k=3 s=1 sparse conv. vox_feats {coord: feat}, w [27,Ci,Co]."""
    table = {tuple(c): f for c, f in zip(vox_coords, vox_feats)}
    out = {}
    for c in map(tuple, vox_coords):
        acc = np.zeros(w.shape[-1])
        for k, d in enumerate(K3_OFFSETS):
            nb = (c[0] + d[0], c[1] + d[1], c[2] + d[2])
            if nb in table:
                acc = acc + table[nb] @ w[k]
        out[c] = acc
    return out


def make_cloud(rng, p=500, spread=0.5):
    pts = rng.normal(size=(p, 3)) * spread
    feats = rng.normal(size=(p, 4))
    return pts.astype(np.float32), feats.astype(np.float32)


# ----------------------------------------------------------------- tests

class TestVoxelize:
    def test_matches_oracle(self, rng):
        pts, feats = make_cloud(rng)
        qsize = 0.05
        vox, pv, _ = voxelize(pts[None], feats[None], np.ones((1, 500), bool),
                              qsize, capacity=512)
        oracle, pt_coords = oracle_voxelize(pts, feats, qsize)

        n_valid = int(vox.count[0])
        assert n_valid == len(oracle)
        got_coords = np.asarray(vox.coords()[0][:n_valid])
        got_feats = np.asarray(vox.feats[0][:n_valid])
        for c, f in zip(map(tuple, got_coords), got_feats):
            assert c in oracle
            np.testing.assert_allclose(f, oracle[c][0], atol=1e-5)

    def test_labels_merge(self, rng):
        # two points in the same voxel with conflicting labels -> ignore
        pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],
                        [0.3, 0.3, 0.3]], np.float32)
        feats = np.ones((3, 1), np.float32)
        labels = np.array([1, 2, 1], np.int32)
        vox, pv, lab = voxelize(pts[None], feats[None], np.ones((1, 3), bool),
                                0.05, capacity=8, labels=labels[None])
        lab = np.asarray(lab[0])
        n = int(vox.count[0])
        assert n == 2
        got = sorted(lab[:n].tolist())
        assert got == [-100, 1]

    def test_point_to_voxel_slice(self, rng):
        pts, feats = make_cloud(rng, p=300)
        vox, pv, _ = voxelize(pts[None], feats[None], np.ones((1, 300), bool),
                              0.05, capacity=512)
        # voxel values = row index; slicing back must route each point to the
        # voxel holding its own coordinates
        vals = np.arange(512, dtype=np.float32)[:, None]
        sliced = slice_to_points(jnp.asarray(vals)[None], pv)
        rows = np.asarray(sliced[0, :, 0]).astype(np.int64)
        keys = np.asarray(vox.key[0]).astype(np.int64)
        got = keys[rows]
        want_coords = np.floor(pts / 0.05).astype(np.int64) + 512
        want = (want_coords[:, 0] << 20) | (want_coords[:, 1] << 10) | want_coords[:, 2]
        np.testing.assert_array_equal(got, want)

    def test_padding_and_masking(self, rng):
        pts, feats = make_cloud(rng, p=200)
        mask = np.ones((1, 200), bool)
        mask[0, 150:] = False  # masked points must not create voxels
        vox, _, _ = voxelize(pts[None], feats[None], mask, 0.05, capacity=512)
        oracle, _ = oracle_voxelize(pts[:150], feats[:150], 0.05)
        assert int(vox.count[0]) == len(oracle)
        # padding rows are zeroed and keys sorted ascending
        key = np.asarray(vox.key[0])
        assert (np.diff(key.astype(np.int64)) >= 0).all()
        np.testing.assert_array_equal(
            np.asarray(vox.feats[0])[~np.asarray(vox.valid[0])], 0.0
        )

    def test_batched_independent(self, rng):
        pts1, feats1 = make_cloud(rng, p=100)
        pts2, feats2 = make_cloud(rng, p=100)
        both_p = np.stack([pts1, pts2])
        both_f = np.stack([feats1, feats2])
        vox, _, _ = voxelize(both_p, both_f, np.ones((2, 100), bool), 0.05,
                             capacity=256)
        solo1, _, _ = voxelize(pts1[None], feats1[None], np.ones((1, 100), bool),
                               0.05, capacity=256)
        np.testing.assert_array_equal(np.asarray(vox.key[0]), np.asarray(solo1.key[0]))
        np.testing.assert_allclose(np.asarray(vox.feats[0]),
                                   np.asarray(solo1.feats[0]), atol=1e-6)


class TestHierarchy:
    def test_downsample_coords(self, rng):
        pts, feats = make_cloud(rng, p=400)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 400), bool),
                             0.05, capacity=512)
        levels = build_hierarchy(vox, depth=2, build_k3=False)
        c0 = np.asarray(levels[0].off[0][np.asarray(levels[0].valid[0])])
        c1 = np.asarray(levels[1].off[0][np.asarray(levels[1].valid[0])])
        want = np.unique(c0 >> 1, axis=0)
        got = np.asarray(sorted(map(tuple, c1)))
        np.testing.assert_array_equal(got, np.asarray(sorted(map(tuple, want))))

    def test_parent_links(self, rng):
        pts, feats = make_cloud(rng, p=400)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 400), bool),
                             0.05, capacity=512)
        levels = build_hierarchy(vox, depth=1, build_k3=False)
        l0, l1 = levels
        v0 = np.asarray(l0.valid[0])
        pidx = np.asarray(l0.parent_idx[0])[v0]
        child_off = np.asarray(l0.off[0])[v0]
        parent_off = np.asarray(l1.off[0])[pidx]
        np.testing.assert_array_equal(child_off >> 1, parent_off)
        # octant encodes child position within parent
        octant = np.asarray(l0.octant[0])[v0]
        want = ((child_off[:, 0] & 1) << 2) | ((child_off[:, 1] & 1) << 1) | (
            child_off[:, 2] & 1
        )
        np.testing.assert_array_equal(octant, want)

    def test_child_table_inverse(self, rng):
        pts, feats = make_cloud(rng, p=400)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 400), bool),
                             0.05, capacity=512)
        l0, l1 = build_hierarchy(vox, depth=1, build_k3=False)
        # every valid child must appear exactly once in the child table
        cidx = np.asarray(l1.child_idx[:, 0])  # [8, N1]
        chit = np.asarray(l1.child_hit[:, 0])
        listed = sorted(cidx[chit].tolist())
        want = sorted(np.where(np.asarray(l0.valid[0]))[0].tolist())
        assert listed == want

    def test_neighbor_table(self, rng):
        pts, feats = make_cloud(rng, p=200)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 200), bool),
                             0.05, capacity=256)
        (l0,) = build_hierarchy(vox, depth=0)
        v = np.asarray(l0.valid[0])
        off = np.asarray(l0.off[0])
        table = {tuple(c): i for i, c in enumerate(off[v])}
        nbr_idx = np.asarray(l0.nbr_idx[:, 0])
        nbr_hit = np.asarray(l0.nbr_hit[:, 0])
        valid_rows = np.where(v)[0]
        for k, d in enumerate(K3_OFFSETS):
            for i in valid_rows:
                want = table.get(tuple(off[i] + d))
                if want is None:
                    assert not nbr_hit[k, i]
                else:
                    assert nbr_hit[k, i]
                    assert tuple(off[nbr_idx[k, i]]) == tuple(off[valid_rows[want]])


class TestConv:
    def test_conv_k3_matches_oracle(self, rng):
        pts, feats = make_cloud(rng, p=300)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 300), bool),
                             0.05, capacity=512)
        (l0,) = build_hierarchy(vox, depth=0)
        w = rng.normal(size=(27, 4, 6)).astype(np.float32)
        out = C.conv_k3(vox.feats, jnp.asarray(w), l0)

        v = np.asarray(l0.valid[0])
        coords = np.asarray(vox.coords()[0])[v]
        in_feats = np.asarray(vox.feats[0])[v]
        oracle = oracle_sparse_conv_k3(in_feats, coords, w)
        got = np.asarray(out[0])[v]
        for c, g in zip(map(tuple, coords), got):
            np.testing.assert_allclose(g, oracle[c], atol=1e-4)

    def test_conv_down_matches_oracle(self, rng):
        pts, feats = make_cloud(rng, p=300)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 300), bool),
                             0.05, capacity=512)
        l0, l1 = build_hierarchy(vox, depth=1, build_k3=False)
        w = rng.normal(size=(8, 4, 5)).astype(np.float32)
        out = C.conv_down(vox.feats, jnp.asarray(w), l0, l1)

        v0 = np.asarray(l0.valid[0])
        v1 = np.asarray(l1.valid[0])
        child = {tuple(c): f for c, f in
                 zip(np.asarray(l0.off[0])[v0], np.asarray(vox.feats[0])[v0])}
        got = np.asarray(out[0])
        for j in np.where(v1)[0]:
            po = np.asarray(l1.off[0])[j]
            acc = np.zeros(5)
            for k, d in enumerate(
                [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
            ):
                c = (po[0] * 2 + d[0], po[1] * 2 + d[1], po[2] * 2 + d[2])
                if c in child:
                    acc = acc + child[c] @ w[k]
            np.testing.assert_allclose(got[j], acc, atol=1e-4)

    def test_transpose_inverts_structure(self, rng):
        # with identity-ish weights, transpose conv must broadcast each
        # parent's feature to exactly its children, selected by octant
        pts, feats = make_cloud(rng, p=300)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 300), bool),
                             0.05, capacity=512)
        l0, l1 = build_hierarchy(vox, depth=1, build_k3=False)
        n1 = l1.valid.shape[1]
        parent_feats = jnp.asarray(rng.normal(size=(1, n1, 4)).astype(np.float32))
        parent_feats = parent_feats * l1.valid[..., None]
        w = np.stack([np.eye(4, dtype=np.float32) * (k + 1) for k in range(8)])
        out = C.conv_transpose_up(parent_feats, jnp.asarray(w), l1, l0)
        v0 = np.asarray(l0.valid[0])
        got = np.asarray(out[0])
        pidx = np.asarray(l0.parent_idx[0])
        octant = np.asarray(l0.octant[0])
        pf = np.asarray(parent_feats[0])
        for i in np.where(v0)[0]:
            np.testing.assert_allclose(got[i], pf[pidx[i]] * (octant[i] + 1),
                                       atol=1e-5)

    def test_max_pool_down(self, rng):
        pts, feats = make_cloud(rng, p=300)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 300), bool),
                             0.05, capacity=512)
        l0, l1 = build_hierarchy(vox, depth=1, build_k3=False)
        out = C.max_pool_down(vox.feats, l0, l1)
        v0 = np.asarray(l0.valid[0])
        v1 = np.asarray(l1.valid[0])
        f0 = np.asarray(vox.feats[0])
        groups = {}
        for i in np.where(v0)[0]:
            groups.setdefault(tuple(np.asarray(l0.off[0])[i] >> 1), []).append(f0[i])
        got = np.asarray(out[0])
        for j in np.where(v1)[0]:
            want = np.max(groups[tuple(np.asarray(l1.off[0])[j])], axis=0)
            np.testing.assert_allclose(got[j], want, atol=1e-5)

    def test_global_pools(self, rng):
        feats = rng.normal(size=(2, 16, 3)).astype(np.float32)
        valid = np.zeros((2, 16), bool)
        valid[0, :5] = True
        valid[1, :9] = True
        feats = feats * valid[..., None]
        gm = np.asarray(C.global_max_pool(jnp.asarray(feats), jnp.asarray(valid)))
        ga = np.asarray(C.global_avg_pool(jnp.asarray(feats), jnp.asarray(valid)))
        np.testing.assert_allclose(gm[0], feats[0, :5].max(0), atol=1e-6)
        np.testing.assert_allclose(ga[1], feats[1, :9].mean(0), atol=1e-6)

    def test_conv_jit_and_grad(self, rng):
        pts, feats = make_cloud(rng, p=200)
        vox, _, _ = voxelize(pts[None], feats[None], np.ones((1, 200), bool),
                             0.05, capacity=256)
        (l0,) = build_hierarchy(vox, depth=0)
        w = jnp.asarray(rng.normal(size=(27, 4, 4)).astype(np.float32))

        @jax.jit
        def loss(w, f):
            return (C.conv_k3(f, w, l0) ** 2).sum()

        g = jax.grad(loss)(w, vox.feats)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_child_tables_scatter_matches_searchsorted(rng):
    """r5: build_hierarchy's k=2 child maps are now built by scatter
    through the downsample sort (no rank lookups) — must equal the
    searchsorted oracle (_child_table_one) exactly."""
    import jax

    from mrcc_tpu.sparse import build_hierarchy, voxelize
    from mrcc_tpu.sparse.hierarchy import K2_OFFSETS, _child_table_one
    from functools import partial

    pts = jnp.asarray(rng.normal(size=(2, 1500, 3)).astype(np.float32))
    rgb = jnp.asarray(rng.random((2, 1500, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 1500)) < 0.9)
    vox, _, _ = voxelize(pts, rgb, mask, 1 / 30.0, 1024)
    levels = build_hierarchy(vox, 2, capacities=(512, 256))

    for lf, lc in ((levels[0], levels[1]), (levels[1], levels[2])):
        idx_o, hit_o = jax.vmap(
            partial(_child_table_one, offsets=K2_OFFSETS, stride=2),
            in_axes=(0, 0, 0), out_axes=(1, 1),
        )(lc.off, lc.valid, lf.key)
        np.testing.assert_array_equal(np.asarray(lc.child_hit),
                                      np.asarray(hit_o))
        # idx compared where hit (misses carry arbitrary-but-masked rows)
        hit = np.asarray(hit_o)
        np.testing.assert_array_equal(
            np.asarray(lc.child_idx)[hit], np.asarray(idx_o)[hit])
