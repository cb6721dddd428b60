"""Oracle tests: windowed-rank kernel vs the searchsorted hierarchy tables.

Interpreter mode on CPU; compiles via Mosaic on the chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrcc_tpu.ops.rank_pallas import child_tables, neighbor_tables
from mrcc_tpu.sparse.hierarchy import (
    K2_OFFSETS,
    K3_OFFSETS,
    _child_table_one,
    _neighbor_table_one,
)
from mrcc_tpu.sparse.impl import sparse_impl
from mrcc_tpu.sparse.types import KEY_PAD, pack_key

# slow tier: interpret-mode rank-kernel oracles — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


def random_voxels(rng, b, n, n_valid=None, extent=24):
    """Sorted unique voxel keys per item with padding."""
    off = np.zeros((b, n, 3), np.int32)
    key = np.full((b, n), int(KEY_PAD), np.int32)
    valid = np.zeros((b, n), bool)
    for bi in range(b):
        nv = n_valid or rng.integers(n // 2, n + 1)
        coords = rng.integers(500, 500 + extent, size=(4 * n, 3))
        uniq = np.unique(coords[:, 0] * (1 << 20) + coords[:, 1] * (1 << 10)
                         + coords[:, 2])
        ks = np.sort(uniq)[:nv]
        nv = len(ks)
        key[bi, :nv] = ks
        off[bi, :nv] = np.stack([(ks >> 20) & 1023, (ks >> 10) & 1023,
                                 ks & 1023], axis=-1)
        valid[bi, :nv] = True
    return jnp.asarray(off), jnp.asarray(key), jnp.asarray(valid)


def oracle_neighbors(off, key, valid, offsets):
    return jax.vmap(
        lambda o, k, v: _neighbor_table_one(o, k, v, offsets),
        out_axes=(1, 1))(off, key, valid)


class TestNeighborTables:
    @pytest.mark.parametrize("n", [128, 256])
    def test_k3_oracle(self, rng, n):
        off, key, valid = random_voxels(rng, 2, n)
        want_idx, want_hit = oracle_neighbors(off, key, valid, K3_OFFSETS)
        got_idx, got_hit = neighbor_tables(off, key, valid, K3_OFFSETS)
        np.testing.assert_array_equal(np.asarray(got_hit),
                                      np.asarray(want_hit))
        # idx must agree wherever hit (misses may clamp differently)
        h = np.asarray(want_hit)
        np.testing.assert_array_equal(np.asarray(got_idx)[h],
                                      np.asarray(want_idx)[h])

    def test_k3_tiny_window_forces_chunks(self, rng):
        off, key, valid = random_voxels(rng, 1, 128, extent=60)
        want_idx, want_hit = oracle_neighbors(off, key, valid, K3_OFFSETS)
        got_idx, got_hit = neighbor_tables(off, key, valid, K3_OFFSETS,
                                           t=16, w=16)
        h = np.asarray(want_hit)
        np.testing.assert_array_equal(np.asarray(got_hit), h)
        np.testing.assert_array_equal(np.asarray(got_idx)[h],
                                      np.asarray(want_idx)[h])

    def test_k3_coordinate_borders(self, rng):
        # border voxels (coords at 0 and COORD_RANGE-1): the six-mask
        # qvalid build (_border_qvalid) must reject out-of-window queries
        # exactly like the oracle's per-query in_range check — an
        # arithmetic-key query across the border aliases a DIFFERENT
        # valid-looking coordinate (e.g. (x, 0, z) - dy lands on
        # (x-1, 1023, z)), so a wrong mask silently corrupts tables
        coords = rng.integers(0, 4, size=(600, 3))
        coords[100:200] += 1020             # cluster at the high corner
        coords[200:300, 0] = 0              # x == 0 plane
        coords[300:400, 1] = 1023           # y == max plane
        uniq = np.unique(coords[:, 0] * (1 << 20) + coords[:, 1] * (1 << 10)
                         + coords[:, 2])[:128]
        n = 128
        key = np.full((1, n), int(KEY_PAD), np.int32)
        key[0, :len(uniq)] = np.sort(uniq)
        valid = key < int(KEY_PAD)
        off = np.stack([(key >> 20) & 1023, (key >> 10) & 1023,
                        key & 1023], -1) * valid[..., None]
        off, key, valid = (jnp.asarray(off), jnp.asarray(key),
                           jnp.asarray(valid))
        want_idx, want_hit = oracle_neighbors(off, key, valid, K3_OFFSETS)
        got_idx, got_hit = neighbor_tables(off, key, valid, K3_OFFSETS)
        h = np.asarray(want_hit)
        np.testing.assert_array_equal(np.asarray(got_hit), h)
        np.testing.assert_array_equal(np.asarray(got_idx)[h],
                                      np.asarray(want_idx)[h])

    def test_full_occupancy(self, rng):
        off, key, valid = random_voxels(rng, 2, 128, n_valid=128)
        want_idx, want_hit = oracle_neighbors(off, key, valid, K3_OFFSETS)
        got_idx, got_hit = neighbor_tables(off, key, valid, K3_OFFSETS)
        h = np.asarray(want_hit)
        np.testing.assert_array_equal(np.asarray(got_hit), h)
        np.testing.assert_array_equal(np.asarray(got_idx)[h],
                                      np.asarray(want_idx)[h])


class TestChildTables:
    def test_k2_oracle(self, rng):
        # parents of a fine level: halve coordinates
        off, key, valid = random_voxels(rng, 2, 256)
        p_off = off // 2
        p_key = jnp.where(valid, pack_key(p_off), KEY_PAD)
        # unique-sort parents per item (tiny numpy oracle prep)
        po, pk, pv = [], [], []
        n_p = 128
        for bi in range(2):
            ks = np.unique(np.asarray(p_key[bi])[np.asarray(valid[bi])])
            ks = np.sort(ks)[:n_p]
            pad = np.full(n_p - len(ks), int(KEY_PAD), np.int32)
            kk = np.concatenate([ks, pad]).astype(np.int32)
            pk.append(kk)
            pv.append(kk < int(KEY_PAD))
            po.append(np.stack([(kk >> 20) & 1023, (kk >> 10) & 1023,
                                kk & 1023], -1) * (kk < int(KEY_PAD))[:, None])
        po = jnp.asarray(np.stack(po))
        pk = jnp.asarray(np.stack(pk))
        pv = jnp.asarray(np.stack(pv))

        want_idx, want_hit = jax.vmap(
            lambda o, v, ck: _child_table_one(o, v, ck, offsets=K2_OFFSETS),
            out_axes=(1, 1))(po, pv, key)
        got_idx, got_hit = child_tables(po, pk, pv, key, K2_OFFSETS)
        h = np.asarray(want_hit)
        np.testing.assert_array_equal(np.asarray(got_hit), h)
        np.testing.assert_array_equal(np.asarray(got_idx)[h],
                                      np.asarray(want_idx)[h])


class TestHierarchyIntegration:
    def test_build_hierarchy_pallas_parity(self, rng):
        """Full build_hierarchy under the pallas impl == xla impl."""
        from mrcc_tpu.sparse import build_hierarchy, voxelize

        pts = jnp.asarray(rng.normal(size=(2, 1024, 3)) * 0.3, jnp.float32)
        mask = jnp.asarray(rng.random((2, 1024)) < 0.9)
        vox, _, _ = voxelize(pts, pts, mask, 0.05, 512)
        caps = (256, 128, 128, 128)

        ref = build_hierarchy(vox, 4, capacities=caps)
        with sparse_impl("pallas"):
            got = build_hierarchy(vox, 4, capacities=caps)

        for lvl, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(np.asarray(a.key),
                                          np.asarray(b.key),
                                          err_msg=f"key L{lvl}")
            if a.nbr_idx is not None:
                h = np.asarray(a.nbr_hit)
                np.testing.assert_array_equal(np.asarray(b.nbr_hit), h,
                                              err_msg=f"nbr_hit L{lvl}")
                np.testing.assert_array_equal(
                    np.asarray(b.nbr_idx)[h], np.asarray(a.nbr_idx)[h],
                    err_msg=f"nbr_idx L{lvl}")
            if a.child_idx is not None:
                h = np.asarray(a.child_hit)
                np.testing.assert_array_equal(np.asarray(b.child_hit), h,
                                              err_msg=f"child_hit L{lvl}")
                np.testing.assert_array_equal(
                    np.asarray(b.child_idx)[h], np.asarray(a.child_idx)[h],
                    err_msg=f"child_idx L{lvl}")


def test_conv_channel_split_oracle(rng, monkeypatch):
    """Tables over the VMEM budget split into channel groups — exact."""
    from mrcc_tpu.ops import conv_pallas
    from mrcc_tpu.sparse.conv import conv_kernel_map

    monkeypatch.setattr(conv_pallas, "_TABLE_BUDGET", 64 * 1024)
    k, b, n, cin, cout = 8, 1, 128, 320, 64  # 128*320*4B >> 64KB -> split
    base = np.arange(n)
    idx = np.stack([np.sort(np.clip(base + rng.integers(-9, 9, n), 0, n - 1))
                    for _ in range(k)])[:, None].astype(np.int32)
    hit = rng.random((k, b, n)) < 0.8
    feats = jnp.asarray(rng.normal(size=(b, n, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin, cout)) / cin, jnp.float32)
    valid = jnp.ones((b, n), bool)
    want = np.asarray(conv_kernel_map(feats, w, jnp.asarray(idx),
                                      jnp.asarray(hit), valid))
    got = np.asarray(conv_pallas.gather_gemm_conv(
        feats, w, jnp.asarray(idx), jnp.asarray(hit), valid))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
