"""Bitonic argsort kernel vs jnp stable argsort (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mrcc_tpu.ops.sort_pallas import bitonic_argsort, supported
from mrcc_tpu.sparse.types import KEY_PAD

# slow tier: interpret-mode kernel oracles — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


def _oracle(key):
    order = np.argsort(key, axis=-1, kind="stable")
    return np.take_along_axis(key, order, axis=-1), order


def _check(key):
    skey, perm = bitonic_argsort(jnp.asarray(key))
    want_key, want_perm = _oracle(key)
    np.testing.assert_array_equal(np.asarray(skey), want_key)
    np.testing.assert_array_equal(np.asarray(perm), want_perm)


class TestBitonicArgsort:
    def test_unique_keys(self, rng):
        key = rng.permutation(np.arange(512, dtype=np.int32))[None].repeat(
            3, axis=0)
        key = np.stack([rng.permutation(k) for k in key])
        _check(key)

    def test_duplicates_stable(self, rng):
        # voxelize-like: many points share a voxel key
        key = rng.integers(0, 37, size=(2, 384)).astype(np.int32)
        _check(key)

    def test_padding_sentinels(self, rng):
        key = rng.integers(0, 1 << 29, size=(2, 300)).astype(np.int32)
        key[0, 250:] = int(KEY_PAD)
        key[1, ::7] = int(KEY_PAD)
        _check(key)  # also exercises non-pow2 N (300 -> 512)

    def test_sorted_and_reverse(self):
        up = np.arange(256, dtype=np.int32)[None]
        _check(up)
        _check(up[:, ::-1].copy())

    def test_multirow_vmem_layout(self, rng):
        # N > 128 forces sublane-axis (axis-0) rolls
        key = rng.integers(0, 1 << 30, size=(1, 1024)).astype(np.int32)
        _check(key)

    def test_supported_gate(self):
        assert supported(128) and supported(16384) and supported(131072)
        assert not supported(1 << 18)
