"""Pallas NN-search kernel vs jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mrcc_tpu.ops.nn_pallas import nn_search_pallas

# slow tier: interpret-mode kernel smoke — run with --full or scripts/test_on_tpu.py
pytestmark = pytest.mark.slow


class TestNNSearchPallas:
    def test_matches_oracle(self, rng):
        m, n = 256, 512
        tpl = rng.normal(size=(m, 3)).astype(np.float32)
        tgt = rng.normal(size=(n, 3)).astype(np.float32)
        mask = np.ones(n, bool)
        mask[100:150] = False
        idx, d2 = nn_search_pallas(jnp.asarray(tpl), jnp.asarray(tgt),
                                   jnp.asarray(mask), tile_m=128,
                                   interpret=True)
        dd = ((tpl[:, None, :] - tgt[None]) ** 2).sum(-1)
        dd[:, ~mask] = 1e30
        want = dd.argmin(axis=1)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_allclose(np.asarray(d2), dd.min(axis=1),
                                   rtol=1e-4, atol=1e-4)

    def test_all_invalid(self, rng):
        tpl = rng.normal(size=(128, 3)).astype(np.float32)
        tgt = rng.normal(size=(128, 3)).astype(np.float32)
        idx, d2 = nn_search_pallas(jnp.asarray(tpl), jnp.asarray(tgt),
                                   jnp.zeros(128, bool), tile_m=128,
                                   interpret=True)
        assert np.isfinite(np.asarray(d2)).all()
        assert (np.asarray(d2) > 1e29).all()  # rejected by any ICP threshold
