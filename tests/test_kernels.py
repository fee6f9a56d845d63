"""Pallas kernel validation in interpreter mode vs jnp reference
(the TPU analogue of compute-sanitizer runs, SURVEY.md §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cudf_tpu.kernels.hash_aggregate import (
    onehot_groupby_aggregate,
    reference_groupby_aggregate,
)


@pytest.mark.parametrize("n,K", [(1000, 7), (5000, 100), (4096, 128), (10000, 500)])
def test_onehot_aggregate_matches_reference(rng, n, K):
    keys = jnp.asarray(rng.integers(0, K, n).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=n).astype(np.float32))
    s, c, mn, mx = onehot_groupby_aggregate(keys, vals, K, interpret=True)
    rs, rc, rmn, rmx = reference_groupby_aggregate(keys, vals, K)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(rc))
    np.testing.assert_allclose(np.asarray(mn), np.asarray(rmn))
    np.testing.assert_allclose(np.asarray(mx), np.asarray(rmx))


def test_onehot_aggregate_masked(rng):
    n, K = 3000, 50
    keys = jnp.asarray(rng.integers(0, K, n).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=n).astype(np.float32))
    valid = jnp.asarray(rng.random(n) > 0.3)
    s, c, _, _ = onehot_groupby_aggregate(keys, vals, K, valid=valid, interpret=True)
    rs, rc, _, _ = reference_groupby_aggregate(keys, vals, K, valid=valid)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(rc))


def test_onehot_aggregate_oob_keys(rng):
    n, K = 1000, 10
    keys = jnp.asarray(rng.integers(-5, K + 5, n).astype(np.int32))
    vals = jnp.asarray(np.ones(n, np.float32))
    s, c, _, _ = onehot_groupby_aggregate(keys, vals, K, interpret=True)
    in_range = ((np.asarray(keys) >= 0) & (np.asarray(keys) < K)).sum()
    assert int(np.asarray(c).sum()) == int(in_range)
