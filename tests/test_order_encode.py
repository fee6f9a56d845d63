"""_order_encode edge-case total order (advisor round-3 item 4).

Both backend paths are tested on CPU: `_order_encode_exact` (the real-f64
frexp path every non-TPU backend now takes) and `_order_encode_pair` (the
TPU double-float packing — its 32-bit bitcasts compile fine on CPU, so the
math is verifiable here even though only the TPU backend dispatches to it).

Reference total order (the one lax.sort over the keys must realize):
-inf < finite ascending < +inf < NaN, with -0.0 == +0.0 keying equal.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from cudf_tpu.engine.spmd import (_order_encode, _order_encode_exact,
                                  _order_encode_pair)

# strictly increasing reference ladder of f64 edge values
LADDER = [
    -math.inf,
    -1.7976931348623157e308,          # -f64 max
    -1e39,                            # < -f32 max
    -1.0 - 2 ** -52,                  # 1 ulp below -1
    -1.0,
    -2.2250738585072014e-308,         # -min normal
    -1e-310,                          # subnormal
    -5e-324,                          # -min subnormal
    0.0,                              # (+0.0 and -0.0 key equal; see below)
    5e-324,
    1e-310,
    2.2250738585072014e-308,
    1.0,
    1.0 + 2 ** -52,                   # 1 ulp above 1
    1e39,                             # > f32 max
    1.7976931348623157e308,
    math.inf,
    math.nan,                         # NaN strictly last
]

# the pair path's documented precision limits: |x| beyond f32 range
# saturates to the inf key, |x| below the f32 subnormal floor collapses
# toward the zero key, and 1-ulp f64 neighbours may collide (they
# still never INVERT).  Drop the affected rungs for its strict check;
# test_pair_never_inverts covers the full ladder non-strictly.
PAIR_LADDER = [
    v for v in LADDER
    if not (math.isfinite(v) and abs(v) > 3.4e38)
    and not (v != 0 and abs(v) < 1.2e-38)
    and v not in (-1.0 - 2 ** -52, 1.0 + 2 ** -52)
]


@pytest.mark.parametrize("descending", [False, True])
def test_pair_never_inverts(descending):
    keys = np.asarray(_order_encode_pair(
        jnp.asarray(LADDER, jnp.float64), descending))
    diffs = np.diff(keys)
    assert ((diffs <= 0) if descending else (diffs >= 0)).all(), keys


@pytest.mark.parametrize(
    "enc,ladder",
    [(_order_encode_exact, LADDER), (_order_encode_pair, PAIR_LADDER)],
    ids=["exact", "pair"],
)
@pytest.mark.parametrize("descending", [False, True])
def test_total_order(enc, ladder, descending):
    keys = np.asarray(enc(jnp.asarray(ladder, jnp.float64), descending))
    diffs = np.diff(keys)
    if descending:
        assert (diffs < 0).all(), keys
    else:
        assert (diffs > 0).all(), keys


@pytest.mark.parametrize("enc", [_order_encode_exact, _order_encode_pair],
                         ids=["exact", "pair"])
@pytest.mark.parametrize("descending", [False, True])
def test_signed_zero_ties(enc, descending):
    keys = np.asarray(enc(jnp.asarray([-0.0, 0.0], jnp.float64), descending))
    assert keys[0] == keys[1]


@pytest.mark.parametrize("enc", [_order_encode_exact, _order_encode_pair],
                         ids=["exact", "pair"])
def test_nan_below_padding_sentinel(enc):
    # _dist_sort_shard pads invalid rows with INT64_MAX; a NaN key must
    # stay strictly below it (advisor round-3 item 3)
    key = int(enc(jnp.asarray([math.nan], jnp.float64), False)[0])
    assert key < np.iinfo(np.int64).max


def test_exact_subnormal_keys_are_exact_bit_patterns():
    # the frexp reconstruction must equal the raw IEEE bit pattern
    # (positive values: key == int64 view of the f64 bits)
    vals = np.asarray([5e-324, 1e-310, 2.2250738585072014e-308, 1.5,
                       1e300], np.float64)
    expect = vals.view(np.int64)
    keys = np.asarray(_order_encode_exact(jnp.asarray(vals), False))
    np.testing.assert_array_equal(keys, expect)


def test_exact_subnormals_distinct():
    # the advisor-flagged dead branch: subnormals must NOT all key as 0
    vals = jnp.asarray([5e-324, 1e-323, 1e-310], jnp.float64)
    keys = np.asarray(_order_encode_exact(vals, False))
    assert len(set(keys.tolist())) == 3 and (keys > 0).all()


@pytest.mark.parametrize("descending", [False, True])
def test_dispatch_matches_cpu_path(descending):
    # on this CPU test backend, _order_encode must take the exact path
    x = jnp.asarray([1.5, -2.5, math.nan], jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(_order_encode(x, descending)),
        np.asarray(_order_encode_exact(x, descending)))


@pytest.mark.parametrize("enc", [_order_encode_exact, _order_encode_pair],
                         ids=["exact", "pair"])
@pytest.mark.parametrize("dtype", [jnp.int32, jnp.int64])
@pytest.mark.parametrize("descending", [False, True])
def test_integer_keys(enc, dtype, descending):
    info = jnp.iinfo(dtype)
    vals = jnp.asarray([info.min, -1, 0, 1, info.max], dtype)
    keys = np.asarray(enc(vals, descending))
    assert ((np.diff(keys) < 0) if descending else (np.diff(keys) > 0)).all()
