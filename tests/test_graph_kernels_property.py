"""Property tests for the round-4 integer kernels: the walk-hash and
the exact hi/lo summation must match straightforward unbounded-Python
reference implementations on adversarial inputs (huge ids, wrap
boundaries) — these two underpin the kg_walks oracle parity and every
distributed overflow guard."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from information_extraction_t5_ray.stages.balance import LCG_INC, LCG_MULT
from information_extraction_t5_ray.stages.graph import (
    _WALK_MOD,
    WALK_K1,
    WALK_K2,
    _exact_sum_nonneg,
    _walk_hash,
)


def _walk_hash_ref(u: int, step: int, v: int) -> int:
    """Unbounded-int mirror of the SQL oracle's expression."""
    raw = (u * WALK_K1 + step * WALK_K2 + v) % _WALK_MOD
    return (raw * LCG_MULT + LCG_INC) % _WALK_MOD


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=0, max_value=2**40),
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=64),
)
def test_walk_hash_matches_unbounded_reference(pairs, step):
    u = np.array([p[0] for p in pairs], dtype=np.int64)
    v = np.array([p[1] for p in pairs], dtype=np.int64)
    got = _walk_hash(u, step, v)
    assert got.dtype == np.int64
    for i, (uu, vv) in enumerate(pairs):
        assert int(got[i]) == _walk_hash_ref(uu, step, vv), (uu, step, vv)
    assert (got >= 0).all() and (got < _WALK_MOD).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**63 - 1),
        min_size=0,
        max_size=64,
    )
)
def test_exact_sum_nonneg_matches_python_sum(values):
    """The hi/lo split must equal the unbounded Python total even when
    the int64 running sum would wrap (values near 2^63)."""
    v = np.array(values, dtype=np.int64)
    assert _exact_sum_nonneg(v) == sum(values)


def test_exact_sum_detects_would_be_wrap():
    """Two near-max values: the naive int64 sum wraps negative, the
    hi/lo total stays exact — the property the distributed overflow
    guards rely on."""
    big = 2**62 + 12345
    v = np.array([big, big, 17], dtype=np.int64)
    assert _exact_sum_nonneg(v) == 2 * big + 17
    with np.errstate(over="ignore"):
        naive = v.sum()  # wraps
    assert int(naive) != 2 * big + 17
