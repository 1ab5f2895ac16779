"""Property-based checks (hypothesis) for the newest low-level
primitives — pure-Python kernels, no Ray needed:

* N-Triples escape/unescape is a lossless bijection on arbitrary text,
  and escaped output is always single-line.
* ``group_starts`` + boundary gathers reproduce pandas
  ``groupby().agg(size/min/max)`` on random multi-column string frames
  (the exact contract the sort-boundary folds rely on), including
  separator-adversarial values.
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.stages.common import (
    group_starts,
    reduceat_sum,
)
from information_extraction_t5_ray.stages.triples import (
    _nt_escape,
    _nt_unescape,
)

# text including the escape-relevant characters and the bucket separator
_nasty_text = st.text(
    alphabet=st.sampled_from(list('ab\\"\n\r\t\x1f .<>')), max_size=24
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_nasty_text, max_size=16))
def test_nt_escape_roundtrip_property(values):
    s = pd.Series(values, dtype=object)
    esc = _nt_escape(s)
    if len(s):
        assert not esc.str.contains("\n").any()
        assert not esc.str.contains("\r").any()
        # every '"' in the escaped form is preceded by a backslash run
        # of odd length (i.e. it is escaped) — the literal stays parseable
        for v in esc:
            i = v.find('"')
            while i != -1:
                j = i - 1
                while j >= 0 and v[j] == "\\":
                    j -= 1
                assert (i - 1 - j) % 2 == 1, v
                i = v.find('"', i + 1)
    back = _nt_unescape(esc)
    assert list(back) == list(s)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(_nasty_text, _nasty_text, st.integers(0, 1000)),
        min_size=0,
        max_size=40,
    )
)
def test_group_starts_matches_pandas_groupby(rows):
    df = pd.DataFrame(rows, columns=["k1", "k2", "v"])
    d = df.sort_values(["k1", "k2", "v"], kind="stable").reset_index(
        drop=True
    )
    k1 = d["k1"].to_numpy()
    k2 = d["k2"].to_numpy()
    starts, ends = group_starts(k1, k2)
    got = pd.DataFrame(
        {
            "k1": k1[starts],
            "k2": k2[starts],
            "n": (ends - starts).astype(np.int64),
            "vsum": reduceat_sum(d["v"].to_numpy(np.int64), starts),
            "vmin": d["v"].to_numpy()[starts],
            "vmax": d["v"].to_numpy()[ends - 1],
        }
    )
    want = (
        df.groupby(["k1", "k2"], sort=True)
        .agg(
            n=("v", "size"),
            vsum=("v", "sum"),
            vmin=("v", "min"),
            vmax=("v", "max"),
        )
        .reset_index()
    )
    assert len(got) == len(want)
    if len(want):
        for c in ("k1", "k2", "n", "vsum", "vmin", "vmax"):
            assert list(got[c]) == list(want[c]), c
