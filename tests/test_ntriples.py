"""N-Triples sink/source (stages/triples.py write_ntriples /
read_ntriples): escape-roundtrip on adversarial literals, shard
manifest shape, and malformed-line failure.  Full-pipeline oracle
parity runs as the kg_nt_roundtrip row in tests/test_oracle.py."""

import json
import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.stages.triples import (
    _nt_escape,
    _nt_unescape,
    read_ntriples,
    write_ntriples,
)

NASTY = [
    'plain value',
    'back\\slash',
    'quote " inside',
    'newline\nsplit',
    'tab\there',
    'carriage\rreturn',
    '\\n literal backslash-n',      # must NOT decode to a newline
    '\\\\ two backslashes',
    'mixed \\ " \n \t \r end\\',
    '',
]


def test_escape_unescape_roundtrip_scalar():
    s = pd.Series(NASTY)
    esc = _nt_escape(s)
    # escaped form is single-line and quote-safe
    assert not esc.str.contains("\n").any()
    assert not esc.str.contains("\r").any()
    assert not esc.str.contains("\t").any()
    assert (_nt_unescape(esc) == s).all()


def test_write_read_roundtrip_preserves_nasty_literals(
    ray_session, tmp_path
):
    import ray.data as rd

    table = pa.table(
        {
            "subj": pa.array(
                [f"https://example.org/{i:08d}" for i in range(len(NASTY))]
            ),
            "pred": pa.array(["form.field"] * len(NASTY)),
            "obj": pa.array(NASTY),
        }
    )
    out = str(tmp_path / "nt")
    write_ntriples(rd.from_arrow(table), out)

    manifest = json.loads((tmp_path / "nt" / "_MANIFEST.json").read_text())
    assert manifest["total_rows"] == len(NASTY)
    assert sum(manifest["shards"].values()) == len(NASTY)
    for name in manifest["shards"]:
        assert (tmp_path / "nt" / name).exists()

    back = (
        read_ntriples(out)
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    assert back["obj"].tolist() == NASTY
    assert (back["pred"] == "form.field").all()


def test_read_ntriples_rejects_malformed(ray_session, tmp_path):
    (tmp_path / "bad.nt").write_text("<a> <b> no-literal .\n")
    with pytest.raises(Exception, match="malformed|ValueError"):
        read_ntriples(str(tmp_path)).materialize()


def test_read_ntriples_missing_dir(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_ntriples(str(tmp_path / "nope"))


def test_write_ntriples_rerun_removes_stale_shards(ray_session, tmp_path):
    import ray.data as rd

    def tbl(objs):
        return pa.table(
            {
                "subj": pa.array(
                    [f"https://example.org/{i:08d}" for i in range(len(objs))]
                ),
                "pred": pa.array(["form.f"] * len(objs)),
                "obj": pa.array(objs),
            }
        )

    out = str(tmp_path / "nt")
    write_ntriples(rd.from_arrow(tbl(["a", "b", "c"])), out)
    # second run over DIFFERENT content: previous shards must not leak
    # into the read
    write_ntriples(rd.from_arrow(tbl(["x", "y"])), out)
    back = read_ntriples(out).to_pandas()
    assert sorted(back["obj"]) == ["x", "y"]

    manifest = json.loads((tmp_path / "nt" / "_MANIFEST.json").read_text())
    assert manifest["total_rows"] == 2


def test_read_ntriples_invalid_escape(ray_session, tmp_path):
    (tmp_path / "bad.nt").write_text(
        '<https://a> <https://p> "oops\\z" .\n'
    )
    with pytest.raises(Exception, match="invalid escape"):
        read_ntriples(str(tmp_path)).materialize()


def test_write_ntriples_duplicate_blocks_keep_multiplicity(
    ray_session, tmp_path
):
    import ray.data as rd

    t = pa.table(
        {
            "subj": pa.array(["https://example.org/00000001"]),
            "pred": pa.array(["form.f"]),
            "obj": pa.array(["v"]),
        }
    )
    # two byte-identical blocks: both rows must survive the round trip
    ds = rd.from_arrow(t).union(rd.from_arrow(t))
    out = str(tmp_path / "nt")
    write_ntriples(ds, out)
    manifest = json.loads((tmp_path / "nt" / "_MANIFEST.json").read_text())
    assert manifest["total_rows"] == 2
    assert sum(manifest["shards"].values()) == 2
    back = read_ntriples(out).to_pandas()
    assert len(back) == 2


def test_read_ntriples_dangling_escape(ray_session, tmp_path):
    # literal ending in an ODD backslash run: the escape introducer has
    # no following char — must fail loudly, not pass through
    (tmp_path / "bad.nt").write_text('<https://a> <https://p> "abc\\" .\n')
    with pytest.raises(Exception, match="dangling escape"):
        read_ntriples(str(tmp_path)).materialize()
