"""Stage 6: triple projection, canonicalization and graph materialize.

answers (variant rows) -> (subj, pred, obj) edges:

* project the ``clean`` / ``member_clean`` rows (the reference's
  DISJOINT set — the per-leaf canonical answers), drop N/A objects,
  rewrite ``form.endereco~cidade*`` -> ``form.endereco.cidade``;
* link objects (stages/link.py) and canonicalize on
  ``normalize_answer`` keys (north-star stage 4);
* canonical-entity aggregation is a SALTED two-phase groupby: per-batch
  partial counts keyed ``(obj_key, salt)`` -> bucket groupby -> final
  merge, so head entities (e.g. the deliberately skewed 'SSP') never
  land on one reducer;
* final edges sort on ``(subj, pred)`` and write partitioned Parquet
  (``partition_id = hash(url) % P``) with per-partition lineage
  manifests (state/manifest.py).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import bucket_of
from ..functions.grammar import find_sub_answers
from ..functions.textnorm import normalize_answer

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_surface", pa.string()),
        ("prob", pa.float64()),
        ("window_id", pa.int32()),
        ("partition_id", pa.int32()),
    ]
)


def _first_list_elements(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """``lst[0] if lst else 0`` per row, via the list array's raw offsets
    (no per-row Python)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = np.asarray(col.offsets)
    values = np.asarray(col.values) if len(col.values) else np.zeros(1, np.int64)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    safe = np.minimum(starts, len(values) - 1)
    return np.where(nonempty, values[safe], 0)


def project_triples_batch(batch: pa.Table, num_partitions: int = 64) -> pa.Table:
    """answers -> raw triples (obj not yet linked/canonicalized).

    Fully vectorized — this map runs on the full answers stream (the
    flagship's hottest stage).  The object value is the LAST sub-answer
    of the prediction grammar (``find_sub_answers(...)[-1]``); for the
    clean/member-clean variants that is the text after the final ``]``,
    extracted with one RE2 kernel.  Rows where that tail is blank but
    earlier grammar runs exist (can't happen for well-formed variants,
    but the scalar spec handles it) fall back to ``find_sub_answers``.
    """
    mask = pc.is_in(batch["variant"], value_set=pa.array(["clean", "member_clean"]))
    rows = batch.filter(mask)

    preds_col = rows["prediction"]
    # tail after the last ']' (greedy .* eats to the final bracket); a
    # bracketless string passes through whole — same run the scalar
    # regex yields last.  (?s) so '.' crosses embedded newlines: RE2 '.'
    # stops at \n by default, which would leave '[a]: x\n[b]: y' as
    # 'x\n[b] y' instead of the scalar grammar's 'y'
    tail = pc.replace_substring_regex(preds_col, r"(?s)^.*\]", "")
    value = pc.utf8_trim_whitespace(pc.replace_substring(tail, ":", ""))
    # fallback rows: blank tail but non-blank prediction with earlier runs
    blank = pc.equal(value, "")
    nonblank_pred = pc.invert(pc.equal(pc.utf8_trim_whitespace(preds_col), ""))
    needs_scalar = pc.and_(blank, nonblank_pred)
    if pc.any(needs_scalar).as_py():
        vals = value.to_pylist()
        flags = needs_scalar.to_pylist()
        for i, (p, f) in enumerate(zip(preds_col.to_pylist(), flags)):
            if f:
                vs = find_sub_answers(p) if p else []
                vals[i] = vs[-1] if vs else ""
        value = pa.array(vals, pa.string())

    # 'form.cpf*' -> 'form.cpf'; 'form.endereco~cidade*' -> 'form.endereco.cidade'
    rel = pc.replace_substring(
        pc.replace_substring_regex(rows["example_id"], r"\*+$", ""), "~", "."
    )

    # crc32 over the (few) distinct urls of the batch, scattered back
    urls = rows["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    enc = urls.dictionary_encode()
    dict_parts = np.fromiter(
        (zlib.crc32(u.encode()) % num_partitions for u in enc.dictionary.to_pylist()),
        np.int32,
        count=len(enc.dictionary),
    )
    parts = dict_parts[np.asarray(enc.indices)]

    wids = _first_list_elements(rows["window_ids"]).astype(np.int32)

    out = pa.table(
        {
            "subj": rows["url"],
            "pred": rel,
            "obj_surface": value,
            "prob": rows["prob"],
            "window_id": pa.array(wids, pa.int32()),
            "partition_id": pa.array(parts, pa.int32()),
        }
    )
    keep = pc.and_(
        pc.invert(pc.equal(out["obj_surface"], "")),
        pc.invert(pc.equal(out["obj_surface"], "N/A")),
    )
    return out.filter(keep)


def project_stage(answers_ds, num_partitions: int = 64, batch_size: int | None = None):
    kw = {"batch_size": batch_size} if batch_size else {}
    return answers_ds.map_batches(
        lambda b: project_triples_batch(b, num_partitions),
        batch_format="pyarrow",
        **kw,
    )


def canonicalize_obj_stage(linked_ds, batch_size: int | None = None):
    """obj = normalize_answer(linked surface) — the canonical entity key."""

    def canon(batch: pa.Table) -> pa.Table:
        memo: dict = {}  # small value vocabularies -> memoize per batch

        def norm(v):
            out = memo.get(v)
            if out is None:
                out = normalize_answer(v)
                memo[v] = out
            return out

        objs = [norm(v) for v in batch["obj_linked"].to_pylist()]
        batch = batch.append_column("obj", pa.array(objs, pa.string()))
        return batch.select(
            ["subj", "pred", "obj", "obj_surface", "prob", "window_id", "partition_id"]
        )

    kw = {"batch_size": batch_size} if batch_size else {}
    return linked_ds.map_batches(canon, batch_format="pyarrow", **kw)


# ---------------------------------------------------------------------------
# salted canonical-entity aggregation
# ---------------------------------------------------------------------------


def entities_stage(
    triples_ds, num_salts: int = 16, num_buckets: int | None = None,
    batch_size: int = 16384
):
    """Canonical entity table (entity_id, n_mentions, example_surface)
    via salted THREE-phase aggregation.

    Phase 1 (map_batches, vectorized): partial counts per
    ``(obj, salt)`` where ``salt = hash(subj) % num_salts`` — a head
    entity's rows split across salts.
    Phase 2: bucket groupby keyed on ``(obj, salt)`` — this is where the
    salt earns its keep: a head entity's partial rows (one per batch per
    salt) spread over up to ``num_salts`` reducers instead of one.
    Phase 3: bucket groupby on ``obj`` alone merges the (at most
    ``num_salts``) per-salt rows per entity — a tiny final exchange.
    """
    from .common import arrowed, resolve_parallelism

    num_buckets = resolve_parallelism(num_buckets)

    def _fold(df, keys, n_col):
        """Sort-boundary grouped fold: summed ``n_col`` (row counts when
        None) and MIN ``example_surface`` per distinct ``keys`` tuple —
        pandas' grouped string min was the dominant cost of all three
        phases (kg_entities 3.17 s -> 0.58 s at sf0.1/32); the
        surface sorts last, so the group minimum sits at each boundary.
        ``df`` must carry ONLY ``keys`` + example_surface (+ n_col):
        sort_values reorders every column it is given.
        """
        from .common import group_starts, reduceat_sum

        d = df.sort_values(keys + ["example_surface"], kind="stable")
        cols = [d[k].to_numpy() for k in keys]
        starts, ends = group_starts(*cols)
        if n_col is None:
            n = (ends - starts).astype(np.int64)
        else:
            n = reduceat_sum(d[n_col].to_numpy(np.int64), starts)
        out = {k: c[starts] for k, c in zip(keys, cols)}
        out["n_mentions"] = n
        out["example_surface"] = d["example_surface"].to_numpy()[starts]
        return pd.DataFrame(out)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # crc32 over the distinct subjects only (urls repeat ~#qa_ids
        # times per batch), scattered back through factorize codes
        codes, uniques = pd.factorize(df["subj"], sort=False)
        salts = np.fromiter(
            (zlib.crc32(u.encode()) % num_salts for u in uniques),
            np.int32,
            count=len(uniques),
        )
        # min surface, not first: arrival order varies across shuffles;
        # slim to the 3 live columns before the fold's sort
        slim = pd.DataFrame(
            {
                "obj": df["obj"],
                "salt": salts[codes],
                "example_surface": df["obj_surface"],
            }
        )
        g = _fold(slim, ["obj", "salt"], None)
        # bucket on (obj, salt) so a hot entity's partials spread
        g["bucket"] = bucket_of(
            g["obj"].astype(str) + "\x1f" + g["salt"].astype(str),
            num_buckets,
        )
        return g

    def merge_salted(bucket_df: pd.DataFrame) -> pd.DataFrame:
        out = _fold(
            bucket_df[["obj", "salt", "n_mentions", "example_surface"]],
            ["obj", "salt"],
            "n_mentions",
        )
        out["bucket2"] = bucket_of(out["obj"], num_buckets)
        return out

    def final(bucket_df: pd.DataFrame) -> pd.DataFrame:
        out = _fold(
            bucket_df[["obj", "n_mentions", "example_surface"]],
            ["obj"],
            "n_mentions",
        )
        return out.rename(columns={"obj": "entity_id"})

    partials = triples_ds.map_batches(
        arrowed(partial), batch_format="pandas", batch_size=batch_size
    )
    salted = partials.groupby("bucket").map_groups(
        arrowed(merge_salted), batch_format="pandas"
    )
    return salted.groupby("bucket2").map_groups(
        arrowed(final), batch_format="pandas"
    )


def write_triples(
    triples_ds,
    out_dir: str,
    sort: bool = True,
    min_rows_per_file: int = 100_000,
):
    """Sorted, partitioned Parquet materialize (north rule) + lineage
    manifest per partition.

    ``min_rows_per_file`` coalesces output files — without it each sort
    output block becomes its own file (measured: 320k docs -> 4096 x
    ~30 KiB files), and small-file explosion is the classic sink failure
    at crawl scale (object-store listing and read-amplification costs).
    """
    ds = triples_ds.sort(["subj", "pred"]) if sort else triples_ds
    ds.write_parquet(
        out_dir,
        partition_cols=["partition_id"],
        min_rows_per_file=min_rows_per_file,
    )
    _write_partition_manifest(out_dir)
    return out_dir


def _write_partition_manifest(out_dir: str, partitioned: bool = True) -> None:
    """Per-partition lineage manifest for the sink (north rule): one
    ``_MANIFEST.json`` at the root with file lists + row counts per
    partition directory, built from Parquet FOOTERS only (no data
    read).  The leading underscore keeps pyarrow dataset discovery
    (ignore_prefixes ``['.', '_']``) from treating it as data, so
    ``read_parquet(out_dir)`` round-trips untouched.  The layout is the
    CALLER's declaration (``partitioned=False`` for flat sinks like the
    property-graph tables) — inferring it from glob emptiness would
    misdescribe a partitioned-but-empty sink as flat."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    parts = {}
    if partitioned:
        pdirs = sorted(glob.glob(os.path.join(out_dir, "partition_id=*")))
    else:
        pdirs = [out_dir]
    for pdir in pdirs:
        files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        name = "." if pdir == out_dir else os.path.basename(pdir)
        parts[name] = {
            "files": [os.path.basename(f) for f in files],
            "rows": rows,
        }
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(
            {
                "partitions": parts,
                "total_rows": sum(p["rows"] for p in parts.values()),
            },
            f,
            indent=1,
        )


def merge_triples(old_ds, new_ds, num_buckets=None):
    """Incremental KG maintenance: fuse a base triple set with a
    (partial) re-extraction, LATEST-WINS per ``(subj, pred)``.

    Both inputs must carry ``(subj, pred, obj, src_ts)`` where
    ``src_ts`` is the extraction snapshot (int64, larger = newer); the
    output keeps, per (subj, pred), the row with the greatest
    ``src_ts`` (ties: lexicographic-min obj — deterministic under any
    partitioning).

    Two-phase argmax (the latest_snapshot pattern on a composite key):
    per-batch head-1 per key, keys bucketed by hash, one pandas
    groupby per bucket — one candidate row per (batch, key) on the
    wire, never the unioned triple streams.
    """
    from .common import arrowed, resolve_parallelism

    num_buckets = resolve_parallelism(num_buckets)
    cols = ["subj", "pred", "obj", "src_ts"]

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["subj", "pred", "src_ts", "obj"],
            ascending=[True, True, False, True],
            kind="stable",
        )
        return df.groupby(["subj", "pred"], sort=False).head(1)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(cols).to_pandas()
        top = best(df).copy()
        top["_bucket"] = bucket_of(
            top["subj"].astype(str) + "\x1f" + top["pred"].astype(str),
            num_buckets,
        )
        return top

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return best(df)[cols]

    return (
        old_ds.union(new_ds)
        .map_batches(arrowed(partial), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(merge), batch_format="pandas")
    )


def diff_triples(old_ds, new_ds, num_buckets=None):
    """KG delta after an extractor upgrade / re-extraction:
    ``(subj, pred, obj, change)`` with ``change`` = 'added' (in new,
    not old) or 'removed' (in old, not new).  Unchanged triples emit
    nothing — the output is the review/alerting stream, bounded by the
    churn, not the KG size.

    ONE exchange: both sides tag a side marker and bucket on the full
    (subj, pred, obj) key hash; per bucket a single vectorized pandas
    groupby counts each distinct triple's side presence (per-batch
    drop_duplicates keeps the wire at one row per (batch, triple,
    side)).  Deterministic under any partitioning.
    """
    from .common import arrowed, resolve_parallelism

    num_buckets = resolve_parallelism(num_buckets)
    cols = ["subj", "pred", "obj"]

    def tag(side: int):
        def add(batch: pa.Table) -> pd.DataFrame:
            df = batch.select(cols).to_pandas().drop_duplicates(cols)
            df["_side"] = np.int8(side)
            df["_bucket"] = bucket_of(
                df["subj"].astype(str)
                + "\x1f"
                + df["pred"].astype(str)
                + "\x1f"
                + df["obj"].astype(str),
                num_buckets,
            )
            return df

        add.__name__ = f"tag_side{side}"
        return add

    def delta(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(cols, sort=False)["_side"]
            .agg(["min", "max"])
            .reset_index()
        )
        one_side = g["min"] == g["max"]
        out = g.loc[one_side, cols].copy()
        out["change"] = np.where(
            g.loc[one_side, "max"] == 1, "added", "removed"
        )
        return out

    tagged = old_ds.map_batches(
        arrowed(tag(0)), batch_format="pyarrow"
    ).union(new_ds.map_batches(arrowed(tag(1)), batch_format="pyarrow"))
    return tagged.groupby("_bucket").map_groups(
        arrowed(delta), batch_format="pandas"
    )


def fuse_majority(sources, num_buckets=None):
    """Truth-discovery fusion across extractor versions (the
    Knowledge-Vault-style complement to :func:`merge_triples`'
    latest-wins): per ``(subj, pred)``, keep the object asserted by the
    MOST sources — ``(subj, pred, obj, support)`` — ties broken by the
    lexicographically smallest object (deterministic under any
    partitioning).  Each element of ``sources`` is one extraction run's
    ``(subj, pred, obj)`` Dataset; a source asserting the same object
    twice (multi-window duplicates) still votes once.

    ONE exchange: each source's batches emit per-(subj, pred, obj)
    vote partials tagged with the source index (so the per-source
    distinct is exact without a second exchange), bucketed on the
    ``(subj, pred)`` hash; the per-bucket fold de-duplicates
    (source, triple) votes, sums support, and argmaxes per key.
    """
    from .common import arrowed, resolve_parallelism

    if not sources:
        raise ValueError("fuse_majority: need at least one source")
    num_buckets = resolve_parallelism(num_buckets)
    cols = ["subj", "pred", "obj"]

    def tag(src_idx: int):
        def votes(batch: pa.Table) -> pd.DataFrame:
            df = batch.select(cols).to_pandas().drop_duplicates(cols)
            df = df.astype(str)
            df["_src"] = np.int32(src_idx)
            df["_bucket"] = bucket_of(
                (df["subj"] + "\x1f" + df["pred"]).to_numpy(), num_buckets
            )
            return df

        votes.__name__ = f"votes_src{src_idx}"
        return votes

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(cols + ["_src"])
        g = (
            d.groupby(cols, sort=False)
            .size()
            .rename("support")
            .reset_index()
        )
        g["support"] = g["support"].astype(np.int64)
        g = g.sort_values(
            ["subj", "pred", "support", "obj"],
            ascending=[True, True, False, True],
            kind="stable",
        )
        out = g.groupby(["subj", "pred"], sort=False).head(1)
        return out[["subj", "pred", "obj", "support"]]

    tagged = sources[0].map_batches(arrowed(tag(0)), batch_format="pyarrow")
    for i, src in enumerate(sources[1:], start=1):
        tagged = tagged.union(
            src.map_batches(arrowed(tag(i)), batch_format="pyarrow")
        )
    return tagged.groupby("_bucket").map_groups(
        arrowed(fold), batch_format="pandas"
    )


def conflict_report(sources, num_buckets=None):
    """Conflict detection across extractor versions — the screening
    step BEFORE :func:`fuse_majority` (which assertions even NEED a
    vote, and what is the value spread): per ``(subj, pred)`` asserted
    with >= 2 DISTINCT objects anywhere across the sources, emit
    ``(subj, pred, n_vals, min_obj, max_obj)``.  Distinctness is on
    VALUES, not votes — a source repeating an object adds nothing.

    Same scale shape as fuse_majority: per-batch distinct
    ``(subj, pred, obj)`` partials from every source, ONE exchange
    hashed on the ``(subj, pred)`` key, per-bucket distinct + fold;
    output bounded by true disagreement."""
    from .common import arrowed, resolve_parallelism

    if not sources:
        raise ValueError("conflict_report: need at least one source")
    num_buckets = resolve_parallelism(num_buckets)
    cols = ["subj", "pred", "obj"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(cols).to_pandas().drop_duplicates(cols)
        df = df.astype(str)
        df["_bucket"] = bucket_of(
            (df["subj"] + "\x1f" + df["pred"]).to_numpy(), num_buckets
        )
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(cols)
        g = d.groupby(["subj", "pred"], sort=False).agg(
            n_vals=("obj", "nunique"),
            min_obj=("obj", "min"),
            max_obj=("obj", "max"),
        )
        g = g.reset_index()
        g["n_vals"] = g["n_vals"].astype(np.int64)
        return g[g["n_vals"] >= 2]

    tagged = sources[0].map_batches(arrowed(partial), batch_format="pyarrow")
    for src in sources[1:]:
        tagged = tagged.union(
            src.map_batches(arrowed(partial), batch_format="pyarrow")
        )
    return tagged.groupby("_bucket").map_groups(
        arrowed(fold), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# N-Triples sink / source — the RDF interchange materialize.  The
# reference stops at its own txt/sheet reports (models/qa_model.py
# _save_outputs); a KG consumed by standard triple stores needs the
# W3C line format.

NT_PRED_NS = "https://example.org/kg/pred/"

# N-Triples literal escapes (W3C N-Triples §2.3 ECHAR), both directions.
_NT_ESCAPES = (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
               ("\r", "\\r"), ("\t", "\\t"))
_NT_UNESC = {esc[1:]: raw for raw, esc in _NT_ESCAPES}  # '\x' -> raw


def _nt_escape(s: pd.Series) -> pd.Series:
    # backslash FIRST (it is the escape introducer), then the rest —
    # literal (regex=False) replaces, vectorized.
    for raw, esc in _NT_ESCAPES:
        s = s.str.replace(raw, esc, regex=False)
    return s


def _unesc_char(m) -> str:
    c = m.group(1)
    try:
        return _NT_UNESC[c]
    except KeyError:
        raise ValueError(f"read_ntriples: invalid escape \\{c}") from None


# characters the W3C N-Triples IRIREF production forbids unescaped:
# controls/space (x00-x20), <>, ", {}, |, ^, backtick and backslash.
# subj/pred are interpolated into <...> without escaping, so any hit
# would emit a shard read_ntriples cannot parse — fail at WRITE time.
_NT_IRI_ILLEGAL = r'[\x00-\x20<>"{}|^`\\]'


def _nt_check_iri(s: pd.Series, what: str) -> None:
    bad = s.str.contains(_NT_IRI_ILLEGAL, regex=True)
    if bad.any():
        sample = s[bad].iloc[0]
        raise ValueError(
            f"write_ntriples: {what} value {sample!r} contains a "
            "character illegal in an N-Triples IRIREF "
            "(controls, space, '<>\"{}|^`' or backslash)"
        )


def _nt_unescape(s: pd.Series) -> pd.Series:
    # single left-to-right pass: a chained literal replace would corrupt
    # '\\n' (escaped backslash + literal n) into a newline.
    if not s.str.contains("\\", regex=False).any():
        return s  # hot path: no escapes in the block
    # a literal ending in an ODD run of backslashes has a dangling
    # escape introducer that \\(.) cannot match — fail loudly instead
    # of passing the corrupt tail through
    trail = s.str.extract(r"(\\+)\Z")[0].str.len()
    if (trail % 2 == 1).fillna(False).any():
        raise ValueError("read_ntriples: dangling escape at end of literal")
    return s.str.replace(r"\\(.)", _unesc_char, regex=True)


def write_ntriples(triples_ds, out_dir: str):
    """Materialize ``(subj, pred, obj)`` as sharded W3C N-Triples text:
    ``<subj> <NT_PRED_NS + pred> "escaped obj" .`` — one ``.nt`` shard
    per block, named by the blake2b hash of its bytes (content-
    addressed: a resumed/repeated run rewrites byte-identical shards
    idempotently instead of accumulating duplicates), plus a root
    ``_MANIFEST.json`` with per-shard row counts for lineage.

    The writer runs INSIDE the map tasks (each task writes its own
    shard — the driver only ever holds one (file, rows) row per block);
    an exclusive-create with a ``-k`` suffix loop allocates a FRESH
    name whenever the target exists — even for byte-identical content,
    since two duplicate blocks are indistinguishable from a task retry
    and silently coalescing them would lose rows.  Orphans from retries
    or earlier runs are removed at the end: the manifest (built from
    the consumed task results) is authoritative over the directory.
    """
    import hashlib
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"file": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64())}
            )
        subj = batch["subj"].to_pandas().astype(str)
        pred = batch["pred"].to_pandas().astype(str)
        _nt_check_iri(subj, "subj")
        _nt_check_iri(pred, "pred")
        obj = _nt_escape(batch["obj"].to_pandas().astype(str))
        lines = (
            "<" + subj + "> <" + NT_PRED_NS + pred + '> "' + obj + '" .'
        )
        payload = ("\n".join(lines.tolist()) + "\n").encode("utf-8")
        digest = hashlib.blake2b(payload, digest_size=8).hexdigest()
        name = f"{digest}.nt"
        for k in range(1_000_000):
            path = os.path.join(out_dir, name)
            try:
                fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
            except FileExistsError:
                name = f"{digest}-{k}.nt"
                continue
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            break
        return pa.table(
            {"file": pa.array([name]),
             "rows": pa.array([batch.num_rows], pa.int64())}
        )

    shards = (
        triples_ds.select_columns(["subj", "pred", "obj"])
        .map_batches(write_block, batch_format="pyarrow")
        .take_all()
    )
    manifest = {
        "shards": {r["file"]: r["rows"] for r in shards},
        "total_rows": int(sum(r["rows"] for r in shards)),
    }
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    # the manifest is authoritative: a rerun whose blocks split
    # differently must not leave a previous run's shards behind for
    # read_ntriples to double-count
    import glob

    for path in glob.glob(os.path.join(out_dir, "*.nt")):
        if os.path.basename(path) not in manifest["shards"]:
            os.remove(path)
    return out_dir


_NT_LINE = r'^<([^>]*)> <([^>]*)> "(.*)" \.$'


def read_ntriples(nt_dir: str):
    """Read an N-Triples shard directory back into a ``(subj, pred,
    obj)`` Dataset — the inverse of :func:`write_ntriples` (predicate
    namespace stripped, literal escapes decoded).  Built on
    ``ray.data.read_text`` so shards stream block-parallel; the parse is
    one vectorized regex extract per block."""
    import glob

    import ray.data as rd

    files = sorted(glob.glob(f"{nt_dir}/*.nt"))
    if not files:
        raise FileNotFoundError(f"read_ntriples: no .nt shards in {nt_dir}")

    def parse(batch: pa.Table) -> pa.Table:
        text = batch["text"].to_pandas().astype(str)
        m = text.str.extract(_NT_LINE)
        if m[0].isna().any():
            bad = text[m[0].isna()].iloc[0]
            raise ValueError(f"read_ntriples: malformed line {bad!r}")
        pred = m[1].str.removeprefix(NT_PRED_NS)
        return pa.table(
            {
                "subj": pa.array(m[0], pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj": pa.array(_nt_unescape(m[2]), pa.string()),
            }
        )

    return rd.read_text(files).map_batches(parse, batch_format="pyarrow")
