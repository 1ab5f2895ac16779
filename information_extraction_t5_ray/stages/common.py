"""Shared partitioning primitives for bucketed two-phase stages."""

from __future__ import annotations

import zlib

import numpy as np


def resolve_parallelism(
    parallelism: int | None = None,
    per_cpu: int = 2,
    floor: int = 8,
    cap: int = 1024,
) -> int:
    """Shuffle/reduce width for the bucketed groupbys: explicit value
    wins; ``None`` sizes to ``per_cpu x`` cluster CPUs.  A fixed wide
    fan-out over-partitions small clusters into scheduling overhead, a
    fixed narrow one starves big ones — the ``map_groups`` task count
    follows this number, so a 64-bucket literal caps a 256-core cluster
    at a quarter of its reduce width.  The cap bounds tiny-group
    overhead on very large clusters; pass an explicit value to exceed
    it."""
    if parallelism is not None:
        return parallelism
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - no cluster
        cpus = 8
    return max(floor, min(cap, cpus * per_cpu))


def compact_blocks(
    ds,
    *,
    target_block_bytes: int = 32 << 20,
    floor: int | None = None,
    cap: int = 4096,
):
    """Materialize ``ds`` compacted to a production-like block count.

    A pipeline materialized mid-session keeps its upstream task-level
    block count — e.g. 64 sub-megabyte blocks for a small triples table
    — while the production shape of the same artifact is a Parquet
    round-trip whose read blocks follow BYTES.  Every downstream sort /
    groupby exchange sizes its task count from the input block count,
    so the tiny-block shape pays 64-wide shuffle overhead to move a few
    MiB (measured: 2x on the sf0.1 graph-analytics entries).

    Width = clamp(ceil(size_bytes / target_block_bytes), floor, cap)
    with ``floor`` defaulting to half the cluster CPUs so downstream
    per-block compute still spreads across the machine; at data-
    dominated sizes the bytes term takes over and this is a no-op
    (never widens — returns the input when already at or below width).
    """
    import math

    m = ds.materialize()
    if floor is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:  # pragma: no cover - no cluster
            cpus = 8
        floor = max(4, cpus // 2)
    width = max(floor, min(cap, math.ceil(m.size_bytes() / target_block_bytes)))
    if m.num_blocks() <= width:
        return m
    return m.repartition(width).materialize()


def maybe_scatter(ds, parallelism: int | None):
    """Optional pre-groupby re-scatter: ``None`` (the default everywhere)
    is a no-op, an explicit width inserts ``repartition(parallelism)``.

    The sort-based ``groupby.map_groups`` reduce width follows the
    UPSTREAM block count, so a mid-pipeline repartition is only useful
    when the input is narrow (a caller handing in a single-block
    dataset).  Sharded real corpora are wide at the read, and at small
    scale the extra all-to-all is pure overhead — measured at sf0.1 it
    was ~45% of minhash_lsh_pairs wall time (3.8s -> 2.1s dropped)."""
    if parallelism is None:
        return ds
    return ds.repartition(parallelism)


# pd.util.hash_pandas_object of ['graft-bucket-sentinel', ''] under the
# hash definition every bucketed stage was built against (siphash13 with
# pandas' fixed key).  pandas only promises these values "for a given
# pandas version" — the guard below turns any future/mixed-version drift
# from a silent group-split into a hard error.
_SIPHASH_SENTINELS = (12556846241667650912, 1760245841805064774)
_siphash_checked = False


def _check_hash_stability() -> None:
    """Once per process: assert this worker's pandas string hash matches
    the repo-pinned definition.  On a heterogeneous cluster a worker
    with a pandas whose siphash values changed would silently route the
    same key to a DIFFERENT bucket than its peers, splitting the key's
    group and corrupting every bucketed aggregate/dedup — this guard
    makes that a loud RuntimeError at the first bucketed stage instead."""
    global _siphash_checked
    if _siphash_checked:
        return
    import pandas as pd

    got = tuple(
        int(v)
        for v in pd.util.hash_pandas_object(
            pd.Series(["graft-bucket-sentinel", ""]), index=False
        ).to_numpy()
    )
    if got != _SIPHASH_SENTINELS:
        raise RuntimeError(
            "bucket_of: this process's pandas string hash "
            f"(pandas {pd.__version__}) disagrees with the repo-pinned "
            "sentinel values — a mixed- or changed-version cluster would "
            "split keys across buckets.  Pin ONE pandas version across "
            "the cluster (all workers must hash identically), or update "
            "_SIPHASH_SENTINELS after verifying every node matches."
        )
    _siphash_checked = True


def group_starts(*key_arrays) -> tuple:
    """Run boundaries over PRE-SORTED parallel key arrays: returns
    ``(starts, ends)`` index arrays, one entry per distinct key tuple —
    the shared primitive of the sort-boundary grouped folds (pandas'
    grouped string min/max is pathologically slow; sorting once and
    gathering at the boundaries is ~10x cheaper, see triple_support /
    entities_stage).  Comparing the key COLUMNS directly (ORed
    inequality) rather than a separator-concatenated composite keeps
    two distinct tuples like ('p\\x1f', 'x') and ('p', '\\x1fx') in
    separate groups.  Empty input yields two empty arrays (the naive
    ``np.r_[True, ...]`` idiom returns ``[0]`` on empty and then every
    downstream gather IndexErrors)."""
    n = len(key_arrays[0])
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    neq = np.zeros(n - 1, dtype=bool)
    for arr in key_arrays:
        neq |= arr[1:] != arr[:-1]
    starts = np.flatnonzero(np.r_[True, neq])
    ends = np.r_[starts[1:], n]
    return starts, ends


def reduceat_sum(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """``np.add.reduceat`` that tolerates the zero-group case."""
    if len(starts) == 0:
        return np.zeros(0, dtype=values.dtype)
    return np.add.reduceat(values, starts)


def bucket_of(keys, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per key, identical in every worker
    process: integer keys take the modulo path, anything else goes
    through pandas' vectorized fixed-key siphash (C-speed, stable across
    processes and runs for a given pandas version — and guarded by
    :func:`_check_hash_stability`, which fails loudly if a worker's
    pandas hashes the sentinel differently, so a mixed-version cluster
    cannot silently split a key's group).  NEVER use Python ``hash()``
    here — it is salted per process, and workers are separate processes,
    so the same key would land in different buckets and split its group.

    Accepts a numpy array or pandas Series; returns int32 ndarray.
    """
    import pandas as pd

    arr = np.asarray(keys)
    if np.issubdtype(arr.dtype, np.integer):
        return (arr.astype(np.int64) % num_buckets).astype(np.int32)
    _check_hash_stability()
    h = pd.util.hash_pandas_object(pd.Series(arr), index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int32)


def clean_read_schema(path, columns=None):
    """Metadata-free ``pa.Schema`` for ``read_parquet(schema=...)``.

    Read tasks emit blocks carrying the FILE's schema, so stripping the
    unhashable ``b'pandas'`` metadata dict in a post-read map still
    leaves 'Failed to hash the schemas' warnings (and the slow
    schema-unify path) inside the read/split/repartition stages
    themselves.  Passing a cleaned schema to ``read_parquet`` fixes it
    at the source — one footer read, driver-side.

    ``path`` may be a file or a directory of ``*.parquet`` shards (one
    footer is representative — our writers emit a single schema).
    Returns ``None`` when no footer is found (caller passes
    ``schema=None`` → Ray infers as before).
    """
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(path)
    if os.path.isdir(p):
        shards = sorted(glob.glob(os.path.join(p, "*.parquet")))
        if not shards:
            return None
        p = shards[0]
    if not os.path.isfile(p):
        return None
    s = pq.read_schema(p)
    names = list(columns) if columns is not None else s.names
    return pa.schema([s.field(n).remove_metadata() for n in names])


def read_parquet_clean(path, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the schema cleaned at the read
    task (see :func:`clean_read_schema`).  ``path`` may be a single
    file/directory (one footer is representative — repo writers emit a
    single schema) or a LIST of shard paths (file-range shard
    selection over a possibly EXTERNALLY-written layout): list footers
    are each checked against the first, so a heterogeneous shard fails
    with a report naming the file instead of an opaque mid-read Arrow
    cast error."""
    import ray.data as rd

    if isinstance(path, (list, tuple)):
        schema = clean_read_schema(path[0], columns)
        if schema is not None:
            import pyarrow.parquet as pq

            for p in path[1:]:
                other = pq.read_schema(str(p))
                for field in schema:
                    got = (
                        other.field(field.name)
                        if field.name in other.names
                        else None
                    )
                    if got is None or got.type != field.type:
                        raise ValueError(
                            f"parquet shard schema mismatch: {p} has "
                            f"{field.name}={got.type if got else 'MISSING'}, "
                            f"{path[0]} has {field.name}={field.type}"
                        )
        paths: object = [str(p) for p in path]
    else:
        schema = clean_read_schema(path, columns)
        paths = str(path)
    return rd.read_parquet(paths, columns=columns, schema=schema, **kwargs)


def arrow_out(df):
    """pandas UDF result -> metadata-free Arrow block.

    Owns two repo invariants for blocks entering a shuffle:

    - NO ``b'pandas'`` schema metadata (``pa.Table.from_pandas`` embeds
      an unhashable dict; Ray's reduce-side block concat then logs
      'Failed to hash the schemas' and falls back to the slow
      schema-unify path on every merge);
    - NO null-typed columns from EMPTY frames (``from_pandas`` infers
      ``null`` for an empty object column, which makes that block's
      schema disagree with its non-empty siblings).  Empty object
      columns are typed ``string`` — every bucketed stage in this repo
      keeps keys as strings, so the assumption holds by construction.

    Accepts a ``pa.Table`` too (stripped, not converted), so callers can
    mix typed-Arrow fast paths with pandas returns.
    """
    import pandas as pd  # noqa: F401  (dtype checks below)
    import pyarrow as pa

    if isinstance(df, pa.Table):
        return df.replace_schema_metadata(None)
    if len(df) == 0:
        fields = [
            (
                str(c),
                pa.string()
                if df[c].dtype == object
                else pa.from_numpy_dtype(df[c].dtype),
            )
            for c in df.columns
        ]
        return pa.table({n: pa.array([], t) for n, t in fields})
    return pa.Table.from_pandas(
        df, preserve_index=False
    ).replace_schema_metadata(None)


def arrowed(fn):
    """Wrap a pandas-returning batch/group UDF so its result enters the
    block stream as a metadata-free typed Arrow block (:func:`arrow_out`)
    — keeps every block of a shuffle input the SAME block type (Ray's
    sort sampler asserts on an Arrow/pandas mix) and kills the two
    warning classes documented on :func:`arrow_out`."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return arrow_out(fn(*args, **kwargs))

    return wrapper


def strip_pandas_metadata(ds):
    """Drop Arrow schema metadata at a Dataset boundary (zero-copy, fuses
    with the next map stage).  Owns the repo invariant: no unhashable
    b'pandas' metadata dict (embedded by pandas-written parquet and by
    ``pa.Table.from_pandas``) may enter a shuffle — Ray's block concat
    would log 'Failed to hash the schemas' and fall back to the slow
    schema-unify path on every multi-block concat."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
