"""Online sharded dedup index — the shared-MUTABLE-state operator.

Everything else in this repo is a pure Dataset transform; this is the
one semantics ``ray.data`` cannot express: an exact-dedup membership
index that persists ACROSS pipeline executions (continuous ingest — a
new crawl shard arrives every hour and must dedup against everything
ever admitted) and stays consistent under concurrent writers.  Per the
Dataset-first design rule, it drops to raw ``@ray.remote`` actors only
for the index itself; the document stream still flows through
``map_batches``.

Design:

* the key space hash-partitions over ``num_shards`` actor shards, so
  the index scales horizontally (memory per shard = distinct keys /
  shards x ~8 bytes) and admission load spreads;
* each shard's ``check_and_add`` is atomic (actor method serialization)
  — when two concurrent batches race on the same new key, exactly one
  wins.  Semantics are therefore KEEP-FIRST-ARRIVAL (the online dedup
  contract), not the deterministic min-id of the batch operators —
  the surviving row COUNT per content is exactly 1 either way;
* batch tasks talk to all shards in one round: keys bucket by
  ``hash % num_shards``, one ``check_and_add`` per touched shard, masks
  scatter back — per-batch actor traffic is O(shards), payloads are
  uint64 arrays, never text.

At 100 TB the per-shard set becomes RAM-bound around ~10^9 distinct
keys x shards; swap the Python set for a per-shard RocksDB/Bloom tier
at that point — the sharding and admission protocol stay identical.

Reference parity note: lifts features/postprocess.py:277-284 keep-first
from a static groupby to an ONLINE admission contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def content_keys(texts) -> np.ndarray:
    """uint64 content keys: first 8 bytes of md5(utf-8) — stable across
    processes/runs (unlike ``hash()``), collision odds ~n^2/2^65."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
            )
            for t in texts
        ],
        dtype=np.uint64,
    )


def _make_shard_cls():
    import ray

    @ray.remote
    class DedupShard:
        """One shard of the seen-key set.  Method calls serialize, so
        check_and_add is atomic: the first caller to present a key is
        the one admission."""

        def __init__(self):
            self.seen: set = set()

        def check_and_add(self, keys: np.ndarray) -> np.ndarray:
            out = np.empty(len(keys), dtype=bool)
            seen = self.seen
            for i, k in enumerate(keys.tolist()):
                if k in seen:
                    out[i] = False
                else:
                    seen.add(k)
                    out[i] = True
            return out

        def size(self) -> int:
            return len(self.seen)

        def dump(self) -> np.ndarray:
            return np.fromiter(self.seen, dtype=np.uint64, count=len(self.seen))

        def load(self, keys: np.ndarray) -> int:
            self.seen.update(keys.tolist())
            return len(self.seen)

    return DedupShard


class ShardedDedupIndex:
    """Distributed online exact-dedup index.

    >>> idx = ShardedDedupIndex(num_shards=8)
    >>> fresh = idx.filter_new(crawl_shard_1)   # admits everything new
    >>> later = idx.filter_new(crawl_shard_2)   # drops anything shard 1 admitted
    """

    def __init__(self, num_shards: int = 8):
        cls = _make_shard_cls()
        self.num_shards = num_shards
        self.shards = [cls.remote() for _ in range(num_shards)]

    def filter_new(self, docs_ds, batch_size: int = 4096):
        """Admit the not-yet-seen rows of ``docs_ds`` (by exact text
        content) and update the index.  Returns the surviving rows with
        their full schema, MATERIALIZED: admission mutates shared state,
        so the map must run exactly once — a lazy result re-executed by
        a second ``.count()``/``.to_pandas()`` would re-check its own
        keys against the now-populated index and silently drop every
        row.  (A mid-map task retry after its admissions landed has the
        same hazard — an at-most-once loss bounded to the retried batch;
        production ingest should checkpoint admitted batches, see
        ``save``.)  Consume the result before the next ``filter_new``
        call if cross-call ordering matters."""
        import ray

        shards = self.shards
        n = self.num_shards

        def admit(batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            nulls = [i for i, t in enumerate(texts) if t is None]
            if nulls:
                # null text has no content to dedup on: pass those rows
                # through UNDEDUPLICATED (never touch the index) rather
                # than crash on None.encode or silently drop crawl rows
                keep = np.ones(len(texts), dtype=bool)
                keep[nulls] = False
                null_rows = batch.filter(pa.array(~keep))
                batch = batch.filter(pa.array(keep))
                texts = [t for t in texts if t is not None]
            else:
                null_rows = None
            keys = content_keys(texts)
            shard_of = (keys % np.uint64(n)).astype(np.int64)
            mask = np.zeros(len(keys), dtype=bool)
            futs, rows_per = [], []
            for s in range(n):
                rows = np.flatnonzero(shard_of == s)
                if len(rows):
                    futs.append(shards[s].check_and_add.remote(keys[rows]))
                    rows_per.append(rows)
            for rows, got in zip(rows_per, ray.get(futs)):
                mask[rows] = got
            out = batch.filter(pa.array(mask))
            if null_rows is not None and null_rows.num_rows:
                out = pa.concat_tables([out, null_rows])
            return out

        return docs_ds.map_batches(
            admit, batch_format="pyarrow", batch_size=batch_size
        ).materialize()

    def size(self) -> int:
        """Total distinct keys admitted so far."""
        import ray

        return int(sum(ray.get([s.size.remote() for s in self.shards])))

    def save(self, out_dir: str) -> str:
        """Persist the admitted key set as one Parquet file per shard —
        the index survives the Ray session, so tomorrow's ingest run
        deduplicates against everything ever admitted (quiesce ingest
        before saving: an in-flight filter_new may still be admitting).
        Each shard dumps its own uint64 array; nothing funnels through
        a single task."""
        import ray
        from pathlib import Path

        import pyarrow as pa
        import pyarrow.parquet as pq

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        for i, keys in enumerate(ray.get([s.dump.remote() for s in self.shards])):
            pq.write_table(
                pa.table({"key": pa.array(keys, pa.uint64())}),
                out / f"shard-{i:05d}.parquet",
            )
        return str(out)

    @classmethod
    def load(cls, out_dir: str, num_shards: int | None = None):
        """Rebuild an index from :meth:`save` output.  ``num_shards``
        may differ from the saved layout — keys re-route by hash, so an
        index can be re-sharded wider as the corpus grows."""
        import ray
        from pathlib import Path

        import pyarrow.parquet as pq

        files = sorted(Path(out_dir).glob("shard-*.parquet"))
        if num_shards is None:
            num_shards = max(len(files), 1)
        idx = cls(num_shards=num_shards)
        n = np.uint64(idx.num_shards)
        futs = []
        for f in files:
            keys = pq.read_table(f)["key"].to_numpy().astype(np.uint64)
            route = (keys % n).astype(np.int64)
            for s in range(idx.num_shards):
                part = keys[route == s]
                if len(part):
                    futs.append(idx.shards[s].load.remote(part))
        ray.get(futs)
        return idx
