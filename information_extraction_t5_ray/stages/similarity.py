"""Embedding similarity search & near-duplicate detection.

Over an embedding column (``list<float>``):

* ``ann_topk``            — brute-force cosine top-k: the QUERY matrix is
                            broadcast ONCE via ``ray.put`` and read inside
                            every map task (never re-shipped per batch);
                            each candidate batch computes a float64 matmul
                            and emits per-query partial top-k rows; the
                            final per-query reduce is a small bucketed
                            groupby over |Q| * k * num_batches partials.
* ``cosine_dup_pairs``    — pairs with cosine >= threshold: blocked
                            matmul of each batch against the broadcast
                            normalized corpus matrix (the O(N*B) scale
                            baseline; at 10^9+ rows swap the broadcast for
                            ``rp_lsh_dup_pairs``).
* ``rp_lsh_dup_pairs``    — random-hyperplane LSH (Charikar'02): sign
                            bits of G @ x bucket the vectors; exact cosine
                            verify runs inside each bucket group, vectors
                            ride with the rows — no broadcast, shuffle is
                            the only wide op.  The scale path.

All cosines are computed in float64 so results match a DuckDB
``list_cosine_similarity`` oracle bit-for-bit up to summation order.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import maybe_scatter, resolve_parallelism


_RP_PLANES_CACHE: dict = {}


def _mat(batch_col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix.

    Rectangular list arrays flatten zero-copy (values buffer -> numpy)
    and reshape; only ragged input falls back to the python-object path.
    """
    arr = batch_col.combine_chunks() if hasattr(batch_col, "combine_chunks") else batch_col
    try:
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all():
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), int(widths[0])).astype(np.float64, copy=False)
    except AttributeError:  # FixedSizeListArray or non-list input
        values = getattr(arr, "values", None)
        if values is not None and hasattr(arr.type, "list_size"):
            flat = values.to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), arr.type.list_size).astype(np.float64, copy=False)
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


# ---------------------------------------------------------------------------
# brute-force cosine top-k (broadcast queries)
# ---------------------------------------------------------------------------


def _topk_empty_partial() -> pd.DataFrame:
    """Typed empty partial — the shared output contract of the ANN
    partial phases (ann_topk and ann_topk_ivf must stay column- and
    dtype-identical or their equality invariant drifts)."""
    return pd.DataFrame(
        {"query_id": pd.Series(dtype=np.int64),
         "neighbor_id": pd.Series(dtype=np.int64),
         "sim": pd.Series(dtype=np.float64),
         "bucket": pd.Series(dtype=np.int32)}
    )


def _topk_final(k: int):
    """Shared final reducer for the ANN top-k stages: (sim desc,
    neighbor_id asc) within query, head(k), 1-based rank — ONE copy so
    the 'ivf at nprobe=n_clusters equals brute force exactly' invariant
    cannot drift between the two implementations."""

    def final(bucket_df: pd.DataFrame) -> pd.DataFrame:
        bucket_df = bucket_df.sort_values(
            ["query_id", "sim", "neighbor_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        top = bucket_df.groupby("query_id", sort=False).head(k).copy()
        top["rank"] = top.groupby("query_id", sort=False).cumcount() + 1
        return top[["query_id", "rank", "neighbor_id"]].astype(np.int64)

    return final


def ann_topk(
    embeddings_ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 5,
    num_buckets: int | None = None,
    batch_size: int = 4096,
):
    """Top-k cosine neighbors of each query among the dataset's vectors.

    Returns (query_id, rank, neighbor_id); rank 1-based, ties broken by
    ascending neighbor_id (deterministic under any partitioning).
    """
    num_buckets = resolve_parallelism(num_buckets)
    import ray

    qn_ref = ray.put(_normalize(query_matrix))
    qid_ref = ray.put(np.asarray(query_ids, dtype=np.int64))

    def partial(batch: pa.Table) -> pd.DataFrame:
        qn = ray.get(qn_ref)
        qids = ray.get(qid_ref)
        if len(batch) == 0:
            return _topk_empty_partial()
        cand = _normalize(_mat(batch["embedding"]))
        cand_ids = batch["vec_id"].to_numpy()
        sims = qn @ cand.T  # (Q, B)
        kk = min(k, sims.shape[1])
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        # per-query partial top-k from this batch; ties at the k
        # boundary break by ASCENDING neighbor_id (argpartition alone
        # keeps an arbitrary subset of boundary ties, which would make
        # the result depend on batch partitioning)
        order = np.lexsort(
            (np.broadcast_to(cand_ids, sims.shape), -sims)
        )  # (Q, B): per-row order by (-sim, neighbor_id)
        idx = order[:, :kk]
        for qi in range(sims.shape[0]):
            sel = idx[qi]
            out["query_id"].extend([qids[qi]] * len(sel))
            out["neighbor_id"].extend(cand_ids[sel])
            out["sim"].extend(sims[qi, sel])
        df = pd.DataFrame(out)
        df["bucket"] = (df["query_id"] % num_buckets).astype(np.int32)
        return df

    final = _topk_final(k)

    partials = embeddings_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby("bucket").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF-Flat cosine top-k (the scale path for search)
# ---------------------------------------------------------------------------


def _train_sample_df(
    ds, n: int, id_col: str = "vec_id", total: int | None = None
) -> pd.DataFrame:
    """Uniform ~``n``-row sample for centroid training, drawn by LCG
    hash on ``id_col`` — NOT a ``limit(n)`` prefix.

    A prefix is biased whenever the corpus is sorted or source-clustered
    (at 100 TB it always is: crawl order, domain order, shard order), so
    prefix-trained centroids only cover the FIRST source's manifold.
    Instead keep rows with ``lcg(id) % 2^31 < ceil(n/total * 2^31)`` —
    the same seeded-hash regime as :func:`sampling.stratified_sample`,
    at full 2^31 granularity so the expected draw stays ~``n`` even at
    ``n/total`` ~ 1e-7.  Costs one ``count()`` (metadata-only on a
    parquet read; pass ``total`` when the caller already knows it) plus
    one filtered stream of only the sampled rows to the driver.  The
    trailing ``limit`` is a 2x safety cap, not the sampling mechanism —
    at uniform hash dispersion it essentially never binds.
    """
    from .sampling import _LCG_M, lcg_bucket

    if total is None:
        total = ds.count()
    if total <= n:
        return ds.to_pandas()
    thresh = int(np.ceil(n / total * _LCG_M))

    def keep(batch: pa.Table) -> pa.Table:
        b = lcg_bucket(batch[id_col].to_numpy(), denom=_LCG_M)
        return batch.filter(pa.array(b < thresh))

    return (
        ds.map_batches(keep, batch_format="pyarrow").limit(2 * n).to_pandas()
    )


def _kmeans_lite(
    sample: np.ndarray, n_clusters: int, n_iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample.

    Lloyd iterations over NORMALIZED vectors with cosine (=dot)
    assignment; empty clusters re-seeded from the worst-assigned points.
    The sample is small (<= a few 10^4 rows) — training is a driver-side
    numpy job; only the (C, d) centroid matrix is broadcast.
    """
    rng = np.random.RandomState(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(x)
    k = min(n_clusters, n)
    cent = x[rng.choice(n, size=k, replace=False)]
    for _ in range(n_iters):
        sims = x @ cent.T  # (n, k)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        new = np.zeros_like(cent)
        np.add.at(new, assign, x)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            # re-seed empties on the points farthest from their centroid
            worst = np.argsort(best)[: int(empty.sum())]
            new[empty] = x[worst]
            counts[empty] = 1
        cent = _normalize(new / counts[:, None])
    return cent


def ann_topk_ivf(
    embeddings_ds,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    train_sample: int = 20000,
    num_buckets: int | None = None,
    batch_size: int = 4096,
    seed: int = 42,
):
    """IVF-Flat approximate top-k: candidates are scored only against the
    queries whose ``nprobe`` nearest centroids include the candidate's
    cluster.

    Scale shape: centroids train on a bounded driver-side sample drawn
    by LCG hash (:func:`_train_sample_df` — uniform over the corpus,
    not a sorted-input-biased prefix), the (C, d)
    centroid matrix + per-cluster query lists broadcast ONCE via
    ``ray.put``, and each data batch does one (B, C) assignment matmul
    plus per-present-cluster partial matmuls — expected query-side work
    is ``nprobe / n_clusters`` of brute force, and the corpus is never
    shuffled.  With ``nprobe == n_clusters`` results equal ``ann_topk``
    exactly (tested); recall at lower nprobe is the usual IVF tradeoff.
    Same output contract as ``ann_topk``: (query_id, rank, neighbor_id),
    rank 1-based, ties by ascending neighbor_id.
    """
    num_buckets = resolve_parallelism(num_buckets)
    import ray

    sample_tbl = _train_sample_df(embeddings_ds, train_sample)
    sample = np.asarray(sample_tbl["embedding"].tolist(), dtype=np.float64)
    cent = _kmeans_lite(sample, n_clusters, seed=seed)
    C = len(cent)
    nprobe = min(nprobe, C)

    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qc = qn @ cent.T  # (Q, C)
    probe = np.argpartition(-qc, nprobe - 1, axis=1)[:, :nprobe]  # (Q, nprobe)
    # cluster -> indices of queries probing it (driver-side inverse map)
    cluster_queries = [np.flatnonzero((probe == c).any(axis=1)) for c in range(C)]

    cent_ref = ray.put(cent)
    qn_ref = ray.put(qn)
    qid_ref = ray.put(qids)
    cq_ref = ray.put(cluster_queries)

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:  # _mat can't infer dim from an empty batch
            return _topk_empty_partial()
        cent_m = ray.get(cent_ref)
        qn_m = ray.get(qn_ref)
        qids_m = ray.get(qid_ref)
        cq = ray.get(cq_ref)
        cand = _normalize(_mat(batch["embedding"]))
        cand_ids = batch["vec_id"].to_numpy()
        assign = np.argmax(cand @ cent_m.T, axis=1)  # (B,)
        out_q, out_n, out_s = [], [], []
        for c in np.unique(assign):
            q_idx = cq[c]
            if len(q_idx) == 0:
                continue
            rows = np.flatnonzero(assign == c)
            sims = qn_m[q_idx] @ cand[rows].T  # (q, b)
            kk = min(k, sims.shape[1])
            # boundary ties break by ascending neighbor_id (see ann_topk)
            idx = np.lexsort(
                (np.broadcast_to(cand_ids[rows], sims.shape), -sims)
            )[:, :kk]
            for qi in range(sims.shape[0]):
                sel = idx[qi]
                out_q.append(np.full(len(sel), qids_m[q_idx[qi]], dtype=np.int64))
                out_n.append(cand_ids[rows[sel]])
                out_s.append(sims[qi, sel])
        if not out_q:
            return _topk_empty_partial()
        df = pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "sim": np.concatenate(out_s),
            }
        )
        df["bucket"] = (df["query_id"] % num_buckets).astype(np.int32)
        return df

    final = _topk_final(k)

    partials = embeddings_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby("bucket").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# cosine near-duplicate pairs
# ---------------------------------------------------------------------------


def cosine_dup_pairs(
    embeddings_ds,
    corpus_ids: np.ndarray,
    corpus_matrix: np.ndarray,
    threshold: float = 0.9,
    batch_size: int = 2048,
):
    """(i < j) pairs with cosine >= threshold; each batch row is compared
    against the broadcast corpus (emit only i < j to halve work and to
    make the result partition-independent)."""
    import ray

    cn_ref = ray.put(_normalize(corpus_matrix))
    cid_ref = ray.put(np.asarray(corpus_ids, dtype=np.int64))

    def partial(batch: pa.Table) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {"i": pd.Series(dtype=np.int64),
                 "j": pd.Series(dtype=np.int64)}
            )
        cn = ray.get(cn_ref)
        cids = ray.get(cid_ref)
        rows = _normalize(_mat(batch["embedding"]))
        row_ids = batch["vec_id"].to_numpy()
        sims = rows @ cn.T  # (B, N)
        bi, cj = np.nonzero(sims >= threshold)
        i_ids = row_ids[bi]
        j_ids = cids[cj]
        m = i_ids < j_ids
        return pd.DataFrame({"i": i_ids[m], "j": j_ids[m]}, dtype=np.int64)

    return embeddings_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )


def rp_lsh_dup_pairs(
    embeddings_ds,
    threshold: float = 0.9,
    num_tables: int = 8,
    bits: int = 12,
    seed: int = 42,
    num_buckets: int | None = None,
    batch_size: int = 4096,
    dim: Optional[int] = None,
    parallelism: int | None = None,
    max_bucket_df: int = 1024,
):
    """Random-hyperplane LSH near-dup pairs — the no-broadcast scale
    path.  Recall is probabilistic (tested, not oracle-matched); the
    cosine verify inside the bucket group is exact."""

    num_buckets = resolve_parallelism(num_buckets)
    def _planes(d: int) -> np.ndarray:
        """Per-worker-process cache of the hyperplane tensor — cheap to
        rebuild (seeded randn), so stateless tasks beat an actor pool
        that would pay pool spin-up on every pipeline execution."""
        key = (num_tables, bits, seed, d)
        if key not in _RP_PLANES_CACHE:
            rng = np.random.RandomState(seed)
            _RP_PLANES_CACHE[key] = rng.randn(num_tables, bits, d)
        return _RP_PLANES_CACHE[key]

    class Hasher:
        def __init__(self):
            self.G = None  # built lazily from the first batch's dim

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {"bkey": pa.array([], pa.int64()),
                     "vec_id": pa.array([], pa.int64()),
                     "vec": pa.array([], pa.list_(pa.float64()))}
                )
            m = _mat(batch["embedding"])
            if self.G is None:
                self.G = _planes(dim or m.shape[1])
            ids = batch["vec_id"].to_numpy()
            vn = _normalize(m)
            keys, out_ids, vecs = [], [], []
            for t in range(num_tables):
                signs = (vn @ self.G[t].T) > 0  # (B, bits)
                kv = signs.dot(1 << np.arange(bits)).astype(np.int64)
                keys.append((np.int64(t) << np.int64(bits)) | kv)
                out_ids.append(ids)
                vecs.extend(vn.tolist())
            return pa.table(
                {
                    "bkey": pa.array(np.concatenate(keys)),
                    "vec_id": pa.array(np.concatenate(out_ids)),
                    "vec": pa.array(vecs, pa.list_(pa.float64())),
                }
            )

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from .dedup import _group_pair_indices

        df = df.drop_duplicates(["bkey", "vec_id"])
        keys = df["bkey"].to_numpy()
        # hot-bucket skew guard: a cluster of near-identical vectors
        # lands in the SAME bucket of every table, and an uncapped
        # C(n,2) pair emission there is O(n^2) memory in one task —
        # the same stop-key cap the shingle index uses (recall note:
        # members of an over-full bucket usually share other, smaller
        # buckets across the num_tables tables)
        order, li, ri = _group_pair_indices(keys, max_df=max_bucket_df)
        if li.size == 0:
            return pd.DataFrame(
                {"i": pd.Series(dtype=np.int64), "j": pd.Series(dtype=np.int64)}
            )
        ids = df["vec_id"].to_numpy()[order]
        v = np.asarray(df["vec"].tolist(), dtype=np.float64)[order]
        # exact cosine per candidate pair (vectors are pre-normalized)
        sims = np.einsum("ij,ij->i", v[li], v[ri])
        a, b = ids[li], ids[ri]
        m = (sims >= threshold) & (a != b)
        return pd.DataFrame(
            {"i": np.minimum(a[m], b[m]), "j": np.maximum(a[m], b[m])},
            dtype=np.int64,
        )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["i", "j"])[["i", "j"]]

    hasher = Hasher()  # stateless tasks; planes rebuilt from cache per worker
    h = embeddings_ds.map_batches(
        lambda b: hasher(b), batch_format="pyarrow", batch_size=batch_size
    )
    h = maybe_scatter(
        h.map_batches(
            lambda df: df.assign(
                bucket=(df["bkey"] % num_buckets).astype(np.int32)
            ),
            batch_format="pandas",
        ),
        parallelism,
    )
    cand = h.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
    cand = cand.map_batches(
        lambda df: df.assign(
            pbucket=((df["i"] * 1000003 + df["j"]) % num_buckets).astype(np.int32)
        )
        if len(df)
        else df.assign(pbucket=pd.Series(dtype=np.int32)),
        batch_format="pandas",
    )
    return cand.groupby("pbucket").map_groups(dedup, batch_format="pandas")


_SEMDEDUP_MAX_SUB = 4096  # gkey stride; must exceed the sub_k cap below


def semdedup(
    embeddings_ds,
    n_clusters: int = 16,
    threshold: float = 0.95,
    train_sample: int = 20000,
    seed: int = 42,
    batch_size: int = 4096,
    chunk: int = 2048,
    id_col: str = "vec_id",
    max_cluster_rows: int | None = None,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means partition + within-cluster exact cosine.

    1. spherical k-means centroids train on a bounded driver-side
       sample (:func:`_kmeans_lite`, same regime as ``ann_topk_ivf``);
    2. every vector gets its cluster in ONE broadcast-centroid matmul
       per batch — the corpus streams, nothing shuffles yet;
    3. one groupby co-locates each cluster; inside the group the
       pairwise cosine runs in row CHUNKS (``chunk`` x m matmuls, so a
       skewed cluster costs memory O(chunk * m), not O(m^2));
    4. above-threshold pairs close transitively with the same
       vectorized min-label propagation as the corpus dedup
       (:func:`dedup._local_cc` — a cluster group is already local);
       the component MIN id survives.

    Keep policy deviates from the paper (which keeps the exemplar with
    the LOWEST centroid similarity): min-id is deterministic under any
    partitioning, matching the repo-wide keep-first convention
    (reference features/postprocess.py:277-284 lifted to semantic
    groups).  Cross-cluster duplicates are missed by design — the
    k-means partition IS the approximation; scale ``n_clusters`` with
    the corpus (paper: ~sqrt(N) clusters) to bound cluster sizes.

    ``max_cluster_rows`` bounds the rows any single ``map_groups``
    worker must hold: clusters whose ESTIMATED size (sample fraction x
    corpus count — no extra corpus pass) exceeds the cap are sub-split
    by a second k-means trained on the sample's members of that
    cluster, and the groupby key becomes (cluster, sub) while the
    OUTPUT cluster id stays the coarse one.  Duplicates split across
    sub-clusters are missed — the same approximation the coarse
    partition already makes, now with a bounded per-worker footprint
    (the VERDICT r2 scale caveat).

    Returns survivors (id_col, cluster) — approximate (k-means
    assignment is not SQL-expressible), so rows-only at the driver
    gate; recall against the exact broadcast path is pytest-checked.
    """
    import ray

    from .dedup import _local_cc

    if max_cluster_rows:
        # three consumers ahead (count + train-sample filter, size
        # estimate, assign pass); pin blocks BEFORE the first or a lazy
        # upstream (embedding model, joins) re-executes per consumer —
        # the object store spills if the corpus exceeds memory, still
        # cheaper than recompute.  Without the cap the consumers are
        # count + sample + assign over what is typically a bare parquet
        # read: re-streaming the read twice beats pinning the corpus,
        # so no materialize — callers with an expensive lazy upstream
        # should pass it materialized.
        embeddings_ds = embeddings_ds.materialize()
    n_total = embeddings_ds.count()
    # hash-drawn, not a prefix: the per-cluster size ESTIMATE below
    # (sample fraction x corpus count) is only unbiased if the sample
    # is — a sorted corpus prefix would both skew the centroids and
    # undercount every cluster the prefix never reaches
    sample_tbl = _train_sample_df(
        embeddings_ds, train_sample, id_col=id_col, total=n_total
    )
    sample = np.asarray(sample_tbl["embedding"].tolist(), dtype=np.float64)
    cent = _kmeans_lite(sample, n_clusters, seed=seed)

    sub_cents: dict[int, np.ndarray] = {}
    if max_cluster_rows:
        sm = _normalize(sample)
        scl = np.argmax(sm @ cent.T, axis=1)
        frac = np.bincount(scl, minlength=len(cent)) / max(1, len(scl))
        est = frac * float(n_total)
        for c in np.nonzero(est > max_cluster_rows)[0]:
            members = sample[scl == c]
            # 2x headroom over the point estimate; stride-capped
            sub_k = int(
                min(
                    np.ceil(2.0 * est[c] / max_cluster_rows),
                    _SEMDEDUP_MAX_SUB - 1,
                )
            )
            if len(members) >= 2 and sub_k >= 2:
                sub_cents[int(c)] = _kmeans_lite(
                    members, sub_k, seed=seed + 1 + int(c)
                )
    cent_ref = ray.put((cent, sub_cents))

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # mirror the INPUT id type (an int32 id column hardcoded to
            # int64 here would make empty and non-empty blocks disagree
            # at the downstream groupby's schema unification)
            return pa.table(
                {id_col: batch[id_col],
                 "embedding": batch["embedding"],
                 "cluster": pa.array([], pa.int32()),
                 "gkey": pa.array([], pa.int64())}
            )
        cent, sub_cents = ray.get(cent_ref)
        m = _normalize(_mat(batch["embedding"]))
        cl = np.argmax(m @ cent.T, axis=1).astype(np.int32)
        gkey = cl.astype(np.int64) * _SEMDEDUP_MAX_SUB
        for c, sc in sub_cents.items():
            mask = cl == c
            if mask.any():
                gkey[mask] += np.argmax(m[mask] @ sc.T, axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "embedding": batch["embedding"],
                "cluster": pa.array(cl),
                "gkey": pa.array(gkey),
            }
        )

    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64)
        m = _normalize(
            np.asarray(np.stack(df["embedding"].to_numpy()), dtype=np.float64)
        )
        us, vs = [], []
        for s in range(0, len(m), chunk):
            sims = m[s : s + chunk] @ m.T  # (c, m)
            r, c = np.nonzero(sims > threshold)
            r = r + s
            keep = c > r  # upper triangle only
            us.append(r[keep])
            vs.append(c[keep])
        u = np.concatenate(us) if us else np.empty(0, np.int64)
        if len(u) == 0:
            out = df[[id_col]].copy()
            out["cluster"] = df["cluster"].to_numpy(np.int32)
            return out
        v = np.concatenate(vs)
        cc = _local_cc(
            pa.table({"u": pa.array(ids[u]), "v": pa.array(ids[v])})
        )
        drop = cc.filter(
            pc.not_equal(cc["doc_id"], cc["cluster_id"])
        )["doc_id"].to_numpy()
        keep_mask = ~np.isin(ids, drop)
        out = df.loc[keep_mask, [id_col]].copy()
        out["cluster"] = df["cluster"].to_numpy(np.int32)[keep_mask]
        return out

    assigned = embeddings_ds.map_batches(
        assign, batch_format="pyarrow", batch_size=batch_size
    )
    return assigned.groupby("gkey").map_groups(
        dedup_group, batch_format="pandas"
    )


def quantize_embeddings(emb_ds, scale: int = 1_000_000):
    """Per-dimension int8 affine quantization of the embedding table —
    the compression step a billion-vector ANN index applies before
    building (scalar-quantization flavor of PQ): output one exploded
    row per ``(vec_id, dim, code)`` with ``code in [0, 255]``.

    Exactness contract (the kg_entity_vecs fixed-point pattern): both
    engines first quantize ``qv = floor(float64(v) * scale)`` to exact
    int64, then ``code = (qv - lo_dim) * 255 // max(hi_dim - lo_dim,
    1)`` in pure integer arithmetic — no cross-engine float ulps
    anywhere past the one shared floor.

    Scale shape: ZERO exchanges.  Pass 1 folds per-batch per-dim
    (lo, hi) partials on the driver (bounded: dims x batches rows);
    the tiny per-dim range table rides the pass-2 closure and every
    batch emits its codes map-side."""

    def range_partial(batch: pa.Table) -> pa.Table:
        m = _mat(batch["embedding"])
        if m.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                }
            )
        q = np.floor(m * scale).astype(np.int64)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "lo": pa.array(q.min(axis=0)),
                "hi": pa.array(q.max(axis=0)),
            }
        )

    parts = emb_ds.map_batches(
        range_partial, batch_format="pyarrow"
    ).to_pandas()  # bounded: one row per (batch, dim)
    if len(parts) == 0 or "dim" not in parts.columns:  # empty shard set
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "code": pa.array([], pa.int64()),
                }
            )
        )
    g = parts.groupby("dim", sort=True).agg(lo=("lo", "min"), hi=("hi", "max"))
    lo = g["lo"].to_numpy(np.int64)
    span = np.maximum(g["hi"].to_numpy(np.int64) - lo, 1)

    def codes(batch: pa.Table) -> pa.Table:
        m = _mat(batch["embedding"])
        n, d = m.shape if m.size else (0, len(lo))
        if n == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "code": pa.array([], pa.int64()),
                }
            )
        q = np.floor(m * scale).astype(np.int64)
        c = (q - lo[None, :]) * 255 // span[None, :]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "code": pa.array(c.reshape(-1)),
            }
        )

    return emb_ds.map_batches(codes, batch_format="pyarrow")
