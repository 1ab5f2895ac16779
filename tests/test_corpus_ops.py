"""Corpus-curation operators: approximate-dedup quality vs the exact
oracle-checked baselines, plus unit contracts for the sketching
primitives.  (The exact ops are covered query-vs-oracle in
test_oracle.py; this file covers what SQL can't.)"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.pipelines import corpus as c
from information_extraction_t5_ray.stages import dedup as dd
from information_extraction_t5_ray.stages import textstats as ts

SF = "/root/testdata/sf0.001"


def _pairs(ds) -> set:
    df = ds.to_pandas()
    return set(zip(df["i"].astype(int), df["j"].astype(int)))


@pytest.fixture(scope="module")
def exact_jaccard_pairs(ray_session):
    return _pairs(c.q_jaccard_dupes(SF))


def test_minhash_recall_precision(ray_session, exact_jaccard_pairs):
    # the raw pair set (q_minhash_dupes now emits the planted-recall
    # projection; the full detector is still the first stage of it)
    got = _pairs(dd.minhash_lsh_pairs(c.dup_corpus(SF), k=c.JACCARD_K))
    truth = exact_jaccard_pairs
    assert truth, "constructed corpus must contain true near-dup pairs"
    recall = len(got & truth) / len(truth)
    precision = len(got & truth) / len(got) if got else 0.0
    assert recall >= 0.8, f"minhash recall {recall:.3f}"
    assert precision >= 0.8, f"minhash precision {precision:.3f}"


def test_simhash_finds_exact_copies(ray_session):
    got = _pairs(dd.simhash_pairs(c.dup_corpus(SF)))
    # every exact copy (hamming 0) must be found
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    expected = {(int(d), int(d) + c.EXACT_OFF) for d in ids if d % 3 == 0}
    assert expected <= got
    # and every reported pair truly has hamming <= 3 (verify is exact) —
    # spot-check a sample against a direct recomputation
    texts = {
        int(r["doc_id"]): r["text"]
        for r in c.dup_corpus(SF).take_all()
    }
    for i, j in list(sorted(got))[:50]:
        h = bin(dd.simhash64(texts[i]) ^ dd.simhash64(texts[j])).count("1")
        assert h <= 3, (i, j, h)


def test_rp_lsh_embedding_recall(ray_session):
    truth = _pairs(c.q_embedding_dupes(SF))
    got = _pairs(c.q_embedding_dupes_lsh(SF))
    assert truth, "constructed embedding corpus must contain copy pairs"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"rp-lsh recall {recall:.3f}"
    assert got <= truth | got  # no malformed ids
    # exact verify inside buckets => perfect precision
    assert got - truth == set(), "rp-lsh must not report sub-threshold pairs"


def test_minhash_signature_estimates_jaccard():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 1 << 62, size=200).astype(np.uint64)
    b = rng.randint(0, 1 << 62, size=100).astype(np.uint64)
    union = np.unique(np.concatenate([a, b[:50]]))
    setA = np.unique(np.concatenate([a, b[:50]]))
    setB = np.unique(np.concatenate([a[:100], b]))
    inter = len(np.intersect1d(setA, setB))
    true_j = inter / len(np.union1d(setA, setB))
    s1, s2 = dd._minhash_params(256)
    est = (
        dd.minhash_signature(setA, s1, s2) == dd.minhash_signature(setB, s1, s2)
    ).mean()
    assert abs(est - true_j) < 0.12, (est, true_j)


def test_shingle_hashes_contract():
    sh = ts.shingle_hashes("a b c d", k=3)
    assert len(sh) == 2  # 'a b c', 'b c d'
    assert len(ts.shingle_hashes("a b", k=3)) == 0
    # order-independence of the set + determinism
    assert (sh == ts.shingle_hashes("a b c d", k=3)).all()
    # truncation (the near-dup construction) keeps a prefix of shingles
    full = set(ts.shingle_hashes("w x y z p q r s", k=3).tolist())
    trunc = set(ts.shingle_hashes(c.truncate_words("w x y z p q r s"), k=3).tolist())
    assert trunc <= full and trunc


def test_winnow_sketch_robust_to_local_edit():
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "hazy", 1)
    a = set(ts.winnow_fingerprints(base))
    b = set(ts.winnow_fingerprints(edited))
    overlap = len(a & b) / len(a | b)
    assert overlap > 0.5, overlap


def test_simhash_near_for_similar_far_for_different():
    t1 = "alpha beta gamma delta epsilon zeta eta theta " * 4
    t2 = t1.replace("zeta", "zeta2")
    t3 = "completely different words entirely other content here now " * 4
    h = lambda a, b: bin(dd.simhash64(a) ^ dd.simhash64(b)).count("1")
    assert h(t1, t1) == 0
    assert h(t1, t2) <= 12
    assert h(t1, t3) > 12


def test_ann_topk_ivf_exact_at_full_probe(ray_session):
    """nprobe == n_clusters scores every (query, candidate) pair once —
    result must equal brute-force ann_topk row for row."""
    bf = c.q_ann_topk(SF).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    ivf = c.q_ann_topk_ivf(SF).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert bf.equals(ivf)


def test_ann_topk_ivf_pruned_recall(ray_session):
    """Real IVF operation (nprobe < n_clusters): bounded work, high
    recall@k vs brute force on the clustered synthetic embeddings."""
    from information_extraction_t5_ray.stages import similarity as sim
    import pyarrow.compute as pc

    ids, mat = c._query_vectors(SF)
    cands = c._read_embeddings(SF).map_batches(
        lambda b: b.filter(pc.greater_equal(b["vec_id"], c.ANN_NUM_QUERIES)),
        batch_format="pyarrow",
    )
    bf = c.q_ann_topk(SF).to_pandas()
    # the synthetic embeddings are near-isotropic — the WORST case for
    # IVF pruning (no cluster structure to exploit), so this bounds
    # recall from below; clustered real corpora do better at lower nprobe
    ivf = sim.ann_topk_ivf(
        cands, ids, mat, k=c.ANN_K, n_clusters=8, nprobe=6
    ).to_pandas()
    truth = set(zip(bf["query_id"], bf["neighbor_id"]))
    got = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    recall = len(got & truth) / len(truth)
    assert recall >= 0.85, f"ivf recall {recall:.3f}"


def test_kmeans_lite_deterministic_and_covering():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 16)
    from information_extraction_t5_ray.stages.similarity import _kmeans_lite

    c1 = _kmeans_lite(x, 8)
    c2 = _kmeans_lite(x, 8)
    assert np.array_equal(c1, c2), "same seed must give identical centroids"
    assert c1.shape == (8, 16)
    norms = np.linalg.norm(c1, axis=1)
    assert np.allclose(norms, 1.0), "spherical k-means centroids are unit-norm"


def test_group_pair_indices_property():
    """Randomized check of the shared pair-emission helper against a
    brute-force per-group reference (it backs jaccard, minhash, simhash
    and rp-lsh verification)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from information_extraction_t5_ray.stages.dedup import _group_pair_indices

    @settings(max_examples=200, deadline=None)
    @given(
        keys=st.lists(st.integers(min_value=-5, max_value=5), max_size=40),
        max_df=st.integers(min_value=2, max_value=8),
    )
    def check(keys, max_df):
        arr = np.array(keys, dtype=np.int64)
        order, li, ri = _group_pair_indices(arr, max_df)
        got = set()
        for a, b in zip(li, ri):
            # emitted indices point into the sorted order; map back to
            # original row ids and normalize the unordered pair
            x, y = int(order[a]), int(order[b])
            assert arr[x] == arr[y], "pair must share a key"
            got.add((min(x, y), max(x, y)))
        # brute force: all within-key pairs for keys with 2..max_df rows
        want = set()
        from collections import defaultdict

        rows = defaultdict(list)
        for i, k in enumerate(keys):
            rows[k].append(i)
        for k, idxs in rows.items():
            if 2 <= len(idxs) <= max_df:
                for i in range(len(idxs)):
                    for j in range(i + 1, len(idxs)):
                        want.add((idxs[i], idxs[j]))
        assert got == want

    check()


def test_hll_accuracy_and_merge_invariance(ray_session):
    """HLL estimate within 3 sigma of exact (sigma ~ 1.04/sqrt(4096));
    register merge must be partition-insensitive (max is commutative)."""
    import duckdb
    import ray.data as rd

    from information_extraction_t5_ray.stages.aggregates import (
        approx_distinct,
        hll_estimate,
        hll_register_batch,
    )

    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    est = approx_distinct(ev, "user_id")
    assert abs(est - exact) / exact < 3 * 1.04 / np.sqrt(4096), (est, exact)

    # split-merge == whole
    keys = np.arange(10_000, dtype=np.int64)
    whole = hll_register_batch(keys)
    merged = np.maximum(hll_register_batch(keys[:3000]), hll_register_batch(keys[3000:]))
    assert np.array_equal(whole, merged)
    assert abs(hll_estimate(whole) - 10_000) / 10_000 < 0.05


def test_export_shuffled_layout(ray_session, tmp_path):
    """Shuffled export: sharded directories, deterministic within-file
    order, exact row conservation."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import ray.data as rd

    from information_extraction_t5_ray.stages.sampling import export_shuffled

    docs = rd.from_items([{"doc_id": i, "text": f"t{i}"} for i in range(200)])
    out = export_shuffled(docs, "doc_id", str(tmp_path / "shards"), num_shards=4)
    data = pds.dataset(out, partitioning="hive")
    t = data.to_table()
    assert t.num_rows == 200
    assert sorted(t["doc_id"].to_pylist()) == list(range(200))
    assert set(t["shard"].to_pylist()) <= set(range(4))
    # determinism: a second export produces byte-identical shard contents
    out2 = export_shuffled(docs, "doc_id", str(tmp_path / "shards2"), num_shards=4)
    t2 = pds.dataset(out2, partitioning="hive").to_table()
    a = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = t2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_connected_components_chain_star_and_roots(ray_session):
    """Transitive closure the pair detectors cannot express: a chain
    A~B~C~D must collapse to one cluster even though (A,C) (A,D) (B,D)
    pair rows never exist; roots and multi-bucket components must emit
    exactly once."""
    import pandas as pd
    import ray.data as rd

    pairs = pd.DataFrame(
        {"i": [1, 2, 3, 10, 20, 20], "j": [2, 3, 4, 11, 21, 22]}
    )
    out = dd.connected_components(rd.from_pandas(pairs)).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}
    assert len(out) == len(out["doc_id"].unique())

    # worst-case diameter: a 100-node path converges (O(log^2 n) rounds)
    chain = pd.DataFrame({"i": range(99), "j": range(1, 100)})
    out2 = dd.connected_components(rd.from_pandas(chain)).to_pandas()
    assert set(out2["cluster_id"]) == {0} and len(out2) == 100


def test_apply_dedup_clusters_transitive_keep_first(ray_session):
    import pandas as pd
    import ray.data as rd

    pairs = rd.from_pandas(
        pd.DataFrame({"i": [1, 2, 3, 10, 20, 20], "j": [2, 3, 4, 11, 21, 22]})
    )
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 10, 11, 50], "text": ["x"] * 7})
    )
    kept = dd.apply_dedup_clusters(docs, pairs, num_partitions=4).to_pandas()
    # pairwise apply_dedup would KEEP 3 (no pair ties it to a smaller id
    # as the j member of (i<j) ... it does: (2,3) drops 3) — the chain
    # case where they differ is (1,2),(2,3): pairwise drops {2,3},
    # transitive also drops both; the real difference shows on e.g.
    # (5,6),(4,6): pairwise keeps 5 (only j=6 dropped), transitive
    # keeps only 4.
    assert sorted(kept["doc_id"]) == [1, 10, 50]

    pairs2 = rd.from_pandas(pd.DataFrame({"i": [5, 4], "j": [6, 6]}))
    docs2 = rd.from_pandas(pd.DataFrame({"doc_id": [4, 5, 6], "text": ["y"] * 3}))
    kept_pair = dd.apply_dedup(docs2, pairs2, num_partitions=4).to_pandas()
    kept_tc = dd.apply_dedup_clusters(docs2, pairs2, num_partitions=4).to_pandas()
    assert sorted(kept_pair["doc_id"]) == [4, 5]  # pairwise misses 5~4
    assert sorted(kept_tc["doc_id"]) == [4]  # transitive closes the chain


def test_jaccard_verified_exact_under_tiny_cap(ray_session):
    """The verified path must equal brute-force TRUE Jaccard even when
    the df cap drops every boilerplate shingle — including pairs whose
    ONLY shared shingles are stop-set members (the heavy-doc pass)."""
    import itertools

    import pandas as pd
    import ray.data as rd

    rng = np.random.RandomState(0)
    words = [f"w{i}" for i in range(400)]
    template = " ".join(words[:40])
    docs = []
    for d in range(120):
        uniq = " ".join(rng.choice(words[40:], size=30, replace=False))
        docs.append((d, template + " " + uniq))
    for d in range(0, 120, 4):  # near-dups: 5 words changed
        w = docs[d][1].split()
        for p in rng.choice(len(w), 5, replace=False):
            w[p] = "z" + w[p]
        docs.append((d + 1000, " ".join(w)))
    df = pd.DataFrame(docs, columns=["doc_id", "text"])

    sets = {d: set(ts.shingle_hashes(t, 3)) for d, t in zip(df.doc_id, df.text)}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if 3 * inter >= len(sets[a]) + len(sets[b]):
            want.add((a, b))
    assert want  # the fixture must contain true pairs

    def pairset(d):
        p = d.to_pandas()
        return (set(map(tuple, p[["i", "j"]].itertuples(index=False)))
                if "i" in p.columns else set())

    ds = rd.from_pandas(df)
    got_plain = pairset(dd.jaccard_pairs(ds, max_df=8))
    got_ver = pairset(dd.jaccard_pairs_verified(ds, max_df=8))
    assert got_plain != want  # cap=8 cripples the plain path here...
    assert got_ver == want  # ...and the verified path still lands exact


def test_jaccard_verified_heavy_only_pairs(ray_session):
    """Docs similar ONLY through over-cap shingles: zero kept overlap,
    so passes 2-3 are blind and only the heavy all-pairs sees them."""
    import pandas as pd
    import ray.data as rd

    shared = " ".join(f"s{i}" for i in range(60))
    docs = []
    # 20 docs = same shared block + 3 unique words -> every shared
    # shingle has df=20 > cap=4; each true pair overlaps only there
    for d in range(20):
        docs.append((d, shared + f" u{d}a u{d}b u{d}c"))
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = dd.jaccard_pairs_verified(ds, max_df=4).to_pandas()
    assert len(got) == 20 * 19 // 2  # all pairs are true dups (J ~ 0.9)
    plain = dd.jaccard_pairs(ds, max_df=4).to_pandas()
    assert len(plain) == 0 or "i" not in plain.columns


def test_exact_dedup_keep_carries_min_row(ray_session):
    """exact_dedup_keep must keep the MIN-doc_id representative with its
    text and the full group count, across batch boundaries."""
    import ray.data as rd

    rows = (
        [{"doc_id": 100 + i, "text": "alpha beta gamma"} for i in range(3)]
        + [{"doc_id": 7, "text": "alpha beta gamma"}]
        + [{"doc_id": 1, "text": "unique content"}]
    )
    ds = rd.from_items(rows).repartition(4)  # force cross-batch folding
    out = dd.exact_dedup_keep(ds).to_pandas().sort_values("doc_id")
    got = {
        (r.doc_id, r.text, r.n_exact_dups)
        for r in out.itertuples(index=False)
    }
    assert got == {
        (1, "unique content", 1),
        (7, "alpha beta gamma", 4),
    }


def test_line_dedup_keeps_first_occurrence_across_docs(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": "shared header\nunique one\n\nshared footer"},
        {"doc_id": 2, "text": "shared header\nunique two\nshared footer"},
        {"doc_id": 3, "text": "shared header\nshared footer"},
    ]
    out = (
        dd.line_dedup(rd.from_items(rows).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1 keeps everything (empty line dropped); docs 2/3 lose the
    # lines doc 1 already claimed
    assert out.loc[1, "text"] == "shared header\nunique one\nshared footer"
    assert out.loc[2, "text"] == "unique two"
    assert list(out.index) == [1, 2]  # doc 3 fully deduplicated away
    assert out["n_lines"].tolist() == [3, 1]


def test_decontamination_flags_planted_overlap(ray_session):
    import ray
    import ray.data as rd

    bench_text = "the quick brown fox jumps over the lazy dog tonight " * 3
    n = 8
    bench = rd.from_items([{"doc_id": 0, "text": bench_text}])
    index_ref = ray.put(dd.bench_ngram_index(bench, n=n))
    toks = bench_text.split()
    planted = "clean prefix words here " + " ".join(toks[:n]) + " clean suffix"
    train = rd.from_items(
        [
            {"doc_id": 10, "text": planted},
            {"doc_id": 11, "text": "completely unrelated content " * 5},
            {"doc_id": 12, "text": " ".join(toks[: n - 1])},  # n-1 gram only
        ]
    )
    out = (
        dd.contamination_flags(train, index_ref, n=n)
        .to_pandas()
        .set_index("doc_id")["contaminated"]
        .sort_index()
    )
    assert out.to_dict() == {10: 1, 11: 0, 12: 0}


def test_rep_signals_hand_computed(ray_session):
    import ray.data as rd

    rows = [
        # 4 non-empty lines, "dup" twice (3 dup'd chars of 3+3+11+1=18);
        # tokens: dup dup hello there x -> top word "dup" 2/5; the 4
        # bigrams (dup dup)(dup hello)(hello there)(there x) are all
        # distinct -> top 1/4
        {"doc_id": 0, "text": "dup\ndup\nhello there\n\nx"},
        {"doc_id": 1, "text": ""},  # empty doc -> all zeros
        {"doc_id": 2, "text": "a b a b a"},  # top word a: 3/5; bigram
        # stream: (a b)(b a)(a b)(b a) -> top 2/4
    ]
    out = (
        ts.rep_signals_stage(rd.from_items(rows).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "dup_line_frac"] == pytest.approx(1 / 4)
    assert out.loc[0, "dup_line_char_frac"] == pytest.approx(3 / 18)
    assert out.loc[0, "top_word_frac"] == pytest.approx(2 / 5)
    assert out.loc[0, "top_bigram_frac"] == pytest.approx(1 / 4)
    assert out.loc[1].tolist() == [0.0, 0.0, 0.0, 0.0]
    assert out.loc[2, "dup_line_frac"] == pytest.approx(0.0)
    assert out.loc[2, "top_word_frac"] == pytest.approx(3 / 5)
    assert out.loc[2, "top_bigram_frac"] == pytest.approx(2 / 4)


def test_lm_score_planted_frequencies(ray_session):
    import ray
    import ray.data as rd

    # "the cat" 6x and "cat sat" 5x clear min_count 4; bigrams of the
    # two tail docs stay rare
    rows = [{"doc_id": i, "text": "the cat sat"} for i in range(5)]
    rows.append({"doc_id": 99, "text": "the cat zzz unique"})
    rows.append({"doc_id": 100, "text": "solo"})  # no bigrams
    ds = rd.from_items(rows).repartition(3)
    lm = ts.frequent_ngrams(ds, n=2, min_count=4).to_pandas()
    assert dict(zip(lm["ngram"], lm["cnt"])) == {"the cat": 6, "cat sat": 5}
    out = (
        ts.lm_score(ds, ray.put(lm), n=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0: bigrams (the cat)(cat sat) -> sum 6+5, nb 2, oov 0
    assert out.loc[0, "n_bigrams"] == 2
    assert out.loc[0, "sum_freq"] == 11
    assert out.loc[0, "lm_score"] == pytest.approx(5.5)
    assert out.loc[0, "oov_frac"] == pytest.approx(0.0)
    # doc 99: 3 bigrams, one known
    assert out.loc[99, "n_bigrams"] == 3
    assert out.loc[99, "sum_freq"] == 6
    assert out.loc[99, "oov_frac"] == pytest.approx(2 / 3)
    # doc 100: no bigrams -> zeros
    assert out.loc[100].tolist() == [0, 0, 0.0, 0.0]


def test_semdedup_removes_planted_exact_copies(ray_session):
    from information_extraction_t5_ray.stages import similarity as sim

    sf = "/root/testdata/sf0.001"
    corpus = c.emb_corpus(sf)
    n_total = corpus.count()
    out = sim.semdedup(corpus, n_clusters=16, threshold=0.999).to_pandas()
    ids = set(out["vec_id"])
    # every planted exact copy (vec_id + EMB_OFF) must lose to its
    # original: identical vectors always land in the same cluster
    planted = [i for i in ids if i >= c.EMB_OFF]
    assert planted == []
    assert 0 < len(ids) < n_total
    # one survivor per duplicate group: each planted copy removes
    # exactly one row, and survivors are unique ids
    assert len(out) == len(ids)


def test_semdedup_keeps_min_id_per_duplicate_group(ray_session):
    import ray.data as rd
    from information_extraction_t5_ray.stages import similarity as sim

    rng = np.random.RandomState(7)
    base = rng.randn(40, 8)
    rows = [
        {"vec_id": i, "embedding": base[i % 40].tolist()} for i in range(120)
    ]  # every vector appears 3x: ids i, i+40, i+80 identical
    out = sim.semdedup(
        rd.from_items(rows).repartition(4), n_clusters=4, threshold=0.999
    ).to_pandas()
    assert sorted(out["vec_id"]) == list(range(40))


def test_semdedup_cluster_cap_subsplits_hot_cluster(ray_session):
    """Forced 1-cluster config + a row cap: the sub-split must bound
    per-group size while still collapsing planted exact duplicates
    (identical vectors share an argmax, so they land in the same
    sub-cluster by construction)."""
    import ray.data as rd
    from information_extraction_t5_ray.stages import similarity as sim

    rng = np.random.RandomState(11)
    base = rng.randn(60, 8)
    rows = [
        {"vec_id": i, "embedding": base[i % 60].tolist()} for i in range(180)
    ]  # every vector appears 3x
    ds = rd.from_items(rows).repartition(4)
    out = sim.semdedup(
        ds, n_clusters=1, threshold=0.999, max_cluster_rows=30
    ).to_pandas()
    assert sorted(out["vec_id"]) == list(range(60))
    # coarse cluster id is preserved in the output even though the
    # groupby ran on sub-split keys
    assert set(out["cluster"]) == {0}


def test_incremental_dedup_drops_snapshot_content(ray_session):
    import ray.data as rd

    snapshot = rd.from_items(
        [
            {"doc_id": 1, "text": "known content one"},
            {"doc_id": 2, "text": "known content two"},
        ]
    )
    incoming = rd.from_items(
        [
            {"doc_id": 10, "text": "known content one"},  # dup of snapshot
            {"doc_id": 11, "text": "brand new content"},
            {"doc_id": 12, "text": "known content two"},  # dup of snapshot
            {"doc_id": 13, "text": "brand new content"},  # new, but dup of 11
        ]
    )
    out = dd.incremental_dedup(incoming, snapshot).to_pandas()
    # snapshot content is dropped; in-batch dups of NEW content are NOT
    # (incremental dedup only guards against the snapshot — compose
    # exact_dedup on the survivors for within-crawl dedup)
    assert sorted(out["doc_id"]) == [11, 13]


def test_length_histogram_buckets(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": "a b c"},  # 3 tokens -> bucket 0
        {"doc_id": 1, "text": " ".join(["w"] * 64)},  # 64 -> bucket 64
        {"doc_id": 2, "text": " ".join(["w"] * 65)},  # 65 -> bucket 64
        {"doc_id": 3, "text": ""},  # 0 tokens -> bucket 0
        {"doc_id": 4, "text": " ".join(["w"] * 130)},  # -> bucket 128
    ]
    out = (
        ts.length_histogram(rd.from_items(rows).repartition(3))
        .to_pandas()
        .set_index("bucket_lo")["n_docs"]
        .sort_index()
    )
    assert out.to_dict() == {0: 2, 64: 2, 128: 1}


def test_pack_sequences_hand_computed(ray_session):
    import ray.data as rd
    from information_extraction_t5_ray.stages.packing import pack_sequences

    # token counts: 3, 4, 2, 5 in doc_id order; budget 6
    # exclusive starts: 0, 3, 7, 9 -> packs 0, 0, 1, 1; offs 0, 3, 1, 3
    rows = [
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": "d e f g"},
        {"doc_id": 2, "text": "h i"},
        {"doc_id": 3, "text": "j k l m n"},
    ]
    out = (
        pack_sequences(rd.from_items(rows).repartition(3), budget=6,
                       num_ranges=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["pack_id"].tolist() == [0, 0, 1, 1]
    assert out["pack_off"].tolist() == [0, 3, 1, 3]
    assert out["n_tokens"].tolist() == [3, 4, 2, 5]


def test_pack_sequences_partition_invariance(ray_session):
    import ray.data as rd
    from information_extraction_t5_ray.stages.packing import pack_sequences

    rng = np.random.RandomState(3)
    rows = [
        {"doc_id": int(i), "text": " ".join(["w"] * int(rng.randint(1, 30)))}
        for i in range(200)
    ]
    a = (
        pack_sequences(rd.from_items(rows).repartition(2), budget=64,
                       num_ranges=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        pack_sequences(rd.from_items(rows).repartition(16), budget=64,
                       num_ranges=11)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b), "pack assignment must not depend on partitioning"
    # every pack except the last is fully covered by construction
    starts = (a["pack_id"] * 64 + a["pack_off"]).to_numpy()
    assert (np.diff(starts) == a["n_tokens"].to_numpy()[:-1]).all()


def test_apply_dedup_clusters_empty_pairs_passthrough(ray_session):
    import ray.data as rd

    docs = rd.from_items(
        [{"doc_id": i, "text": f"unique {i}"} for i in range(5)]
    )
    pairs = rd.from_items([{"i": 1, "j": 2}]).filter(lambda r: False)
    out = dd.apply_dedup_clusters(docs, pairs).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3, 4]
    assert len(dd.connected_components(pairs).to_pandas()) == 0


def test_pii_redact_planted(ray_session):
    import ray.data as rd

    rows = [
        {
            "doc_id": 0,
            "text": "mail a.b+c@exa-mple.co.uk now, or call +1 (415) 555-0134"
            " from 192.168.001.1 please",
        },
        {"doc_id": 1, "text": "no pii here at all"},
    ]
    out = (
        ts.pii_redact_stage(rd.from_items(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    r = out.loc[0, "redacted"]
    assert "<EMAIL>" in r and "<IP>" in r and "<PHONE>" in r
    assert "exa-mple" not in r and "192.168" not in r and "555-0134" not in r
    assert out.loc[0, ["n_emails", "n_ips"]].tolist() == [1, 1]
    assert out.loc[0, "n_phones"] >= 1
    assert out.loc[1, "redacted"] == "no pii here at all"
    assert out.loc[1, ["n_emails", "n_ips", "n_phones"]].tolist() == [0, 0, 0]


def test_data_mixture_token_distribution(ray_session):
    """Surviving token mass must track the 50/30/20 target and the
    binding tier must keep (almost) everything."""
    import ray.data as rd
    from information_extraction_t5_ray.stages.sampling import data_mixture

    rng = np.random.RandomState(1)
    # tier token masses wildly off-target: t0 scarce, t2 abundant
    rows = []
    for i in range(3000):
        tier = 0 if i % 10 == 0 else (1 if i % 10 in (1, 2, 3) else 2)
        rows.append(
            {
                "doc_id": i,
                "source": f"src{tier}",
                "text": " ".join(["w"] * int(rng.randint(5, 40))),
            }
        )
    ds = rd.from_items(rows).repartition(5)

    def tier_of(col):
        return np.array([int(s[3:]) for s in col.to_pylist()], np.int32)

    out = data_mixture(ds, tier_of, {0: 500, 1: 300, 2: 200}).to_pandas()
    got = out.groupby("tier")["n_tokens"].sum()
    total = got.sum()
    fracs = (got / total).to_dict()
    assert abs(fracs[0] - 0.5) < 0.03, fracs
    assert abs(fracs[1] - 0.3) < 0.03, fracs
    assert abs(fracs[2] - 0.2) < 0.03, fracs
    # binding tier (0, the scarce one) keeps ~all its docs
    n0_in = sum(1 for r in rows if r["source"] == "src0")
    n0_out = (out["tier"] == 0).sum()
    assert n0_out / n0_in > 0.97
    # determinism under different partitioning
    out2 = data_mixture(
        rd.from_items(rows).repartition(13), tier_of, {0: 500, 1: 300, 2: 200}
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_local_cc_random_graphs_property():
    """_local_cc (the single-task CC fast path behind dedup_clusters,
    dedup_apply_tc, curate_corpus and semdedup groups) vs a plain
    union-find reference on random graphs."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from information_extraction_t5_ray.stages.dedup import _local_cc

    def uf_components(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            parent[find(u)] = find(v)
        return {n: min(m for m in parent if find(m) == find(n)) for n in parent}

    @settings(max_examples=150, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=25),
                st.integers(min_value=0, max_value=25),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def check(edges):
        t = pa.table(
            {
                "u": pa.array([u for u, _ in edges], pa.int64()),
                "v": pa.array([v for _, v in edges], pa.int64()),
            }
        )
        got = _local_cc(t).to_pandas()
        want = uf_components(edges)
        assert dict(zip(got["doc_id"], got["cluster_id"])) == want

    check()


def test_batch_word_ngrams_random_property():
    """batch_word_ngrams (behind decontaminate, lm_score, top_ngrams)
    vs brute-force per-doc n-gram enumeration."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from information_extraction_t5_ray.stages.textstats import batch_word_ngrams

    word = st.text(alphabet="abxy", min_size=1, max_size=3)
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=150, deadline=None)
    @given(docs=st.lists(doc, min_size=1, max_size=6),
           n=st.integers(min_value=2, max_value=4))
    def check(docs, n):
        batch = pa.table(
            {"doc_id": list(range(len(docs))), "text": docs}
        )
        d, h, g = batch_word_ngrams(batch, n)
        got = list(zip(d.tolist(), g.to_pylist()))
        want = []
        for i, t in enumerate(docs):
            w = t.split()
            want += [
                (i, " ".join(w[j : j + n])) for j in range(len(w) - n + 1)
            ]
        assert got == want
        assert len(h) == len(want)

    check()


def test_boilerplate_strip_removes_high_df_lines(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": "COOKIE BANNER\nunique one"},
        {"doc_id": 2, "text": "COOKIE BANNER\nunique two\nshared pair"},
        {"doc_id": 3, "text": "COOKIE BANNER\nshared pair"},
        {"doc_id": 4, "text": "COOKIE BANNER"},  # only boilerplate
    ]
    out = (
        dd.boilerplate_strip(rd.from_items(rows).repartition(3), max_df=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # banner (df=4) gone everywhere; 'shared pair' (df=2) kept in BOTH
    assert out.loc[1, "text"] == "unique one"
    assert out.loc[2, "text"] == "unique two\nshared pair"
    assert out.loc[3, "text"] == "shared pair"
    assert 4 not in out.index  # fully boilerplate doc vanishes
    # df counts DISTINCT docs: a line repeated in one doc is not pushed
    # over the threshold
    rows2 = [
        {"doc_id": 1, "text": "rep\nrep\nrep\nkeep me"},
        {"doc_id": 2, "text": "rep"},
    ]
    out2 = (
        dd.boilerplate_strip(rd.from_items(rows2), max_df=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out2.loc[1, "text"] == "rep\nrep\nrep\nkeep me"


def test_data_mixture_unknown_tier_dropped(ray_session):
    import ray.data as rd
    from information_extraction_t5_ray.stages.sampling import data_mixture

    rows = [
        {"doc_id": i, "source": f"src{i % 4}", "text": "w " * 20}
        for i in range(200)
    ]

    def tier_of(col):
        return np.array([int(s[3:]) for s in col.to_pylist()], np.int32)

    # weights only cover tiers 0-2; tier 3 must be dropped, not crash
    out = data_mixture(
        rd.from_items(rows).repartition(4), tier_of, {0: 500, 1: 300, 2: 200}
    ).to_pandas()
    assert (out["tier"] != 3).all()
    assert len(out) > 0


def test_pack_texts_exact_budget_windows(ray_session):
    import ray.data as rd
    from information_extraction_t5_ray.stages.packing import pack_texts

    # global stream: doc0 = w0..w4, doc1 = w5..w12, doc2 = w13 (budget 6)
    rows = [
        {"doc_id": 0, "text": "w0 w1 w2 w3 w4"},
        {"doc_id": 1, "text": "w5 w6 w7 w8 w9 w10 w11 w12"},
        {"doc_id": 2, "text": "w13"},
    ]
    out = (
        pack_texts(rd.from_items(rows).repartition(2), budget=6, num_ranges=2)
        .to_pandas()
        .set_index("pack_id")
        .sort_index()
    )
    assert out.loc[0, "text"] == "w0 w1 w2 w3 w4 w5"  # doc1 split mid-doc
    assert out.loc[1, "text"] == "w6 w7 w8 w9 w10 w11"
    assert out.loc[2, "text"] == "w12 w13"
    assert out["n_tokens"].tolist() == [6, 6, 2]  # full budget except last


def test_grouped_approx_distinct_within_3_sigma(ray_session):
    """The query now emits (exact_users, hll_within_2pct) per group —
    exact counts must match DuckDB and every tolerance flag must hold
    (the underlying HLL estimate also re-checked at 3 sigma)."""
    import duckdb

    from information_extraction_t5_ray.stages.aggregates import (
        grouped_approx_distinct,
    )
    from information_extraction_t5_ray.pipelines.corpus import _read_pq

    sf = "/root/testdata/sf0.01"
    got = c.q_approx_users_by_type(sf).set_index("event_type")
    want = (
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) n FROM "
            f"read_parquet('{sf}/events.parquet') GROUP BY event_type"
        )
        .df()
        .set_index("event_type")["n"]
    )
    assert set(got.index) == set(want.index)
    assert got["hll_within_2pct"].all()
    est = (
        grouped_approx_distinct(
            _read_pq(
                f"{sf}/events.parquet", columns=["event_type", "user_id"]
            ),
            "event_type",
            "user_id",
        )
        .to_pandas()
        .set_index("event_type")["approx_distinct"]
    )
    for et in want.index:
        n = want[et]
        assert got.loc[et, "exact_users"] == n
        sigma = 1.04 / np.sqrt(4096) * n  # HLL std error at p=12
        assert abs(est[et] - n) <= 3 * sigma + 2, (et, est[et], n)


def test_pack_texts_unicode_whitespace_consistency(ray_session):
    """The pack offsets come from the RE2 \\S+ count; the text split
    must use the SAME tokenizer — \\xa0 (NBSP) is NOT whitespace for
    RE2 but IS for Python str.split(), which silently shifted packs."""
    import duckdb
    import ray.data as rd
    from information_extraction_t5_ray.stages.packing import pack_texts

    rows = [
        {"doc_id": 0, "text": "a\xa0b c"},      # RE2: 2 tokens
        {"doc_id": 1, "text": "d e f g h"},     # 5 tokens
        {"doc_id": 2, "text": "i\x0bj k l"},    # RE2: \x0b not ws -> 3
    ]
    out = (
        pack_texts(rd.from_items(rows), budget=4)
        .to_pandas()
        .sort_values("pack_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents_df", __import__("pandas").DataFrame(rows))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_df")
    import __ray_entry__ as em

    sql = em.oracle_sql()["pack_texts"].replace("// 512", "// 4").replace(
        "* 512", "* 4").replace("(p + 1) * 4 - strt", "(p + 1) * 4 - strt")
    want = con.execute(sql).df().sort_values("pack_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # every pack but the last exactly 4 tokens under the RE2 count
    assert out["n_tokens"].tolist()[:-1] == [4] * (len(out) - 1)


def test_simhash64_batch_equals_scalar_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcxyz", min_size=1, max_size=5)
    doc = st.lists(word, min_size=0, max_size=25).map(" ".join)

    @settings(max_examples=150, deadline=None)
    @given(docs=st.lists(doc, min_size=1, max_size=8))
    def check(docs):
        got = dd.simhash64_batch(docs)
        want = np.array([dd.simhash64(t) for t in docs], dtype=np.uint64)
        assert np.array_equal(got, want), (docs, got, want)

    check()


def test_jaccard_corpus_relative_cap_recovers_uniform_duplication(ray_session):
    """The fixed max_df cap's documented failure: at heavy uniform
    duplication every shingle's df exceeds it and recall drops to zero.
    The opt-in corpus-relative cap scales with the corpus and recovers
    the pairs."""
    import ray.data as rd

    # 30 distinct docs, each duplicated 8x -> every shingle df >= 8
    rows = []
    for i in range(30):
        base = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        for r in range(8):
            rows.append({"doc_id": i * 100 + r, "text": base})
    ds = rd.from_items(rows).repartition(4)
    fixed = dd.jaccard_pairs(ds, k=3, max_df=4).count()
    assert fixed == 0, "fixed cap must exhibit the documented recall cliff"
    scaled = dd.jaccard_pairs(ds, k=3, max_df=4, max_df_frac=0.05).count()
    # every duplicate group contributes C(8,2)=28 pairs
    assert scaled == 30 * 28


def test_grouped_quantiles_decimal_exact_ranks(ray_session):
    """q*n integral-in-decimal but inexact-in-binary (0.28*25): float
    ceil picks rank 8, DuckDB's DECIMAL arithmetic picks 7 — the
    operator must match DuckDB."""
    import duckdb
    import pandas as pd
    import ray.data as rd
    from information_extraction_t5_ray.stages.aggregates import (
        grouped_quantiles_counting,
    )

    rng = np.random.RandomState(5)
    frames = []
    for g, n in [(0, 25), (1, 50), (2, 100), (3, 37)]:
        frames.append(pd.DataFrame({"k": g, "v": rng.randint(0, 30, n)}))
    df = pd.concat(frames, ignore_index=True)
    got = (
        grouped_quantiles_counting(
            rd.from_pandas(df).repartition(5), "k", "v",
            {"q07": 0.07, "q28": 0.28, "q14": 0.14, "q95": 0.95},
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    con = duckdb.connect(); con.register("t", df)
    want = con.execute(
        "SELECT k, quantile_disc(v, 0.07) q07, quantile_disc(v, 0.28) q28, "
        "quantile_disc(v, 0.14) q14, quantile_disc(v, 0.95) q95 "
        "FROM t GROUP BY k ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_similarity_stages_survive_empty_blocks(ray_session):
    """An upstream filter that empties a block must not kill the map
    task (_mat can't infer dim from an empty batch)."""
    import ray.data as rd
    from information_extraction_t5_ray.stages import similarity as sim

    rng = np.random.RandomState(2)
    rows = [
        {"vec_id": i, "embedding": rng.randn(8).tolist()} for i in range(40)
    ]
    # repartition so some blocks empty out entirely after the filter
    ds = rd.from_items(rows).repartition(8).filter(
        lambda r: r["vec_id"] < 5
    )
    ids = np.arange(3)
    mat = np.stack([rows[i]["embedding"] for i in range(3)])
    assert sim.ann_topk(ds, ids, mat, k=2).count() > 0
    assert sim.ann_topk_ivf(ds, ids, mat, k=2, n_clusters=2, nprobe=2).count() > 0
    sim.cosine_dup_pairs(ds, ids, mat, threshold=0.99).count()
    sim.rp_lsh_dup_pairs(ds, threshold=0.99).count()
    sim.semdedup(ds, n_clusters=2, threshold=0.999).count()


def test_temporal_stages_reject_reserved_bucket_column(ray_session):
    import ray.data as rd
    from information_extraction_t5_ray.stages.temporal import sessionize

    ds = rd.from_items(
        [{"user_id": 1, "ts": 10, "_bucket": 9}]
    )
    with pytest.raises(Exception, match="reserved"):
        sessionize(ds, key="user_id", ts_col="ts", gap=5).count()


def test_dedup_index_null_text_passthrough(ray_session):
    import ray.data as rd
    from information_extraction_t5_ray.state.dedup_index import (
        ShardedDedupIndex,
    )

    idx = ShardedDedupIndex(num_shards=2)
    out = idx.filter_new(
        rd.from_items(
            [
                {"doc_id": 1, "text": "real"},
                {"doc_id": 2, "text": None},
                {"doc_id": 3, "text": "real"},  # dup of 1
                {"doc_id": 4, "text": None},  # nulls never dedup
            ]
        )
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 4]
    assert idx.size() == 1  # nulls never touched the index


def test_minhash_rejects_degenerate_band_config(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from information_extraction_t5_ray.stages.dedup import minhash_lsh_pairs

    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["a b c", "a b d"]})
    )
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(ds, num_perm=64, bands=128)  # rows would be 0
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(ds, num_perm=64, bands=48)  # remainder dropped


def test_heavy_hitters_exact_and_batch_invariant(ray_session):
    """Planted heavy hitter: the two-pass candidate/verify shape must
    return EXACT counts with a strict cnt*k > N threshold, identically
    at any batch size (the candidate superset guarantee)."""
    import pyarrow as pa
    import ray.data as rd

    # 60 docs; "hot" appears twice per doc (120), "warm" once per doc
    # (60), fillers unique per doc (2 each).  N = 60*5 = 300 tokens.
    docs = [
        {"doc_id": i, "text": f"hot hot warm u{i}a u{i}b"} for i in range(60)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
                "text": pa.array([d["text"] for d in docs], pa.string()),
            }
        )
    )
    # k=4: threshold N/k = 75 -> only "hot" (120) qualifies; "warm"
    # (60) misses; at k=5 the threshold is 60 and warm STILL misses
    # (strict >), proving threshold semantics
    for bs in (2048, 7):
        got = (
            ts.heavy_hitters(ds, k=4, batch_size=bs)
            .to_pandas()
            .sort_values("token")
            .reset_index(drop=True)
        )
        assert got["token"].tolist() == ["hot"], bs
        assert got["cnt"].tolist() == [120], bs
    k5 = ts.heavy_hitters(ds, k=5).to_pandas()
    assert sorted(k5["token"]) == ["hot"]  # strict >: 60*5 == 300 fails
    # k=6: threshold 50 -> warm (60) now qualifies
    k6 = ts.heavy_hitters(ds, k=6).to_pandas()
    assert sorted(k6["token"]) == ["hot", "warm"]


def test_cms_heavy_hitters_tolerance_and_invariance(ray_session):
    """The CMS cross-validation must carry the exact counts, flag every
    hitter within tolerance at a sane width, stay invariant to batch
    size (order-free counter merge), and its min-row estimate must be
    reproducible from _cms_positions by hand."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    docs = [
        {"doc_id": i, "text": f"hot hot warm u{i}a u{i}b"} for i in range(60)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
                "text": pa.array([d["text"] for d in docs], pa.string()),
            }
        )
    )
    for bs in (2048, 7):
        got = (
            ts.cms_heavy_hitters(ds, k=6, batch_size=bs)
            .to_pandas()
            .sort_values("token")
            .reset_index(drop=True)
        )
        assert got["token"].tolist() == ["hot", "warm"], bs
        assert got["cnt"].tolist() == [120, 60], bs
        assert got["cms_within_tol"].all(), bs
    # hand-check the estimate: one row, tiny width forces collisions —
    # est = min over rows of the exact cell sums, always >= true cnt
    toks = []
    for d in docs:
        toks.extend(d["text"].split())
    vals, cnt = np.unique(np.asarray(toks, dtype=str), return_counts=True)
    for width, depth in ((4, 1), (8192, 4)):
        pos = ts._cms_positions(vals, depth, width)
        counters = np.zeros((depth, width), dtype=np.int64)
        for i in range(depth):
            np.add.at(counters[i], pos[i], cnt)
        hot = np.where(vals == "hot")[0][0]
        est = counters[np.arange(depth), pos[:, hot]].min()
        assert est >= 120
        got = ts.cms_heavy_hitters(ds, k=6, width=width, depth=depth)
        df = got.to_pandas().set_index("token")
        # the flag definition: est <= cnt + max(1, 4N//width)
        tol = max(1, (4 * len(toks)) // width)
        assert df.loc["hot", "cms_within_tol"] == (est <= 120 + tol)


def test_dup_spans_apply_planted(ray_session):
    """Removal contract: the shared 8-gram vanishes from BOTH docs
    (all occurrences go), the fully-self-duplicated doc collapses to
    '', the clean doc survives whitespace-normalized, and batch size
    must not change anything."""
    import pyarrow as pa
    import ray.data as rd

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = [
        {"doc_id": 1, "text": f"u1a u1b {shared} u1c u1d"},
        {"doc_id": 2, "text": f"u2a {shared}  u2b u2c u2d"},  # 2 spaces
        {"doc_id": 3, "text": " ".join([f"x{i}" for i in range(1, 9)] * 2)},
        {"doc_id": 4, "text": "only unique words here nothing repeats at all"},
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
                "text": pa.array([d["text"] for d in docs], pa.string()),
            }
        )
    )
    for bs in (1024, 1):
        got = (
            dd.dup_spans_apply(ds, w=8, batch_size=bs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [1, 2, 3, 4], bs
        by = got.set_index("doc_id")
        assert by.loc[1, "text"] == "u1a u1b u1c u1d"
        assert by.loc[1, "n_kept"] == 4
        # double space collapses: \S+ split + single-space join
        assert by.loc[2, "text"] == "u2a u2b u2c u2d"
        assert by.loc[3, "text"] == "" and by.loc[3, "n_kept"] == 0
        assert by.loc[4, "text"] == docs[3]["text"]
        assert by.loc[4, "n_kept"] == 8


def test_dup_spans_planted_and_islands(ray_session):
    """Planted repeats: a shared 8-gram between two docs marks exactly
    w positions in each; overlapping repeats within one doc must merge
    into one island (interval-union, not per-gram sum)."""
    import pyarrow as pa
    import ray.data as rd

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = [
        # docs 1 and 2 share the 8-gram once, surrounded by unique text
        {"doc_id": 1, "text": f"u1a u1b {shared} u1c u1d"},
        {"doc_id": 2, "text": f"u2a {shared} u2b u2c u2d"},
        # doc 3: internal repeat 'x1..x8 x1..x8' -> grams at many
        # offsets are duplicated ACROSS the two copies; the island
        # union must cover the repeated region once, not 8x
        {"doc_id": 3, "text": " ".join([f"x{i}" for i in range(1, 9)] * 2)},
        {"doc_id": 4, "text": "only unique words here nothing repeats at all"},
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs], pa.int64()),
                "text": pa.array([d["text"] for d in docs], pa.string()),
            }
        )
    )
    got = (
        dd.dup_spans(ds, w=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3]
    by = got.set_index("doc_id")
    # one shared gram -> 1 dup position, 8-word span
    assert by.loc[1, "n_dup_grams"] == 1 and by.loc[1, "dup_span_words"] == 8
    assert by.loc[2, "n_dup_grams"] == 1 and by.loc[2, "dup_span_words"] == 8
    # doc 3: 16 tokens, 9 grams, gram(x1..x8) appears at pos 0 and 8;
    # every other gram is unique -> 2 dup positions, islands [0,8)+[8,16)
    assert by.loc[3, "n_dup_grams"] == 2
    assert by.loc[3, "dup_span_words"] == 16
    # batch-size invariance (candidate/verify must not depend on
    # partitioning)
    got7 = (
        dd.dup_spans(ds, w=8, batch_size=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(got7)


def test_funnel_ordering_semantics(ray_session):
    """Stage k counts only AT OR AFTER stage k-1: a purchase BEFORE
    the click must not complete the funnel; equal timestamps do."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1: full ordered funnel
        (1, "signup", T(0)), (1, "click", T(1)), (1, "purchase", T(2)),
        # u2: purchase BEFORE click -> stages_completed = 2
        (2, "signup", T(0)), (2, "purchase", T(1)), (2, "click", T(2)),
        # u3: click before signup doesn't count; the later one does
        (3, "click", T(0)), (3, "signup", T(1)), (3, "click", T(2)),
        # u4: no signup -> not in output at all
        (4, "click", T(0)), (4, "purchase", T(1)),
        # u5: equal timestamps chain (>= semantics)
        (5, "signup", T(0)), (5, "click", T(0)), (5, "purchase", T(0)),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        )
    )
    from information_extraction_t5_ray.stages.temporal import funnel

    import pandas as pd

    got = funnel(ds).to_pandas().sort_values("user_id").set_index("user_id")
    assert got.index.tolist() == [1, 2, 3, 5]
    assert got["stages_completed"].tolist() == [3, 2, 2, 3]
    # u2's t2 is the LATER click; no qualifying purchase after it
    assert got.loc[2, "t2"] == T(2) and pd.isna(got.loc[2, "t3"])
    # u3's t2 is the click AFTER signup
    assert got.loc[3, "t2"] == T(2)


def test_cohort_retention_closed_form(ray_session):
    """Hand-built cohorts: epoch-week indices, distinct-per-week
    counting, and offsets anchored at each user's first event."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    D = lambda d, h=0: dt.datetime(1970, 1, 1 + d, h)
    rows = [
        (1, D(0)), (1, D(0, 5)), (1, D(7)),        # cohort 0: wk 0, 1
        (2, D(1)), (2, D(15)),                     # cohort 0: wk 0, 2
        (3, D(8)), (3, D(9)),                      # cohort 1: wk 0 only
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    )
    from information_extraction_t5_ray.stages.temporal import (
        cohort_retention,
    )

    got = (
        cohort_retention(ds)
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    want = [
        (0, 0, 2),  # users 1 and 2, counted once despite repeats
        (0, 1, 1),  # user 1 back in week 1
        (0, 2, 1),  # user 2 back in week 2
        (1, 0, 1),  # user 3's cohort
    ]
    assert list(map(tuple, got.values.tolist())) == want


def test_embedding_quantize_extremes_and_invariance(ray_session):
    """Per-dim affine contract: the dim minimum maps to code 0, the
    maximum to 255, constant dims to 0 (span clamp); block layout must
    not change anything (the range fold is a driver-side min/max)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_t5_ray.stages.similarity import (
        quantize_embeddings,
    )

    vecs = [
        [0.0, -1.0, 7.5],
        [1.0, 3.0, 7.5],   # dim2 constant
        [0.5, 1.0, 7.5],
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    for blocks in (1, 3):
        ds = rd.from_arrow(tbl).repartition(blocks)
        got = (
            quantize_embeddings(ds)
            .to_pandas()
            .sort_values(["vec_id", "dim"])
            .reset_index(drop=True)
        )
        by = got.set_index(["vec_id", "dim"])["code"]
        assert by[(1, 0)] == 0 and by[(2, 0)] == 255, blocks
        assert by[(1, 1)] == 0 and by[(2, 1)] == 255, blocks
        # midpoint 0.5 in [0,1]: floor(0.5 * 255 / 1) via int affine
        assert by[(3, 0)] == (500000 * 255) // 1000000, blocks
        assert {by[(1, 2)], by[(2, 2)], by[(3, 2)]} == {0}, blocks
        assert got["code"].between(0, 255).all(), blocks


def test_dup_spans_apply_consistent_with_detection(ray_session):
    """Cross-op invariant on the real dup-injected corpus: for every
    document, (total words) - (kept words) must equal the detection
    phase's dup_span_words — the two ops share one coverage
    definition, so any drift is a bug in one of them."""
    import pyarrow.compute as pc

    corpus = c.dup_corpus(SF)
    det = dd.dup_spans(corpus, w=8).to_pandas().set_index("doc_id")
    app = dd.dup_spans_apply(corpus, w=8).to_pandas().set_index("doc_id")
    tot = (
        corpus.map_batches(
            lambda b: __import__("pyarrow").table(
                {
                    "doc_id": b["doc_id"],
                    "n": pc.count_substring_regex(
                        pc.cast(b["text"], "string"), pattern=r"\S+"
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("doc_id")["n"]
    )
    assert set(det.index) <= set(app.index)
    removed = tot.loc[app.index] - app["n_kept"]
    # docs absent from detection lost nothing
    clean = app.index.difference(det.index)
    assert (removed.loc[clean] == 0).all()
    assert (
        removed.loc[det.index].to_numpy() == det["dup_span_words"].to_numpy()
    ).all()


def test_new_ops_empty_input(ray_session):
    """Empty shard sets (real at 100-TB scale) must yield empty results,
    not crashes, across the r5 additions."""
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_t5_ray.stages import graph as G
    from information_extraction_t5_ray.stages.similarity import (
        quantize_embeddings,
    )

    empty_docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "text": pa.array([], pa.string())}
        )
    )
    empty_edges = rd.from_arrow(
        pa.table(
            {"a": pa.array([], pa.string()),
             "b": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
    )
    empty_emb = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array([], pa.int64()),
             "embedding": pa.array([], pa.list_(pa.float32()))}
        )
    )
    assert len(ts.cms_heavy_hitters(empty_docs).to_pandas()) == 0
    assert len(dd.dup_spans_apply(empty_docs).to_pandas()) == 0
    assert len(ts.bpe_token_counts(empty_docs).to_pandas()) == 0
    assert len(quantize_embeddings(empty_emb).to_pandas()) == 0
    assert len(G.neighbor_sample(empty_edges).to_pandas()) == 0
    assert len(G.degree_histogram(empty_edges).to_pandas()) == 0
    assert len(G.cooccur_lift(empty_edges).to_pandas()) == 0
    a = G.assortativity(empty_edges)
    assert a["m"].iloc[0] == 0 and a["assortativity"].isna().iloc[0]
