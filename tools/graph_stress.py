"""Open-vocabulary graph stress: synthetic N-node symmetric ring+chord
graph built INSIDE read tasks (never on the driver), forced through the
distributed paths (or, with ``--local``, through the bounded
single-task fast paths).  Reports wall time per op and driver peak RSS;
``--assert-flat-rss MB`` fails loudly if the driver high-water mark
grows by more than the bound across the run — the regression guard for
VERDICT r4 item 2 (fast paths must run worker-side: a driver
``to_pandas`` of 4M edge strings costs several hundred MB and trips
the bound immediately).

Usage:
    python tools/graph_stress.py 10000000 pagerank,lpa,bfs
    python tools/graph_stress.py 1000000 pagerank,walks --local --assert-flat-rss 250
"""
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import ray
from ray.data import DataContext

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
OPS = sys.argv[2].split(",") if len(sys.argv) > 2 else ["pagerank", "lpa", "bfs"]
LOCAL = "--local" in sys.argv
RSS_BOUND = None
if "--assert-flat-rss" in sys.argv:
    RSS_BOUND = float(sys.argv[sys.argv.index("--assert-flat-rss") + 1])

if not ray.is_initialized():
    ray.init(
        address="local", num_cpus=16, include_dashboard=False,
        logging_level="ERROR",
    )
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from information_extraction_t5_ray.stages import graph as G  # noqa: E402

# local fast paths trigger at <= 4M edges; force with a huge threshold
# when --local, force the distributed rounds with 0 otherwise
THRESH = (1 << 60) if LOCAL else 0


def make_edges(batch):
    # ring + one chord per node, emitted in both directions (symmetric)
    i = batch["id"].to_numpy()
    nxt = (i + 1) % N
    chord = (i * 7 + 3) % N
    a = np.concatenate([i, nxt, i, chord])
    b = np.concatenate([nxt, i, chord, i])
    s = np.char.add("n", np.char.zfill(a.astype(str), 10))
    t = np.char.add("n", np.char.zfill(b.astype(str), 10))
    return pa.table({
        "a": pa.array(s.tolist(), pa.string()),
        "b": pa.array(t.tolist(), pa.string()),
        "cnt": pa.array(np.ones(len(a), dtype=np.int64)),
    })


edges = ray.data.range(N).map_batches(make_edges, batch_format="pyarrow").materialize()
n_edges = edges.count()
rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
print(f"N={N} edges={n_edges} rss_after_build={rss0:.0f}MB local={LOCAL}", flush=True)

failed = False
for op in OPS:
    t0 = time.time()
    if op == "pagerank":
        out = G.pagerank(edges, n_iters=2, local_edge_threshold=THRESH)
    elif op == "lpa":
        out = G.label_propagation(edges, n_rounds=2, local_edge_threshold=THRESH)
    elif op == "bfs":
        out = G.bfs_layers(edges, n_seeds=2, max_rounds=3, local_threshold=THRESH)
    elif op == "kcore":
        out = G.k_core(edges, k=4, n_rounds=3, local_threshold=THRESH)
    elif op == "sssp":
        out = G.shortest_paths(edges, n_rounds=4, local_threshold=THRESH)
    elif op == "walks":
        out = G.random_walks(edges, n_steps=3, local_edge_threshold=THRESH)
    elif op == "wcore":
        # derive varying weights (the build keeps cnt=1 for the other
        # legs' round-over-round comparability)
        def _w(t):
            import pyarrow.compute as pc
            import zlib
            import numpy as _np

            w = _np.fromiter(
                (zlib.crc32(x.encode()) % 9 + 1 for x in t["a"].to_pylist()),
                dtype=_np.int64,
                count=len(t),
            )
            return t.set_column(
                t.schema.get_field_index("cnt"), "cnt", pa.array(w)
            )

        wedges = edges.map_batches(_w, batch_format="pyarrow").materialize()
        out = G.k_core(wedges, k=12, n_rounds=3, local_threshold=THRESH, weighted=True)
    elif op == "nsample":
        out = G.neighbor_sample(edges, k=5)
    elif op == "deghist":
        lo = edges.map_batches(
            lambda t: t.filter(
                __import__("pyarrow.compute", fromlist=["compute"]).less(
                    t["a"], t["b"]
                )
            ),
            batch_format="pyarrow",
        ).materialize()
        out = G.degree_histogram(lo)
    elif op == "ball2":
        out = G.two_hop_counts(edges, local_threshold=THRESH)
    elif op == "hyperball":
        # p=8 (256 B/node) keeps the register shuffle at edges x 256 B
        out = G.hyperball_counts(edges, rounds=2, p=8, local_threshold=THRESH)
    elif op == "harmonic":
        out = G.harmonic_centrality_2(edges, local_threshold=THRESH)
    elif op == "lift":
        # cooccur_lift takes the a<b pair list (the cooccur contract)
        lo = edges.map_batches(
            lambda t: t.filter(
                __import__("pyarrow.compute", fromlist=["compute"]).less(
                    t["a"], t["b"]
                )
            ),
            batch_format="pyarrow",
        ).materialize()
        out = G.cooccur_lift(lo, local_edge_threshold=THRESH)
    elif op == "ktruss":
        # triangle-rich dedicated a<b list (ring + i+2 + i+3 chords):
        # every edge sits in 2-4 triangles; at k=5 the diff-3 chords
        # (support 2) peel first and the cascade empties the periphery,
        # but every 100th node closes a K5 (one extra i+4 chord) whose
        # 10 edges keep support 3 after the collapse -> N/10 survivors
        # through a REAL multi-round cascade
        def tri_edges(batch):
            i = batch["id"].to_numpy()
            k5 = i[i % 100 == 0]
            a = np.concatenate([i, i, i, k5])
            b = np.concatenate(
                [(i + 1) % N, (i + 2) % N, (i + 3) % N, (k5 + 4) % N]
            )
            lo_, hi_ = np.minimum(a, b), np.maximum(a, b)
            s_ = np.char.add("n", np.char.zfill(lo_.astype(str), 10))
            t_ = np.char.add("n", np.char.zfill(hi_.astype(str), 10))
            return pa.table({
                "a": pa.array(s_.tolist(), pa.string()),
                "b": pa.array(t_.tolist(), pa.string()),
            })

        tri = ray.data.range(N).map_batches(
            tri_edges, batch_format="pyarrow"
        ).materialize()
        out = G.k_truss(tri, k=5, n_rounds=4, local_threshold=THRESH)
    elif op == "hits":
        # directed edges: reuse (a -> b) as (subj -> obj) assertions
        out = G.hits_scores(
            edges.map_batches(
                lambda t: pa.table(
                    {"subj": t["a"], "pred": t["a"], "obj": t["b"]}
                ),
                batch_format="pyarrow",
            ),
            local_edge_threshold=THRESH,
        )
    elif op == "matching":
        out = G.maximal_matching(edges, n_rounds=4, local_threshold=THRESH)
    elif op == "assort":
        # degree variance: every 4th node carries one extra chord (the
        # shared ring+chord graph is 4-regular -> NULL by definition;
        # an every-2nd-node chord is ALSO regular — the 13t+5 map
        # covers each odd node exactly once)
        def var_edges(batch):
            i = batch["id"].to_numpy()
            ev = i[i % 4 == 0]
            c2 = (ev * 13 + 5) % N
            a = np.concatenate([i, (i + 1) % N, ev, c2])
            b = np.concatenate([(i + 1) % N, i, c2, ev])
            s_ = np.char.add("n", np.char.zfill(a.astype(str), 10))
            t_ = np.char.add("n", np.char.zfill(b.astype(str), 10))
            return pa.table({
                "a": pa.array(s_.tolist(), pa.string()),
                "b": pa.array(t_.tolist(), pa.string()),
                "cnt": pa.array(np.ones(len(a), dtype=np.int64)),
            })

        vedges = ray.data.range(N).map_batches(
            var_edges, batch_format="pyarrow"
        ).materialize()
        t0 = time.time()
        df = G.assortativity(vedges, local_edge_threshold=THRESH)
        nrows = len(df)
        dt = time.time() - t0
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        grew = rss - rss0
        print(
            f"{op}: {dt:.1f}s rows={nrows} r={df['assortativity'].iloc[0]:.4f} "
            f"driver_peak_rss={rss:.0f}MB (+{grew:.0f}MB)",
            flush=True,
        )
        if RSS_BOUND is not None and grew > RSS_BOUND:
            print(f"FAIL: {op} grew driver RSS by {grew:.0f}MB > {RSS_BOUND}MB")
            failed = True
        continue
    else:
        raise SystemExit(f"unknown op {op}")
    nrows = out.count()
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    grew = rss - rss0
    print(
        f"{op}: {dt:.1f}s rows={nrows} driver_peak_rss={rss:.0f}MB "
        f"(+{grew:.0f}MB)",
        flush=True,
    )
    if RSS_BOUND is not None and grew > RSS_BOUND:
        print(f"FAIL: {op} grew driver RSS by {grew:.0f}MB > {RSS_BOUND}MB")
        failed = True
ray.shutdown()
sys.exit(1 if failed else 0)
