"""Per-round benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"kg_triples": sec, ...}, "sf": ..., "num_cpus": N,
     "rows": {...}, "throughput": {...}}

``--scaling`` runs the flagship KG pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N node clusters — see BASELINE.md).

This file owns its Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _bench_queries(sf_dir: str):
    """name -> zero-arg callable returning the result row count.

    Each callable builds AND consumes a full streaming pipeline; row
    count comes from the consumed result so the timing covers real
    execution, not plan construction.
    """
    from information_extraction_t5_ray.pipelines.kg import KGConfig, run_kg
    from information_extraction_t5_ray.pipelines import corpus

    def kg_triples() -> int:
        return run_kg(sf_dir, cfg=KGConfig()).count()

    out = {"kg_triples": kg_triples}
    for name, fn in corpus.bench_queries(sf_dir).items():
        out[name] = fn
    return out


def run_bench(sf_dir: str, num_cpus: int, only=None) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    queries = _bench_queries(sf_dir)
    if only:
        queries = {k: v for k, v in queries.items() if k in only}
    # one tiny warmup run so the measurements reflect steady-state
    # throughput, not first-query session costs (actor-pool spin-up,
    # shuffle service init) that a long-running job pays once
    from information_extraction_t5_ray.pipelines.kg import run_kg

    run_kg("/root/testdata/sf0.001").count()
    times: dict = {}
    rows: dict = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        n = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        rows[name] = int(n)
    total = round(sum(times.values()), 3)
    throughput = {
        name: round(rows[name] / times[name], 1) if times[name] else 0.0
        for name in times
    }
    return {
        "metric": "kg_construct_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "rows": rows,
        "throughput_rows_per_sec": throughput,
    }


def _run_child(sf_dir: str, num_cpus: int) -> dict:
    """Fresh-process single-query run (scaling evidence needs isolated
    ray sessions; object-store state must not carry over)."""
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(num_cpus)
    env["GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, __file__, "--child"],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"child failed (cpus={num_cpus}):\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_scaling(sf_dir: str, low: int = 8, high: int = 32) -> dict:
    """Same job + same input at two parallelism levels, fresh
    processes.  efficiency = (thr_high / thr_low) / (high / low)."""
    r_low = _run_child(sf_dir, low)
    r_high = _run_child(sf_dir, high)
    thr_low = r_low["throughput_rows_per_sec"]["kg_triples"]
    thr_high = r_high["throughput_rows_per_sec"]["kg_triples"]
    eff = (thr_high / thr_low) / (high / low) if thr_low else 0.0
    return {
        "metric": "kg_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_of(sf_dir),
        "low": {"num_cpus": low, "sec": r_low["queries"]["kg_triples"],
                "rows_per_sec": thr_low},
        "high": {"num_cpus": high, "sec": r_high["queries"]["kg_triples"],
                 "rows_per_sec": thr_high},
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--only", nargs="*", default=None,
                   help="subset of query names to run")
    p.add_argument("--child", action="store_true",
                   help="internal: single kg_triples run for --scaling")
    args = p.parse_args()

    import ray

    if args.child:
        result = run_bench(args.sf_dir, args.num_cpus, only=["kg_triples"])
    elif args.scaling:
        result = run_scaling(args.sf_dir, low=8, high=args.num_cpus)
    else:
        result = run_bench(args.sf_dir, args.num_cpus, only=args.only)
    print(json.dumps(result))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
