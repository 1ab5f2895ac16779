"""Command-line entry points mirroring the reference's user workflow.

The reference is driven as::

    python information_extraction_t5/data/<converter>.py ...   # raw -> SQuAD
    python information_extraction_t5/train.py   -c params.yaml
    python information_extraction_t5/predict.py -c params.yaml

This engine maps the same workflow onto Ray Data pipelines::

    python -m information_extraction_t5_ray convert -c params.yaml --out-dir OUT
    python -m information_extraction_t5_ray predict --squad-file F --out-dir OUT
    python -m information_extraction_t5_ray kg --input SF_DIR --output OUT
    python -m information_extraction_t5_ray train -c params.yaml

``kg`` is the flagship corpus-scale path (Parquet web pages -> canonical
triples) with optional partition-granular checkpointed resume — at
cluster scale each invocation is one ``ray job submit`` unit.

The CLI owns the Ray session (init guarded / shutdown on exit); the
library never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys


class _RaySession:
    """Ray handle that only shuts down a session IT created: a CLI
    command invoked under an already-initialised session (tests, a
    driving script) must not kill its caller's cluster handle."""

    def __init__(self, num_cpus: int | None):
        import ray

        self._ray = ray
        self._owned = not ray.is_initialized()
        if self._owned:
            kwargs = {"include_dashboard": False}
            if num_cpus:
                kwargs["num_cpus"] = num_cpus
            ray.init(address="local", **kwargs)

    def shutdown(self) -> None:
        if self._owned:
            self._ray.shutdown()


def _ray_session(num_cpus: int | None) -> _RaySession:
    return _RaySession(num_cpus)


def cmd_convert(args) -> int:
    from .config import convert_from_params

    ray = _ray_session(args.num_cpus)
    try:
        paths = convert_from_params(args.config, args.out_dir, repo_root=args.repo_root)
        print(json.dumps({"written": paths}))
        return 0
    finally:
        ray.shutdown()


def cmd_predict(args) -> int:
    from .pipelines.predict import run_predict

    ray = _ray_session(args.num_cpus)
    try:
        registry = None
        use_fewer_na = True
        only_mis = True
        if args.config:
            from .config import load_params_yaml

            cfg = load_params_yaml(args.config)
            registry = cfg.kg.registry()
            use_fewer_na = cfg.kg.use_fewer_na
            only_mis = cfg.only_misprediction_outputs
        result = run_predict(
            args.squad_file,
            args.out_dir,
            registry=registry,
            scorer=args.scorer,
            checkpoint_dir=args.checkpoint_dir,
            use_cached_predictions=args.use_cached_predictions,
            use_fewer_na=use_fewer_na,
            only_mispredictions=only_mis,
        )
        print(json.dumps(result))
        return 0
    finally:
        ray.shutdown()


def cmd_kg(args) -> int:
    from .pipelines.kg import KGConfig, run_kg, run_kg_sharded

    # A non-parquet --format needs somewhere to write, and the sharded
    # checkpoint path always emits parquet: fail loudly up front instead
    # of silently falling into the parquet/count branch (ADVICE r3).
    if args.format != "parquet":
        if not args.output:
            print(
                f"error: --format {args.format} requires --output",
                file=sys.stderr,
            )
            return 2
        if args.ckpt_dir:
            print(
                "error: --ckpt-dir writes parquet shard checkpoints; "
                f"--format {args.format} is not supported with it",
                file=sys.stderr,
            )
            return 2
    ray = _ray_session(args.num_cpus)
    try:
        cfg = KGConfig()
        if args.config:
            from .config import load_params_yaml

            cfg = load_params_yaml(args.config).kg
        if args.ckpt_dir:
            triples, skipped = run_kg_sharded(
                args.input, args.ckpt_dir, cfg=cfg, num_shards=args.shards
            )
            n = triples.count()
            print(json.dumps({"triples": n, "shards_skipped": skipped}))
        elif args.format == "parquet" or not args.output:
            triples = run_kg(args.input, out_dir=args.output, cfg=cfg)
            print(json.dumps({"triples": triples.count(), "output": args.output}))
        elif args.format == "ntriples":
            from .stages.triples import write_ntriples

            triples = run_kg(args.input, cfg=cfg)
            write_ntriples(triples, args.output)
            print(json.dumps({"format": "ntriples", "output": args.output}))
        else:  # property graph: nodes + edges tables
            from .pipelines.kg import export_property_graph

            nodes_dir, edges_dir = export_property_graph(
                run_kg(args.input, cfg=cfg), args.output
            )
            print(
                json.dumps(
                    {"format": "pg", "nodes": nodes_dir, "edges": edges_dir}
                )
            )
        return 0
    finally:
        ray.shutdown()


def cmd_query(args) -> int:
    """Run any registered pipeline/operator query over an sf-style
    directory; write Parquet or print rows."""
    import importlib.util
    import sys as _sys
    from pathlib import Path

    # __ray_entry__ lives at the repo root, not inside the package
    root = Path(__file__).resolve().parents[1]
    entry_path = root / "__ray_entry__.py"
    try:
        spec = importlib.util.spec_from_file_location("__ray_entry__", entry_path)
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)
    except (FileNotFoundError, ImportError, AttributeError) as e:
        print(
            f"error: query registry not found at {entry_path} — "
            "'query' requires running from the repo checkout "
            f"(the registry lives next to the package, not inside it): {e}",
            file=_sys.stderr,
        )
        return 2

    queries = entry.queries()
    if args.list:
        oracles = entry.oracle_sql()
        for name in sorted(queries):
            mark = "oracle" if name in oracles else "rows-only"
            print(f"{name}\t{mark}")
        return 0
    if args.name not in queries:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2
    ray = _ray_session(args.num_cpus)
    try:
        res = queries[args.name](args.sf_dir)
        if hasattr(res, "write_parquet"):
            if args.output:
                res.write_parquet(args.output, min_rows_per_file=100_000)
                print(json.dumps({"query": args.name, "output": args.output}))
            else:
                df = res.to_pandas()
                print(df.head(args.head).to_string())
                print(f"... {len(df)} rows")
        else:
            import pandas as pd

            df = res if hasattr(res, "to_string") else pd.DataFrame(res)
            if args.output:
                df.to_parquet(f"{args.output}.parquet")
                print(json.dumps({"query": args.name, "output": f"{args.output}.parquet"}))
            else:
                print(df.head(args.head).to_string())
                print(f"... {len(df)} rows")
        return 0
    finally:
        ray.shutdown()


def cmd_train(args) -> int:
    # Training parity is the torch-gated path: the reference fine-tunes
    # with pytorch-lightning (train.py:20-155); this engine produces the
    # training data (convert + balance) and consumes checkpoints via
    # T5Scorer, but does not re-implement the trainer loop.  Fail with
    # the exact dependency story instead of pretending.
    try:
        import torch  # noqa: F401
    except ImportError:
        print(
            "train requires torch+transformers (not present in this "
            "environment). Produce training data with `convert` (plus "
            "stages.balance for negative balancing), fine-tune with the "
            "reference trainer or any HF seq2seq trainer on the SQuAD "
            "files, then point `predict --scorer t5 --checkpoint-dir` "
            "at the checkpoint.",
            file=sys.stderr,
        )
        return 2
    print("torch found — wire your trainer here; see stages/score.py T5Scorer.", file=sys.stderr)
    return 2


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="information_extraction_t5_ray",
        description="Ray-Data-native information-extraction engine",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="raw annotated JSON -> SQuAD files (reference E1)")
    c.add_argument("-c", "--config", required=True, help="reference-style params.yaml")
    c.add_argument("--out-dir", required=True)
    c.add_argument("--repo-root", default=None, help="base for relative raw_data_file paths")
    c.set_defaults(fn=cmd_convert)

    pr = sub.add_parser("predict", help="SQuAD file -> predictions + reports (reference predict.py)")
    pr.add_argument("--squad-file", required=True)
    pr.add_argument("--out-dir", required=True)
    pr.add_argument("-c", "--config", default=None)
    pr.add_argument("--scorer", choices=["mock", "t5"], default="mock")
    pr.add_argument("--checkpoint-dir", default=None)
    pr.add_argument("--use-cached-predictions", action="store_true")
    pr.set_defaults(fn=cmd_predict)

    k = sub.add_parser("kg", help="Parquet pages -> canonical triples (flagship)")
    k.add_argument("--input", required=True, help="directory with documents.parquet")
    k.add_argument("--output", default=None, help="triples Parquet output dir")
    k.add_argument("-c", "--config", default=None)
    k.add_argument(
        "--format",
        choices=["parquet", "ntriples", "pg"],
        default="parquet",
        help="sink for --output: sorted partitioned Parquet (default), "
        "W3C N-Triples shards, or property-graph nodes+edges tables",
    )
    k.add_argument("--ckpt-dir", default=None, help="enable sharded checkpointed resume")
    k.add_argument("--shards", type=int, default=8)
    k.set_defaults(fn=cmd_kg)

    q = sub.add_parser("query", help="run any registered operator query over parquet tables")
    q.add_argument("--name", default=None, help="query name (see --list)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--output", default=None, help="Parquet output dir (prints head if omitted)")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--list", action="store_true", help="list available queries")
    q.set_defaults(fn=cmd_query)

    t = sub.add_parser("train", help="torch-gated; see convert + T5Scorer")
    t.add_argument("-c", "--config", default=None)
    t.set_defaults(fn=cmd_train)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
