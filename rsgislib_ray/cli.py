"""CLI entry — the ``ray job submit`` surface.

On a real cluster:  ``ray job submit -- python -m rsgislib_ray.cli
flagship --out /data/out``. In this sandbox it runs against the local
session. The CLI owns the Ray session (guarded init); library code
never calls ray.init().

Subcommands:
  flagship   run the headline spatial-join + tiling pipeline over a
             synthetic interleaved corpus, tile-partitioned
             checkpointed output, resumable (--resume).
  query      run one named query from the registry against an sf dir.
  bench      shorthand for bench.py semantics (single run).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_flagship(args) -> int:
    import pyarrow as pa

    from rsgislib_ray.pipelines.flagship import (
        DEFAULT_TILESPEC,
        flagship_synth,
    )
    from rsgislib_ray.runtime.checkpoint import checkpointed_write, resume_filter
    from rsgislib_ray.runtime.metrics import PipelineMetrics

    _init_ray(args.num_cpus)
    m = PipelineMetrics("flagship")
    lineage = [
        {"op": "synth_docs", "params": {"n_docs": args.n_docs, "seed": 42}},
        {"op": "flagship_join", "params": {"zones": "synth64"}},
        {"op": "write_tiled", "params": {"tile": "30x30"}},
    ]
    with m.stage("pipeline", n_docs=args.n_docs):
        joined = flagship_synth(args.n_docs)

        def part_fn(batch: pa.Table):
            return batch["tile_id"].to_numpy()

        if args.resume:
            joined, done = resume_filter(
                joined, args.out, "tile_id", part_fn, lineage
            )
            print(f"resume: {len(done)} tile partitions already committed")
        meta = checkpointed_write(joined, args.out, "tile_id", lineage)
    report = m.report(rows=meta["rows_written"])
    report["write"] = meta
    print(json.dumps(report, indent=1))
    return 0


def cmd_query(args) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from rsgislib_ray.pipelines.queries import queries

    reg = queries()
    if args.name not in reg:
        print(
            f"unknown query {args.name!r}; available: {', '.join(sorted(reg))}",
            file=sys.stderr,
        )
        return 2
    _init_ray(args.num_cpus)
    res = reg[args.name](args.sf_dir)
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    with pd.option_context("display.max_rows", 20):
        print(df)
    print(f"[{len(df)} rows]")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rsgislib_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="headline pipeline with checkpointed output")
    f.add_argument("--out", required=True)
    f.add_argument("--n-docs", type=int, default=100_000)
    f.add_argument("--resume", action="store_true")
    f.set_defaults(func=cmd_flagship)

    q = sub.add_parser("query", help="run a registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.set_defaults(func=cmd_query)

    args = ap.parse_args(argv)
    rc = args.func(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
