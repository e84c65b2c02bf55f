"""CLI entrypoint — the ``ray job submit`` surface of the engine.

    ray job submit -- python -m workbook_exporter_fe_ray.run \
        --input /data/sequences --out /data/rollups \
        --partitions 64 --gapfill locf --resume

Reference parity: this replaces the reference's HTTP upload → form →
dispatcher flow (``/root/reference/workbook_exporter-fe.py:1940-1979``
upload, ``:2002-2015`` process, ``:1781-1922`` dispatch) with one
argument-driven job launch; ``--clean`` is the analog of
``finish_and_clean`` (``:2018-2030``).

Owns its Ray session (guarded init) — library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys


def _parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Ray-Data time-series rollup engine")
    p.add_argument("--input", required=True, help="parquet file/dir/glob of input rows")
    p.add_argument("--out", required=True, help="output directory (manifest + partitions)")
    p.add_argument(
        "--input-kind",
        choices=("sequences", "points"),
        default="sequences",
        help="sequences: (doc_id,tokens,n_tok,source); points: (source,ts,value)",
    )
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--gapfill", choices=("locf", "linear", "none"), default="locf")
    p.add_argument("--chunk-s", type=int, default=86_400)
    p.add_argument("--now-us", type=int, default=None, help="retention anchor µs (enables retention)")
    p.add_argument("--resume", action="store_true", help="skip partitions already in the manifest")
    p.add_argument("--clean", action="store_true", help="delete the output dir first")
    p.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap (tests only)")
    p.add_argument(
        "--concurrency",
        type=int,
        default=4,
        help="partition sub-pipelines to run concurrently",
    )
    return p.parse_args(argv)


def _expand_input(spec: str) -> list[str]:
    if os.path.isdir(spec):
        return sorted(
            os.path.join(spec, f) for f in os.listdir(spec) if f.endswith(".parquet")
        )
    hits = sorted(glob.glob(spec))
    if not hits:
        raise FileNotFoundError(f"no parquet input matches {spec!r}")
    return hits


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(argv if argv is not None else sys.argv[1:])
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kw)

    from .pipelines.timeseries import TimeseriesJob, run_timeseries

    if args.clean and os.path.isdir(args.out):
        shutil.rmtree(args.out)
    if not args.resume and os.path.exists(os.path.join(args.out, "manifest.json")):
        os.remove(os.path.join(args.out, "manifest.json"))

    job = TimeseriesJob(
        input_paths=_expand_input(args.input),
        out_dir=args.out,
        n_partitions=args.partitions,
        gapfill_strategy=None if args.gapfill == "none" else args.gapfill,
        chunk_s=args.chunk_s,
        input_kind=args.input_kind,
        now_us=args.now_us,
        concurrent_partitions=args.concurrency,
    )
    totals = run_timeseries(job)
    print(json.dumps(totals))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
