"""Benchmark harness: headline pipelines + two-parallelism scaling runs.

Prints ONE JSON line:
  {"metric": ..., "value": <total wall s>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "points_per_s": ..., "compressed_bytes_per_s": ...}

--scaling [N M]: runs the flagship job in two fresh subprocesses at two
CPU levels (default 8 then 32; pass e.g. ``--scaling 2 8``) on the same
input and reports both throughputs plus
scaling_efficiency = (thr_M / thr_N) / (M/N) — the sandbox stand-in for
the north rule's N→4N-node criterion (see BASELINE.md for both measured
pairs and the single-box bandwidth-ceiling caveat).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BENCH_SF_DIR = "/tmp/wfer_bench_sf"
BENCH_SOURCES = 64
BENCH_BASE_SEQS = 50_000
BENCH_TOK_MOD = 256  # disk-friendly tokens payload; spec shape preserved

# --scaling corpus: ~8× more points, tokens column omitted (the rollup
# path prunes it at the read anyway, so the job is identical; omitting
# it keeps generation + disk at ~1 GB). Same input for BOTH cpu levels.
SCALE_SF_DIR = "/tmp/wfer_scale_sf"
SCALE_BASE_SEQS = 1_600_000


def _ensure_table(
    out_dir: str, base_seqs: int, with_tokens: bool, n_shards: int
) -> list[str]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from workbook_exporter_fe_ray import datagen

    marker = os.path.join(out_dir, ".complete")
    if not os.path.exists(marker):
        datagen.generate(
            out_dir,
            n_sources=BENCH_SOURCES,
            base_seqs=base_seqs,
            seed=42,
            tok_mod=BENCH_TOK_MOD,
            with_tokens=with_tokens,
            n_shards=n_shards,
        )
        open(marker, "w").write("ok")
    return sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.endswith(".parquet")
    )


def ensure_bench_table() -> list[str]:
    return _ensure_table(BENCH_SF_DIR, BENCH_BASE_SEQS, True, 16)


def ensure_scale_table() -> list[str]:
    return _ensure_table(SCALE_SF_DIR, SCALE_BASE_SEQS, False, 32)


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    import pyarrow.compute as pc

    from workbook_exporter_fe_ray.pipelines import events as ev
    from workbook_exporter_fe_ray.sources import read_points_input
    from workbook_exporter_fe_ray.stages.compress import compress_chunks
    from workbook_exporter_fe_ray.stages.points import derive_points
    from workbook_exporter_fe_ray.stages.rollup import cascade_rollup

    paths = ensure_bench_table()
    queries: dict[str, float] = {}
    meta = {"points": 0, "compressed_bytes": 0, "tier_rows": 0}

    walls: dict[str, list[float]] = {}

    def timed(name: str, fn, reps: int = 2):
        # best-of-2: single-shot walls on this sandbox swing 2-3x
        # between identical back-to-back runs (page cache, worker pool,
        # CPU contention) — one repeat removes most of that noise while
        # keeping the whole bench under ~2 min. EVERY raw shot is
        # recorded in walls_all so cross-round deltas stay auditable
        # against the best-of-N methodology (VERDICT r3 item 6).
        shots, out = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            shots.append(round(time.perf_counter() - t0, 3))
        walls[name] = shots
        queries[name] = min(shots)
        return out

    # 1) flagship: synthetic tokenized-sequence cascade (1 shuffle, 4 tiers)
    def _cascade():
        rolled = cascade_rollup(derive_points(read_points_input(paths))).materialize()
        meta["tier_rows"] = rolled.count()
        return rolled

    timed("synthetic_cascade_4tiers", _cascade)

    # 2) flagship compression: Gorilla chunks over the same points
    def _compress():
        chunks = compress_chunks(derive_points(read_points_input(paths))).materialize()
        stats = chunks.map_batches(
            lambda b: {
                "n": [int(pc.sum(b["n_points"]).as_py() or 0)],
                "bts": [
                    sum(len(x) for x in b["ts_dod_bytes"].to_pylist())
                    + sum(len(x) for x in b["val_xor_bytes"].to_pylist())
                ],
            },
            batch_format="pyarrow",
        ).to_pandas()
        meta["points"] = int(stats["n"].sum())
        meta["compressed_bytes"] = int(stats["bts"].sum())
        return chunks

    timed("synthetic_compress_gorilla", _compress)

    # 2b) fused flagship (r5): cascade + Gorilla chunks in ONE pass /
    # ONE exchange — the scale-correct plan (the two jobs above share
    # the combiner and the (skey, day) exchange key). Kept alongside
    # the separate jobs so cross-round per-query walls stay comparable.
    def _fused():
        from workbook_exporter_fe_ray.stages.rollup import fused_rollup_compress

        fused = fused_rollup_compress(derive_points(read_points_input(paths)))
        stats = fused.map_batches(
            lambda b: {
                "tiers": [int(pc.sum(pc.equal(b["kind"], "tier")).as_py() or 0)],
                "n": [int(pc.sum(b["n_points"]).as_py() or 0)],
                "bts": [
                    sum(len(x) for x in b["ts_dod_bytes"].to_pylist() if x)
                    + sum(len(x) for x in b["val_xor_bytes"].to_pylist() if x)
                ],
            },
            batch_format="pyarrow",
        ).to_pandas()
        meta["fused_tier_rows"] = int(stats["tiers"].sum())
        meta["fused_points"] = int(stats["n"].sum())
        meta["fused_compressed_bytes"] = int(stats["bts"].sum())
        return None

    timed("flagship_fused_1pass", _fused)

    # 3) events tiered cascade + gap-fill + compression at $GRAFT_SF_DIR
    timed("events_cascade_all_tiers", lambda: ev.events_flagship(sf_dir).materialize())
    timed("events_gapfill_locf_1h", lambda: ev.gapfill_events_1h(sf_dir).materialize())
    timed("events_compress_gorilla", lambda: ev.compress_events(sf_dir).materialize())

    # 4) training-data ops over documents/embeddings
    import __ray_entry__ as em

    timed("docs_minhash_pairs", lambda: em.queries()["minhash_pairs"](sf_dir).materialize())
    timed("docs_text_analysis", lambda: em.queries()["quality_score"](sf_dir).materialize())
    timed("ann_topk", lambda: em.queries()["ann_topk"](sf_dir).materialize())

    # 5) materialized token packer over a 4-shard slice of the synthetic
    # corpus (~100M tokens): the tokens-axis headline — one payload
    # exchange, driver-stitched boundaries
    def _pack():
        import ray

        from workbook_exporter_fe_ray.sources.parquet import good_num_blocks
        from workbook_exporter_fe_ray.stages.pack import (
            assemble_packs,
            doc_rank_batch,
        )

        sub = paths[:4]
        nb = good_num_blocks(sub)
        # slim id dedup is folded into the bucket-sum exchange
        # (dedup_slim_ids=True) — one fewer slim all-to-all
        slim = ray.data.read_parquet(
            sub, columns=["doc_id", "n_tok"], override_num_blocks=nb
        ).map_batches(doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True)
        # payload read must be wide enough to parallelize the sort-map
        # side of the single token exchange (default sizing gave 1-4
        # giant blocks → serialized bucketing; 21.5 s → 9.3 s measured)
        docs = ray.data.read_parquet(
            sub, columns=["doc_id", "tokens"], override_num_blocks=nb
        ).map_batches(doc_rank_batch, batch_format="pyarrow", zero_copy_batch=True)
        out = assemble_packs(
            docs,
            pack_len=2048,
            num_partitions=64,
            n_col="n_tok",
            docs_slim=slim,
            drop_dup_ids=True,
            dedup_slim_ids=True,
        ).materialize()
        meta["packs"] = out.count()
        return out

    timed("tokens_pack_2048", _pack)
    meta["packed_tokens"] = max(meta["packs"] - 1, 0) * 2048  # last pack ragged

    total = round(sum(queries.values()), 3)
    comp_secs = queries["synthetic_compress_gorilla"]
    roll_secs = queries["synthetic_cascade_4tiers"]
    return {
        "metric": "headline_pipelines_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "walls_all": walls,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "points": meta["points"],
        "tier_rows": meta["tier_rows"],
        "compressed_bytes": meta["compressed_bytes"],
        "points_per_s": round(meta["points"] / roll_secs, 1) if roll_secs else None,
        "compressed_bytes_per_s": round(meta["compressed_bytes"] / comp_secs, 1)
        if comp_secs
        else None,
        "packs": meta["packs"],
        # fused-flagship cross-check: must equal tier_rows /
        # compressed_bytes from the separate jobs (bit-identity is
        # pytest-pinned; these make it auditable in every BENCH record)
        "fused_tier_rows": meta.get("fused_tier_rows"),
        "fused_compressed_bytes": meta.get("fused_compressed_bytes"),
        "packed_tokens_per_s": round(meta["packed_tokens"] / queries["tokens_pack_2048"], 1)
        if queries["tokens_pack_2048"]
        else None,
    }


def run_scaling_child(num_cpus: int, reps: int = 5) -> dict:
    """Fresh-process flagship runs for --scaling.

    r5: the flagship is the FUSED plan (tier cascade + Gorilla chunks
    in one pass / one exchange — ``rollup.fused_rollup_compress``,
    bit-identical to the two separate jobs, pytest-pinned); r1-r4
    records ran cascade and compress as two sequential jobs, so their
    absolute walls are not comparable to r5's (the ratios are the
    criterion and each record is same-run both-widths).

    The flagship is run ``reps`` times and the BEST wall is reported per
    CPU level: a long-lived cluster's steady state is what the N→4N
    criterion is about, and first-iteration noise (page cache, parquet
    footer caches, worker warmup) would otherwise dominate. Output is
    consumed streamingly (per-block stats) — the real pipeline writes
    partitioned Parquet; it never holds all tier rows in the object
    store at once."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import pyarrow.compute as pc

    from workbook_exporter_fe_ray.sources import read_points_input
    from workbook_exporter_fe_ray.stages.points import derive_points
    from workbook_exporter_fe_ray.stages.rollup import fused_rollup_compress

    paths = ensure_scale_table()
    # warm the FULL worker pool so the timed region measures the job,
    # not process spawning (a real N-node cluster has long-lived
    # workers): a full-width pass over every shard
    derive_points(read_points_input(paths)).count()

    walls, meta = [], {}
    for _ in range(reps):
        t0 = time.perf_counter()
        stats = (
            fused_rollup_compress(derive_points(read_points_input(paths)))
            .map_batches(
                lambda b: {
                    "tiers": [int(pc.sum(pc.equal(b["kind"], "tier")).as_py() or 0)],
                    "n": [int(pc.sum(b["n_points"]).as_py() or 0)],
                    "bts": [
                        sum(len(x) for x in b["ts_dod_bytes"].to_pylist() if x)
                        + sum(len(x) for x in b["val_xor_bytes"].to_pylist() if x)
                    ],
                },
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        walls.append(time.perf_counter() - t0)
        meta = {
            "points": int(stats["n"].sum()),
            "tier_rows": int(stats["tiers"].sum()),
            "compressed_bytes": int(stats["bts"].sum()),
        }
    wall = min(walls)
    ray.shutdown()
    return {
        "num_cpus": num_cpus,
        "wall_s": round(wall, 3),
        "walls_all": [round(w, 3) for w in walls],
        **meta,
        "points_per_s": round(meta["points"] / wall, 1),
        "compressed_bytes_per_s": round(meta["compressed_bytes"] / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling-child" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--scaling-child") + 1])
        reps = (
            int(sys.argv[sys.argv.index("--reps") + 1])
            if "--reps" in sys.argv
            else 5
        )
        print(json.dumps(run_scaling_child(cpus, reps=reps)))
        return

    if "--scaling" in sys.argv:
        # optional pair override: --scaling N M  (default 8 32). The
        # N→4N-node criterion is proxied by two CPU levels; on ONE box
        # the high-core pair (8→32) shares a single memory subsystem
        # (real nodes each bring their own bandwidth), so the low-core
        # pair (2→8) is also worth measuring — see BASELINE.md.
        i = sys.argv.index("--scaling")
        try:
            pair = (int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        except (IndexError, ValueError):
            pair = (8, 32)
        factor = pair[1] / pair[0]
        ensure_scale_table()  # generate once outside the timed children
        runs = {}
        for cpus in pair:
            reps = "3" if cpus <= 4 else "5"  # low-cpu child walls are long
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--scaling-child",
                    str(cpus),
                    "--reps",
                    reps,
                ],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=3600,
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"scaling child {cpus} failed: {out.stderr[-2000:]}")
            runs[cpus] = json.loads(lines[-1])
        eff = (runs[pair[1]]["points_per_s"] / runs[pair[0]]["points_per_s"]) / factor
        print(
            json.dumps(
                {
                    "metric": f"scaling_efficiency_{pair[0]}_to_{pair[1]}_cpus",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "runs": runs,
                    "sf": SCALE_SF_DIR,
                }
            )
        )
        return

    import ray

    result = run_benchmarks(sf_dir, num_cpus)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
