#!/usr/bin/env python
"""Benchmark harness for the xgeo_spark engine.

Two workloads, one JSON line on stdout:

1. **CDC ingest throughput** (the BASELINE.json headline metric): generate a
   deterministic synthetic change stream sized to the scale factor (parquet
   wire format, out-of-order + duplicates + deletes + mid-stream schema
   change), replay it through the full pipeline (decode -> LWW dedup ->
   schema evolution -> idempotent bucket merge -> lineage), and report
   sustained change-events/sec applied.

2. **Headline queries**: every SQL-checked operator from the driver registry
   run at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1), each forced
   with a noop write so the full plan executes; per-query seconds reported.

Usage:
    python bench.py                  # the driver's per-round run
    python bench.py --scaling        # local[8] vs local[32] efficiency run
    python bench.py --cpus 8 --cdc-only --json-out /tmp/x.json  # one leg

The scaling mode evidences the north rule's N->4N criterion in-sandbox: the
same job + same input at two parallelism levels, efficiency =
(throughput_32 / throughput_8) / (32 / 8).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see xgeo_spark/__init__.py
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Queries the driver checks against DuckDB, run here as the throughput suite.
HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_orders_per_customer",
    "running_customer_spend",
    "events_lww_latest",
    "events_hourly",
    "events_json_props",
    "events_sessionize",
    "asof_latest_event_per_user",
    "doc_exact_dedup",
    "doc_token_stats",
    "doc_minhash_near_dup",
    "emb_cosine_topk",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _cdc_config(sf: float, n_files: int = 16):
    from xgeo_spark.fixtures.generator import ChangeStreamConfig

    n_events = max(50_000, int(sf * 20_000_000))
    return ChangeStreamConfig(
        n_events=n_events,
        n_convs=max(200, int(n_events / 50)),
        seed=42,
        n_files=n_files,
    )


def run_cdc_bench(spark, sf: float, workdir: str, feed_dir: str | None = None) -> dict:
    """Replay the synthetic change stream; return events/sec applied.

    ``feed_dir``: reuse an existing feed (the scaling run generates ONE
    input and replays it at both parallelism levels — same job, same input,
    per the scaling criterion)."""
    from xgeo_spark.fixtures.generator import write_change_stream_parquet
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
    from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig

    gen_s = 0.0
    if feed_dir is None:
        cfg = _cdc_config(sf, n_files=128)  # 32 input tasks per batch: the
        # scan/decode/normalize stage must expose >= cores tasks or half the
        # machine idles through the most expensive stage
        feed_dir = os.path.join(workdir, "feed")
        t_gen = time.perf_counter()
        write_change_stream_parquet(feed_dir, cfg)
        gen_s = time.perf_counter() - t_gen
    paths = sorted(
        os.path.join(feed_dir, f)
        for f in os.listdir(feed_dir)
        if f.endswith(".parquet")
    )

    # duplicates make the on-disk count != cfg.n_events; read footers only
    import pyarrow.parquet as pq

    n_events = sum(pq.read_metadata(p).num_rows for p in paths)

    table = ParquetLakeTable(spark, os.path.join(workdir, "lake"))
    # normalize_text=True: the full decode path of the north star (every
    # event's text through the vectorized pandas UDF), so the bench measures
    # the pipeline a real ingest would run, not a scan-and-write shell.
    pipe = CDCIngestPipeline(
        spark,
        feed_dir,
        table,
        lineage_path=os.path.join(workdir, "lineage"),
        config=IngestConfig(n_buckets=32, normalize_text=True),
    )

    # Warmup (untimed, disclosed): replay the first feed file into a SCRATCH
    # table so JIT compilation, whole-stage codegen, the parquet committer,
    # and the 32-process Python UDF worker pool are all up before the clock
    # starts. The metric is *sustained* events/sec — a streaming job at
    # 10^10 events runs warm for 99.99% of its life; measuring cold-start in
    # a 4-batch window would benchmark the JVM, not the pipeline.
    warm_table = ParquetLakeTable(spark, os.path.join(workdir, "warm_lake"))
    warm = CDCIngestPipeline(
        spark, feed_dir, warm_table,
        config=IngestConfig(n_buckets=32, normalize_text=True, lineage=False),
    )
    warm_batch = warm.source.read_batch(paths[:1])
    warm.apply_batch(warm_batch, 0)

    files_per_batch = max(1, len(paths) // 4)  # 4 batches regardless of layout
    t0 = time.perf_counter()
    stats = pipe.run_batch_replay(files_per_batch=files_per_batch)
    wall = time.perf_counter() - t0
    final_rows = table.read().count()
    return {
        "events": n_events,
        "batches": len(stats),
        "wall_s": round(wall, 3),
        "gen_s": round(gen_s, 3),
        "events_per_sec": round(n_events / wall, 1),
        "final_rows": final_rows,
    }


def run_query_bench(spark, sf_dir: str) -> dict[str, float]:
    from xgeo_spark.queries import QUERIES

    timings: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        fn = QUERIES[name][0]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def one_run(
    cpus: int, sf_dir: str, cdc_only: bool = False, feed_dir: str | None = None
) -> dict:
    from xgeo_spark.session import get_spark

    sf = _sf_of(sf_dir)
    spark = get_spark("xgeo_bench", parallelism=cpus, shuffle_partitions=cpus)
    workdir = tempfile.mkdtemp(prefix=f"xgeo_bench_{cpus}_")
    try:
        cdc = run_cdc_bench(spark, sf, workdir, feed_dir=feed_dir)
        queries = {} if cdc_only else run_query_bench(spark, sf_dir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
    total = cdc["wall_s"] + sum(queries.values())
    return {
        "metric": "cdc_apply_wall_plus_headline_queries",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "cdc": cdc,
    }


def scaling_run(sf_dir: str, n_events: int) -> dict:
    """Same job, same input, two parallelism levels; report efficiency.

    The input is generated ONCE (deterministic, seed=42) and replayed by
    both legs; each leg runs in a fresh subprocess (fresh JVM, fresh lake).
    The input must be large enough that parallel work dominates per-batch
    fixed overhead — Amdahl hides real scaling on toy inputs, which is also
    why the default here is 20M events rather than the per-round bench's 2M.
    """
    from xgeo_spark.fixtures.generator import ChangeStreamConfig, write_change_stream_parquet

    shared = tempfile.mkdtemp(prefix="xgeo_scaling_feed_")
    feed_dir = os.path.join(shared, "feed")
    # 128 feed files -> 32 input tasks per batch: the scan/decode stages must
    # expose at least as many tasks as the biggest leg has cores, or the
    # small leg saturates the pipeline and efficiency reads as flat
    cfg = ChangeStreamConfig(
        n_events=n_events,
        n_convs=max(200, n_events // 50),
        seed=42,
        n_files=128,
    )
    t0 = time.perf_counter()
    write_change_stream_parquet(feed_dir, cfg)
    gen_s = round(time.perf_counter() - t0, 1)

    legs = {}
    try:
        for cpus in (8, 32):
            out = os.path.join(tempfile.gettempdir(), f"xgeo_scaling_{cpus}.json")
            subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--cpus", str(cpus),
                    "--cdc-only",
                    "--sf-dir", sf_dir,
                    "--feed-dir", feed_dir,
                    "--json-out", out,
                ],
                check=True,
            )
            with open(out) as f:
                legs[cpus] = json.load(f)
    finally:
        shutil.rmtree(shared, ignore_errors=True)
    tp8 = legs[8]["cdc"]["events_per_sec"]
    tp32 = legs[32]["cdc"]["events_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    return {
        "metric": "cdc_scaling_efficiency_local8_vs_local32",
        "value": round(eff, 3),
        "unit": "ratio",
        "events_per_sec": {"local[8]": tp8, "local[32]": tp32},
        "wall_s": {
            "local[8]": legs[8]["cdc"]["wall_s"],
            "local[32]": legs[32]["cdc"]["wall_s"],
        },
        "events": legs[32]["cdc"]["events"],
        "gen_s": gen_s,
        "sf": legs[32]["sf"],
        "pass": eff >= 0.8,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cdc-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-events", type=int, default=20_000_000)
    ap.add_argument("--feed-dir", default=None,
                    help="replay an existing feed instead of generating one")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if args.scaling:
        result = scaling_run(args.sf_dir, args.scaling_events)
    else:
        result = one_run(args.cpus, args.sf_dir, cdc_only=args.cdc_only,
                         feed_dir=args.feed_dir)

    line = json.dumps(result)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line)
    print(line)


if __name__ == "__main__":
    main()
