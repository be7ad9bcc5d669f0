"""spark-submit entry point for the CDC ingest job.

Ship and run (the north-rule deployment shape):

    cd /root/repo && zip -qr /tmp/xgeo_spark.zip xgeo_spark
    spark-submit --py-files /tmp/xgeo_spark.zip xgeo_spark/cli.py \
        --feed-dir /data/feed --lake-dir /data/lake \
        --checkpoint-dir /data/ckpt --mode stream

On a cluster, pass ``--master`` through spark-submit as usual; the session
builder only pins ``local[N]`` when ``--local-cores`` is given (tests/bench).
The same binary replays bounded feeds (``--mode batch``) for backfills.

Reference analogue: the one-positional-arg CLI driver at
/root/reference/cmd/xgeo/main.go:14-19, grown the knobs a lake pipeline
needs (checkpoint, buckets, quarantine, lineage).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="xgeo-spark-ingest", description=__doc__)
    p.add_argument("--feed-dir", default=None, help="change-feed directory (offset-ordered .jsonl[.gz]/.parquet); required unless --maintenance")
    p.add_argument("--lake-dir", required=True, help="lake table root")
    p.add_argument("--maintenance", choices=["compact", "expire", "orphans"],
                   default=None,
                   help="run ONE table-maintenance action instead of "
                        "ingesting: compact (fold delta generations), "
                        "expire (manifest-diff snapshot expiry, "
                        "--keep-last), orphans (full-listing sweep of "
                        "crashed/losing commit attempts)")
    p.add_argument("--keep-last", type=int, default=4,
                   help="snapshots retained by --maintenance expire")
    p.add_argument("--orphan-grace", type=float, default=3600.0,
                   help="--maintenance orphans: skip attempt dirs/files "
                        "modified within the last SECONDS. The sweep "
                        "assumes NO concurrent writer unless this grace "
                        "exceeds any in-flight attempt's write duration — "
                        "an overtaken attempt dir looks orphaned while "
                        "its writer is still producing files (the "
                        "writer's job would die on missing files; table "
                        "state stays correct). 0 sweeps everything")
    p.add_argument("--mode", choices=["batch", "stream"], default="stream")
    p.add_argument("--checkpoint-dir", default=None, help="required for --mode stream")
    p.add_argument("--lineage-dir", default=None)
    p.add_argument("--quarantine-dir", default=None)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--files-per-batch", type=int, default=4)
    p.add_argument("--normalize-text", action="store_true")
    p.add_argument("--enable-patches", action="store_true",
                   help="fold op-'P' partial images against the table "
                        "(otherwise patches are quarantined)")
    p.add_argument("--min-lsn", type=int, default=None,
                   help="batch mode: resume watermark — skip feed files "
                        "whose footer stats prove max(lsn) <= MIN_LSN and "
                        "filter older events (see bootstrap_snapshot)")
    p.add_argument("--continuous", action="store_true",
                   help="stream mode: keep tailing instead of availableNow-and-exit")
    p.add_argument("--background-major", action="store_true",
                   help="run MAJOR compactions on a concurrent maintenance "
                        "thread (optimistic-commit rebase) instead of "
                        "inline in the ingest loop — ingest pauses drop to "
                        "the O(delta window) minor fold; compactor stats "
                        "print as one JSON line at shutdown")
    p.add_argument("--local-cores", type=int, default=None,
                   help="pin local[N] master (tests/bench); omit under spark-submit on a cluster")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.maintenance and not args.feed_dir:
        print("--feed-dir is required unless --maintenance", file=sys.stderr)
        return 2
    if args.mode == "stream" and not args.maintenance and not args.checkpoint_dir:
        print("--checkpoint-dir is required for --mode stream", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
    from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig

    if args.local_cores:
        from xgeo_spark.session import get_spark

        spark = get_spark("xgeo-ingest", parallelism=args.local_cores)
    else:
        # under spark-submit the master/conf come from the submit command
        spark = SparkSession.builder.appName("xgeo-ingest").getOrCreate()

    table = ParquetLakeTable(spark, args.lake_dir)

    if args.maintenance:
        if args.maintenance == "compact":
            out = {"action": "compact", **table.compact().as_row()}
        elif args.maintenance == "expire":
            out = {"action": "expire",
                   **table.expire_versions(keep_last=args.keep_last)}
        else:
            out = {"action": "orphans", **table.remove_orphan_files(
                older_than_seconds=args.orphan_grace)}
        print(json.dumps(out, default=str))
        return 0
    pipe = CDCIngestPipeline(
        spark,
        args.feed_dir,
        table,
        lineage_path=args.lineage_dir,
        config=IngestConfig(
            n_buckets=args.n_buckets,
            max_files_per_trigger=args.files_per_batch,
            normalize_text=args.normalize_text,
            lineage=args.lineage_dir is not None,
            quarantine_dir=args.quarantine_dir,
            enable_patches=args.enable_patches,
            background_major=args.background_major,
            # reliable-checkpoint root for iterative operators on this
            # session (components fixpoint rounds) — a subdir so it can't
            # collide with Structured Streaming's offsets/commits layout
            checkpoint_dir=(
                f"{args.checkpoint_dir.rstrip('/')}/reliable"
                if args.checkpoint_dir
                else None
            ),
        ),
    )

    compactor = None
    if args.background_major:
        from xgeo_spark.streaming.compactor import BackgroundCompactor

        # own table instance: races ingest through the filesystem commit
        # protocol, exactly as a separate maintenance process would
        compactor = BackgroundCompactor(
            ParquetLakeTable(spark, args.lake_dir)
        ).start()
    try:
        if args.mode == "batch":
            # batch ids derive from file position (chunk i -> batch i), so a
            # re-run over the same feed dir re-presents identical batch ids
            # and the sink's idempotency check skips everything already
            # committed — keep files_per_batch stable across re-runs of the
            # same lake
            stats = pipe.run_batch_replay(
                files_per_batch=args.files_per_batch, min_lsn=args.min_lsn
            )
            for s in stats:
                print(json.dumps(s.as_row()))
        else:
            pipe.run_stream(
                checkpoint_dir=args.checkpoint_dir,
                available_now=not args.continuous,
            )
    finally:
        if compactor is not None:
            cs = compactor.stop(drain=True)
            print(json.dumps({
                "compactor": {"majors": cs.majors,
                              "buckets_rewritten": cs.buckets_rewritten,
                              "conflicts_recomputed": cs.conflicts_recomputed}
            }))
    print(json.dumps({"final_version": table.current_version(),
                      "rows": table.read().count()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
