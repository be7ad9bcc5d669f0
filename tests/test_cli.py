"""CLI entry-point coverage (reference parity: the one-binary driver at
cmd/xgeo/main.go:14-19 plus kingpin flag parsing, SURVEY.md §2.1 #1 /
§2.2 #9): flag validation without Spark, and one end-to-end batch ingest
driven entirely through ``cli.main`` with its JSON stdout contract."""

from __future__ import annotations

import json

import pytest

from xgeo_spark.cli import build_parser, main
from xgeo_spark.fixtures.generator import (
    ChangeStreamConfig,
    generate_change_events,
    lww_oracle,
    write_change_stream,
)


def test_parser_required_and_defaults():
    p = build_parser()
    with pytest.raises(SystemExit):  # --feed-dir/--lake-dir are required
        p.parse_args([])
    args = p.parse_args(["--feed-dir", "/f", "--lake-dir", "/l"])
    assert args.mode == "stream"
    assert args.n_buckets == 64
    assert args.files_per_batch == 4
    assert not args.normalize_text and not args.continuous


def test_stream_mode_requires_checkpoint(capsys):
    rc = main(["--feed-dir", "/f", "--lake-dir", "/l", "--mode", "stream"])
    assert rc == 2
    assert "--checkpoint-dir" in capsys.readouterr().err


def test_cli_batch_ingest_end_to_end(spark, tmp_path, capsys):
    # `spark` fixture keeps the session getOrCreate()-able for the CLI path
    cfg = ChangeStreamConfig(n_events=3000, n_convs=60, seed=5, n_files=2)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    lake = str(tmp_path / "lake")

    rc = main([
        "--feed-dir", feed, "--lake-dir", lake, "--mode", "batch",
        "--files-per-batch", "1", "--n-buckets", "8",
        "--lineage-dir", str(tmp_path / "lineage"),
    ])
    assert rc == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    *stats, summary = lines
    assert len(stats) == 2 and not any(s["skipped"] for s in stats)
    expected = lww_oracle(generate_change_events(cfg))
    assert summary["rows"] == len(expected)

    # re-running the same command is a no-op (idempotent batch ids)
    rc2 = main([
        "--feed-dir", feed, "--lake-dir", lake, "--mode", "batch",
        "--files-per-batch", "1", "--n-buckets", "8",
    ])
    assert rc2 == 0
    lines2 = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    *stats2, summary2 = lines2
    assert all(s["skipped"] for s in stats2)
    assert summary2["rows"] == len(expected)


def test_cli_stream_mode_end_to_end(spark, tmp_path, capsys):
    """--mode stream with availableNow: tail the feed through the
    checkpointed streaming source, then exit; table matches the oracle."""
    cfg = ChangeStreamConfig(n_events=2000, n_convs=40, seed=13, n_files=2)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    rc = main([
        "--feed-dir", feed, "--lake-dir", str(tmp_path / "lake"),
        "--mode", "stream", "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--n-buckets", "8",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    expected = lww_oracle(generate_change_events(cfg))
    assert summary["rows"] == len(expected)


def test_cli_patch_feed_end_to_end(spark, tmp_path, capsys):
    """--enable-patches drives the fold through the CLI entry; without it
    the same feed's patches are quarantined (flag surface works)."""
    from xgeo_spark.fixtures.generator import (
        ChangeStreamConfig, fold_oracle, generate_change_events,
        write_change_stream_parquet,
    )
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable

    cfg = ChangeStreamConfig(
        n_events=4_000, n_convs=80, seed=35, n_files=2, patch_frac=0.15
    )
    feed = str(tmp_path / "feed")
    write_change_stream_parquet(feed, cfg)
    rc = main([
        "--feed-dir", feed,
        "--lake-dir", str(tmp_path / "lake"),
        "--mode", "batch",
        "--n-buckets", "4",
        "--enable-patches",
        "--local-cores", "8",
    ])
    assert rc == 0
    got = (
        ParquetLakeTable(spark, str(tmp_path / "lake"))
        .read().orderBy("conv_id", "turn_idx").toPandas()
    )
    expected = fold_oracle(generate_change_events(cfg))
    assert got["text"].fillna("∅").tolist() == expected["text"].fillna("∅").tolist()


def test_cli_maintenance_actions(spark, tmp_path, capsys):
    """--maintenance runs one table-maintenance action (no feed needed):
    compact folds the delta stack, expire GCs snapshots manifest-diff
    style, orphans sweeps unreferenced attempt dirs."""
    cfg = ChangeStreamConfig(n_events=2000, n_convs=40, seed=11, n_files=2)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    lake = str(tmp_path / "lake")
    assert main(["--feed-dir", feed, "--lake-dir", lake, "--mode", "batch",
                 "--files-per-batch", "1", "--n-buckets", "4"]) == 0
    capsys.readouterr()

    for action, key in [("compact", "version"), ("expire", "versions_kept"),
                        ("orphans", "orphan_files_removed")]:
        rc = main(["--lake-dir", lake, "--maintenance", action,
                   "--keep-last", "1"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["action"] == action and key in out, out

    # table unchanged by maintenance
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable

    got = (ParquetLakeTable(spark, lake).read()
           .orderBy("conv_id", "turn_idx").toPandas())
    expected = lww_oracle(generate_change_events(cfg))
    assert got["text"].fillna("∅").tolist() == expected["text"].fillna("∅").tolist()


def test_maintenance_does_not_require_feed_dir():
    p = build_parser()
    args = p.parse_args(["--lake-dir", "/l", "--maintenance", "expire"])
    assert args.maintenance == "expire" and args.feed_dir is None
    # ingest without a feed is still rejected (exercised in main())
    rc = main(["--lake-dir", "/l", "--mode", "batch"])
    assert rc == 2


def test_cli_background_major_end_to_end(spark, tmp_path, capsys):
    """--background-major: majors move to the concurrent compactor thread;
    final state still matches the oracle and the compactor stats line is
    emitted at shutdown."""
    cfg = ChangeStreamConfig(n_events=4000, n_convs=60, seed=11, n_files=4)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    lake = str(tmp_path / "lake")

    rc = main([
        "--feed-dir", feed, "--lake-dir", lake, "--mode", "batch",
        "--files-per-batch", "1", "--n-buckets", "4",
        "--background-major",
    ])
    assert rc == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    comp = [ln for ln in lines if "compactor" in ln]
    assert len(comp) == 1 and comp[0]["compactor"]["majors"] >= 0
    summary = [ln for ln in lines if "rows" in ln][-1]
    expected = lww_oracle(generate_change_events(cfg))
    assert summary["rows"] == len(expected)
