"""The literal deployment shape: ``spark-submit --py-files xgeo_spark.zip
xgeo_spark/cli.py`` in a FRESH JVM + Python process, package imported from
the zip (cwd is a scratch dir, PYTHONPATH scrubbed), then the written lake
is verified against the independent pandas LWW oracle.

This is the one flow the in-process CLI tests cannot cover: that the
package actually ships via --py-files with no repo checkout on the
driver's path — the north rule's "run via spark-submit --py-files".
Reference analogue: the installed-binary invocation of
/root/reference/cmd/xgeo/main.go:14-19.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "xgeo_spark.zip")
    pkg = os.path.join(REPO, "xgeo_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    from xgeo_spark.fixtures.generator import (
        ChangeStreamConfig,
        generate_change_events,
        lww_oracle,
        write_change_stream,
    )

    cfg = ChangeStreamConfig(n_events=3000, n_convs=60, seed=7, n_files=2)
    feed = str(tmp_path / "feed")
    write_change_stream(feed, cfg)
    lake = str(tmp_path / "lake")
    zpath = _zip_package(str(tmp_path))
    # the entry script also rides the zip: extract just cli.py as the
    # spark-submit primary resource (a deployment copies one file + one zip)
    cli_copy = str(tmp_path / "cli.py")
    shutil.copyfile(os.path.join(REPO, "xgeo_spark", "cli.py"), cli_copy)

    env = {
        k: v
        for k, v in os.environ.items()
        if k != "PYTHONPATH"  # nothing may leak the repo onto sys.path
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zpath,
            cli_copy,
            "--feed-dir", feed,
            "--lake-dir", lake,
            "--mode", "batch",
            "--files-per-batch", "1",
            "--n-buckets", "8",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [
        json.loads(ln)
        for ln in proc.stdout.strip().splitlines()
        if ln.startswith("{")
    ]
    *stats, summary = lines
    assert len(stats) == 2 and not any(s["skipped"] for s in stats)

    expected = lww_oracle(generate_change_events(cfg))
    assert summary["rows"] == len(expected)

    # value-level: the submitted JVM wrote the lake; read it back here and
    # compare per-turn text under stable (conv_id, turn_idx) order — the
    # input_hint invariant
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable

    got = (
        ParquetLakeTable(spark, lake)
        .read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got["text"].fillna("∅").tolist() == (
        expected["text"].fillna("∅").tolist()
    )
