"""Incremental IVF index maintenance (functions/vectors.py:
upsert_ivf_index / read_ivf_live / ivf_cell_stats / maybe_refine_ivf) —
the VERDICT r4 item-4 gates:

1. after a stream of inserts/updates/deletes applied via
   `upsert_ivf_index`, search results from the incrementally-maintained
   index equal the results from an index REBUILT from scratch over the
   live vector set under the same centroids (same k, same nprobe);
2. recall vs brute force holds a floor at an equal read fraction;
3. `maybe_refine_ivf` stays put below its drift thresholds and, when
   forced/triggered, folds the tombstone sidecar away without changing
   the live row set.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xgeo_spark.functions.vectors import (
    ivf_cell_stats,
    ivf_search,
    kmeans_refine,
    maybe_refine_ivf,
    read_ivf_live,
    upsert_ivf_index,
    write_ivf_index,
)

DIM = 16


def _vec(rng, center):
    return [float(x) for x in center + rng.standard_normal(DIM) * 0.3]


@pytest.fixture(scope="module")
def ivf_setup(spark, tmp_path_factory):
    """Base index of 160 clustered vectors + the live-state dict, then a
    3-batch I/U/D stream applied through upsert_ivf_index."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, DIM)) * 3
    live: dict[int, list[float]] = {
        i: _vec(rng, centers[i % 8]) for i in range(160)
    }
    base = spark.createDataFrame(
        [(i, v) for i, v in live.items()], ["vec_id", "embedding"]
    )
    mat, ids = kmeans_refine(
        base, [live[i] for i in range(8)], list(range(1, 9)), n_rounds=2
    )
    path = str(tmp_path_factory.mktemp("ivf_inc") / "ivf")
    write_ivf_index(base, path, mat, ids)

    # batch 1: inserts (new cluster members) + updates that MOVE cells
    # (vector jumps to a different cluster's neighborhood)
    b1 = [(i, "I", 1000 + i, _vec(rng, centers[i % 8])) for i in range(160, 180)]
    b1 += [(i, "U", 1200 + i, _vec(rng, centers[(i + 3) % 8])) for i in range(0, 12)]
    # batch 2: deletes + a re-update of an already-updated id
    b2 = [(i, "D", 1300 + i, [0.0] * DIM) for i in range(40, 50)]
    b2 += [(5, "U", 1399, _vec(rng, centers[6]))]
    for rows in (b1, b2):
        df = spark.createDataFrame(
            rows, ["vec_id", "op", "lsn", "embedding"]
        )
        upsert_ivf_index(spark, path, df, op_col="op")
        for i, op, _, v in rows:
            if op == "D":
                live.pop(i, None)
            else:
                live[i] = v
    return path, mat, ids, live


def _search_rows(spark, path, q, k=10, nprobe=3):
    return [
        (r["vec_id"], r["cosine"])
        for r in ivf_search(spark, path, q, k=k, nprobe=nprobe).collect()
    ]


def test_live_read_equals_live_state(spark, ivf_setup):
    path, _, _, live = ivf_setup
    got = {
        r["vec_id"]: r["embedding"]
        for r in read_ivf_live(spark, path).collect()
    }
    assert set(got) == set(live)
    for i, v in live.items():
        assert got[i] == pytest.approx(v)


def test_incremental_equals_rebuilt_search(spark, ivf_setup, tmp_path):
    """The headline equivalence: incremental index == scratch rebuild of
    the live set under the same centroids, for every query/nprobe tried."""
    path, mat, ids, live = ivf_setup
    rebuilt = str(tmp_path / "ivf_rebuilt")
    live_df = spark.createDataFrame(
        [(i, v) for i, v in live.items()], ["vec_id", "embedding"]
    )
    write_ivf_index(live_df, rebuilt, mat, ids)
    rng = np.random.default_rng(99)
    queries = [live[0], live[165], [float(x) for x in rng.standard_normal(DIM)]]
    for q in queries:
        for nprobe in (2, 3, 8):
            assert _search_rows(spark, path, q, nprobe=nprobe) == _search_rows(
                spark, rebuilt, q, nprobe=nprobe
            ), (q[:2], nprobe)


def test_recall_floor_at_equal_read_fraction(spark, ivf_setup):
    """nprobe=8 == all cells: the incremental index at full probe must
    reproduce brute force exactly; at nprobe=3 (~3/8 read fraction) recall
    must clear 0.8 on clustered data."""
    path, _, _, live = ivf_setup
    q = np.asarray(live[0])

    def brute(k=10):
        scored = sorted(
            (
                (round(float(np.asarray(v) @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6), i)
                for i, v in live.items()
            ),
            key=lambda t: (-t[0], t[1]),
        )
        return [i for _, i in scored[:k]]

    truth = brute()
    full = [i for i, _ in _search_rows(spark, path, list(q), nprobe=8)]
    assert full == truth
    probed = {i for i, _ in _search_rows(spark, path, list(q), nprobe=3)}
    assert len(probed & set(truth)) / len(truth) >= 0.8


def test_upsert_is_o_batch_append_and_probe_still_prunes(spark, ivf_setup):
    """The maintenance cost model: upserts never rewrite existing files
    (append-only into cell dirs + the _moved sidecar), and the probed
    search still plans a partition filter — stale-version resolution rides
    a broadcast join, not a wider scan."""
    path, mat, ids, live = ivf_setup
    import re

    got = ivf_search(spark, path, live[0], k=5, nprobe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    stats = ivf_cell_stats(spark, path)
    assert stats["n_live"] == len(live)
    assert stats["n_moved"] > 0  # tombstones outstanding pre-refine


def test_refine_trigger_and_fold(spark, ivf_setup):
    path, _, _, live = ivf_setup
    # thresholds sky-high -> no rebuild
    assert maybe_refine_ivf(
        spark, path, skew_threshold=1e9, moved_frac_threshold=1e9
    ) is False
    before = sorted(
        (r["vec_id"], tuple(round(x, 6) for x in r["embedding"]))
        for r in read_ivf_live(spark, path).collect()
    )
    q = live[0]
    res_before = _search_rows(spark, path, q, nprobe=8)
    assert maybe_refine_ivf(spark, path, force=True) is True
    stats = ivf_cell_stats(spark, path)
    assert stats["n_moved"] == 0  # tombstones folded away
    after = sorted(
        (r["vec_id"], tuple(round(x, 6) for x in r["embedding"]))
        for r in read_ivf_live(spark, path).collect()
    )
    assert after == before
    # full-probe search is centroid-independent: identical post-refine
    assert _search_rows(spark, path, q, nprobe=8) == res_before
