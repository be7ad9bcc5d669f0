"""Connected-components / duplicate-cluster resolution (operators/components.py)."""

import pytest
from pyspark.sql import functions as F

from xgeo_spark.operators.components import connected_components, dup_clusters


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_transitivity(spark):
    # a-b, b-c, c-d: one component even though a and d share no edge
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_separate_components_and_min_label(spark):
    got = _cc(spark, [(5, 9), (9, 7), (20, 30), (40, 40), (2, 1)])
    # self-loop (40,40) is dropped -> 40 is isolated, not emitted
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20, 1: 1, 2: 1}


def test_string_ids(spark):
    got = _cc(spark, [("b", "c"), ("a", "b"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_long_chain_converges(spark):
    # diameter 19: needs several propagation rounds, still one component
    got = _cc(spark, [(i, i + 1) for i in range(20)])
    assert set(got.values()) == {0}
    assert len(got) == 21


def test_max_iter_exceeded_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(20)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_fixpoint_property(spark):
    # invariant: no edge may join two different clusters
    edges = [(1, 2), (2, 3), (10, 11), (3, 10), (50, 60), (60, 70), (80, 81)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    comp = connected_components(df)
    a = comp.withColumnRenamed("node", "src").withColumnRenamed("component", "ca")
    b = comp.withColumnRenamed("node", "dst").withColumnRenamed("component", "cb")
    bad = df.join(a, "src").join(b, "dst").filter(F.col("ca") != F.col("cb")).count()
    assert bad == 0


def test_random_graph_vs_union_find(spark):
    # one deterministic random graph, checked against a union-find oracle
    import numpy as np

    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 80, size=(200, 2))
        if a != b
    ]

    parent = list(range(80))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {n for e in edges for n in e}
    # canonical component label = min node id in the component
    comp_min: dict[int, int] = {}
    for n in touched:
        comp_min[find(n)] = min(comp_min.get(find(n), n), n)
    expected = {n: comp_min[find(n)] for n in touched}

    assert _cc(spark, edges) == expected


def test_dup_clusters_representative_and_size(spark):
    pairs = spark.createDataFrame(
        [(3, 7), (7, 9), (100, 101)], ["id_a", "id_b"]
    )
    rows = dup_clusters(pairs).collect()
    got = {(r["cluster_id"], r["member_id"], r["n_members"]) for r in rows}
    assert got == {
        (3, 3, 3), (3, 7, 3), (3, 9, 3),
        (100, 100, 2), (100, 101, 2),
    }


def test_reliable_checkpoint_long_chain(spark, tmp_path):
    """The cluster path (checkpoint_dir set): reliable checkpoint() per
    round instead of localCheckpoint — verified on a diameter-24 chain
    plus a second component, and by checkpoint files actually landing in
    the directory (executor-loss safety is storage-backed lineage)."""
    import os

    ckpt = str(tmp_path / "ckpt")
    edges = [(i, i + 1) for i in range(24)] + [(100, 101), (101, 102)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    comp = connected_components(df, checkpoint_dir=ckpt)
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert {got[i] for i in range(25)} == {0}
    assert got[100] == got[101] == got[102] == 100
    assert len(got) == 28
    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "no reliable checkpoint files written"


def test_env_var_selects_reliable_checkpoints(spark, tmp_path, monkeypatch):
    import os

    ckpt = str(tmp_path / "ckpt_env")
    monkeypatch.setenv("XGEO_CHECKPOINT_DIR", ckpt)
    pairs = spark.createDataFrame([(3, 7), (7, 9)], ["id_a", "id_b"])
    rows = dup_clusters(pairs).collect()
    assert {(r["cluster_id"], r["member_id"]) for r in rows} == {
        (3, 3), (3, 7), (3, 9)
    }
    assert any(fs for _, _, fs in os.walk(ckpt)), "env-var path not taken"


def test_session_checkpoint_root_reaches_cluster_path(spark, tmp_path, monkeypatch):
    """r4 wiring: with NO env var and NO explicit param, a session-level
    checkpoint root (what the CLI's --checkpoint-dir sets through
    IngestConfig.checkpoint_dir) flips connected_components onto reliable
    checkpoints — same output, storage-backed lineage."""
    import os

    monkeypatch.delenv("XGEO_CHECKPOINT_DIR", raising=False)
    from xgeo_spark.queries import emb_dup_clusters

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01"
    )
    before = {
        (r["cluster_id"], r["member_id"])
        for r in emb_dup_clusters(spark, sf_dir).collect()
    }
    ckpt = str(tmp_path / "session_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    after = {
        (r["cluster_id"], r["member_id"])
        for r in emb_dup_clusters(spark, sf_dir).collect()
    }
    assert after == before and before
    assert any(fs for _, _, fs in os.walk(ckpt)), (
        "session checkpoint root was not used"
    )


def test_pipeline_config_sets_session_checkpoint_dir(spark, tmp_path):
    """IngestConfig.checkpoint_dir (the CLI --checkpoint-dir/reliable
    wiring) lands in sc.setCheckpointDir on pipeline construction."""
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
    from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig

    ckpt = str(tmp_path / "cfg_ckpt")
    feed = tmp_path / "feed"
    feed.mkdir()
    t = ParquetLakeTable(spark, str(tmp_path / "lake"))
    CDCIngestPipeline(
        spark, str(feed), t,
        config=IngestConfig(n_buckets=4, lineage=False, checkpoint_dir=ckpt),
    )
    got = spark.sparkContext.getCheckpointDir()
    assert got is not None and ckpt.split("/")[-1] in str(got)
