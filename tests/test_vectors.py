"""Similarity-search correctness: brute-force cosine is the oracle; the
LSH-bucketed ANN path must (a) only ever return true cosine values and
(b) reach reasonable recall on clustered data (multi-probe higher)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xgeo_spark.functions.vectors import (
    brute_force_pairs_topk,
    cosine_topk,
    lsh_bucket_neighbors,
)

DIM = 16


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, DIM)) * 3
    rows = []
    for i in range(200):
        c = centers[i % 8]
        v = c + rng.standard_normal(DIM) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()


def _np_cosine(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_topk_matches_numpy(vec_df):
    rows = {r["vec_id"]: r["embedding"] for r in vec_df.collect()}
    q = rows[0]
    want = sorted(
        ((round(_np_cosine(v, q), 6), i) for i, v in rows.items()),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    got = cosine_topk(vec_df, q, k=5).collect()
    assert [(r["cosine"], r["vec_id"]) for r in got] == want


def test_lsh_candidates_have_exact_cosines(vec_df):
    cand = lsh_bucket_neighbors(vec_df, n_planes=8, seed=42).limit(50).collect()
    rows = {r["vec_id"]: r["embedding"] for r in vec_df.collect()}
    assert cand, "LSH produced no candidates on clustered data"
    for r in cand:
        assert r["cosine"] == pytest.approx(
            round(_np_cosine(rows[r["id_a"]], rows[r["id_b"]]), 6), abs=1e-6
        )


def test_lsh_recall_vs_brute_force(vec_df):
    truth = {
        (r["id_a"], r["id_b"])
        for r in brute_force_pairs_topk(vec_df, k=3).collect()
        if r["id_a"] < r["id_b"] and r["cosine"] > 0.9
    }
    assert truth
    single = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucket_neighbors(vec_df, n_planes=10, seed=42).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in lsh_bucket_neighbors(
            vec_df, n_planes=10, seed=42, multi_probe=True
        ).collect()
    }
    recall_single = len(truth & single) / len(truth)
    recall_multi = len(truth & multi) / len(truth)
    assert recall_multi >= recall_single
    assert recall_multi >= 0.8, (recall_single, recall_multi)


def test_lsh_deterministic_across_runs(vec_df):
    a = lsh_bucket_neighbors(vec_df, n_planes=8, seed=42).collect()
    b = lsh_bucket_neighbors(vec_df, n_planes=8, seed=42).collect()
    assert a == b


def test_minhash_est_jaccard_tracks_truth(spark):
    from xgeo_spark.functions.dedup_text import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 5
    docs = [
        (0, base),
        (1, base),                        # exact dup
        (2, base.replace("quick", "slow")),  # near dup
        (3, "completely different content about spark shuffles and partitions " * 5),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", n_hashes=64, n_bands=16, shingle_k=5
        ).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] > 0.5
    assert (0, 3) not in pairs or pairs[(0, 3)] < 0.2


def test_simhash_hamming(spark):
    from xgeo_spark.functions.dedup_text import simhash_near_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, base.replace("gamma", "kappa"))],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(df, "doc_id", "text", n_bands=4).collect()
    }
    assert got[(0, 1)] == 0
    if (0, 2) in got:
        assert got[(0, 2)] > 0


def test_simhash_band_recall_vs_exact(spark):
    """Pigeonhole guarantee: with n_bands bands, EVERY pair within hamming
    distance <= n_bands-1 must be a candidate — including pairs whose
    differing bits sit in the top prefix, the round-1 single-prefix recall
    gap."""
    import itertools

    from xgeo_spark.functions.dedup_text import (
        simhash_near_pairs,
        simhash_signatures,
    )

    # long docs with a large distinct vocabulary: substituting k words flips
    # O(k) simhash bits at positions spread uniformly over the 64-bit space
    # (some land in the top prefix). Graded k gives pairs on both sides of
    # the max_hamming cut.
    base_words = [f"w{i:04d}" for i in range(4000)]
    docs = [(0, " ".join(base_words))]
    for i in range(1, 9):
        ws = list(base_words)
        for j in range(5 * i):
            ws[(i * 37 + j * 101) % len(ws)] = ws[(i * 37 + j * 101) % len(ws)] + "x"
        docs.append((i, " ".join(ws)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    n_bands = 4
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(df, "doc_id", "text").collect()
    }
    exact_near = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= n_bands - 1
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, "doc_id", "text", n_bands=n_bands).collect()
    }
    assert exact_near, "fixture produced no near pairs; weaken substitutions"
    assert exact_near <= cand  # guaranteed recall, no misses

    # max_hamming post-filter keeps exactly the within-distance pairs
    filtered = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            df, "doc_id", "text", n_bands=n_bands, max_hamming=n_bands - 1
        ).collect()
    }
    assert filtered == exact_near


def test_hot_bucket_cap(spark):
    """The 100-TB guard: a mega-bucket of identical boilerplate is dropped
    (bounding the self-join blowup) while genuine near-dup pairs in
    normal-sized buckets survive."""
    from xgeo_spark.functions.dedup_text import minhash_lsh_pairs

    boiler = "lorem ipsum dolor sit amet " * 10
    real = "the quick brown fox jumps over the lazy dog and keeps running " * 5
    docs = [(i, boiler) for i in range(30)]
    docs += [(100, real), (101, real + " extra tail")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", max_bucket_size=10
        ).collect()
    }
    assert (100, 101) in capped                            # real pair survives
    assert not any(a < 30 and b < 30 for a, b in capped)   # mega-bucket gone

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "doc_id", "text").collect()
    }
    assert any(a < 30 and b < 30 for a, b in uncapped)     # cap did the work


def _np_near_dup(rows, tau, n_bands, band_width):
    """Reference implementation of cosine_near_dup's exact semantics."""
    import itertools

    ids = sorted(rows)
    out = {}
    for i, j in itertools.combinations(ids, 2):
        a, b = np.asarray(rows[i]), np.asarray(rows[j])
        sa, sb = (a >= 0), (b >= 0)
        shares_band = any(
            np.array_equal(
                sa[k * band_width:(k + 1) * band_width],
                sb[k * band_width:(k + 1) * band_width],
            )
            for k in range(n_bands)
        )
        c = round(_np_cosine(a, b), 6)
        if shares_band and c >= tau:
            out[(i, j)] = c
    return out


def test_cosine_near_dup_matches_reference_semantics(vec_df):
    """Band hashing + candidate join + exact verify must equal the
    straightforward per-pair evaluation of the same semantics (DIM=16 ->
    4 bands of 4)."""
    from xgeo_spark.functions.vectors import cosine_near_dup

    rows = {r["vec_id"]: r["embedding"] for r in vec_df.collect()}
    want = _np_near_dup(rows, tau=0.9, n_bands=4, band_width=4)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_dup(
            vec_df, tau=0.9, n_bands=4, band_width=4
        ).collect()
    }
    assert want, "clustered fixture produced no near-dup pairs"
    assert got == pytest.approx(want)


def test_cosine_near_dup_pigeonhole_recall(spark):
    """A pair flipping fewer than n_bands sign bits is ALWAYS a candidate,
    wherever the flipped bits fall (including across distinct bands)."""
    from xgeo_spark.functions.vectors import cosine_near_dup

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16) + 2.0  # all-positive signs, norm >> flip
    flipped = base.copy()
    flipped[0] = -0.01   # band 0 (top bit of the whole sign vector)
    flipped[9] = -0.01   # band 2 — two flips, two different bands
    df = spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [float(x) for x in flipped])],
        ["vec_id", "embedding"],
    )
    got = cosine_near_dup(df, tau=0.5, n_bands=4, band_width=4).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]


def test_cosine_near_dup_hot_bucket_cap(spark):
    """max_bucket_size drops over-full (band, hash) buckets entirely —
    identical vectors all land in the same buckets, so a cap below the
    group size suppresses every pair."""
    from xgeo_spark.functions.vectors import cosine_near_dup

    v = [1.0] * 16
    df = spark.createDataFrame(
        [(i, v) for i in range(10)], ["vec_id", "embedding"]
    )
    uncapped = cosine_near_dup(df, tau=0.9, n_bands=4, band_width=4).count()
    capped = cosine_near_dup(
        df, tau=0.9, n_bands=4, band_width=4, max_bucket_size=5
    ).count()
    assert uncapped == 45
    assert capped == 0


def test_cosine_near_dup_plan_is_bucketed_join(vec_df):
    """Scale guard: the candidate join must be an equi-join on the band
    keys (shuffle or broadcast hash), NEVER a cartesian/broadcast-nested-
    loop — the whole point of banding is linear candidate generation."""
    from xgeo_spark.functions.vectors import cosine_near_dup

    out = cosine_near_dup(vec_df, tau=0.9, n_bands=4, band_width=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
