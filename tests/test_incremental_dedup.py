"""Incremental MinHash index (operators/incremental_dedup.py): after any
stream of inserts/updates/deletes, pairs derived FROM THE PERSISTED INDEX
must equal a full re-sign + LSH recompute over the live corpus — the
VERDICT r4 item-3 equivalence gate."""

from __future__ import annotations

import pandas as pd

from xgeo_spark.functions.dedup_text import minhash_lsh_pairs
from xgeo_spark.operators.incremental_dedup import MinHashIndex

PARAMS = dict(n_hashes=32, n_bands=8, shingle_k=5, seed=42)

_BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep dark forest to find some tasty food for dinner"
)


def _text(i: int, variant: int = 0) -> str:
    words = _BASE.split()
    # doc pairs (2k, 2k+1) share most of their text -> near-dups; the
    # variant index perturbs a couple of words so updates move signatures
    words[i % len(words)] = f"tok{i // 2}"
    if variant:
        words[(i + 7) % len(words)] = f"var{variant}"
        words[(i + 13) % len(words)] = f"alt{variant}"
    return " ".join(words) + f" tail{i // 2}"


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "op", "lsn", "text"])
    )


def _stream(spark, idx):
    """3-batch I/U/D stream; returns the live {doc_id: text} state and the
    final batch's rows."""
    live: dict[int, str] = {}
    b0 = [(i, "I", 100 + i, _text(i)) for i in range(20)]
    for d, _, _, t in b0:
        live[d] = t
    idx.apply_batch(_batch(spark, b0), batch_id=0)

    b1 = (
        [(i, "U", 200 + i, _text(i, variant=1)) for i in range(0, 8)]
        + [(i, "D", 240 + i, None) for i in (16, 17)]
    )
    for d, op, _, t in b1:
        if op == "D":
            live.pop(d)
        else:
            live[d] = t
    idx.apply_batch(_batch(spark, b1), batch_id=1)

    b2 = (
        [(i, "I", 300 + i, _text(i)) for i in range(20, 28)]
        + [(4, "U", 340, _text(4, variant=2)), (18, "D", 341, None)]
    )
    for d, op, _, t in b2:
        if op == "D":
            live.pop(d)
        else:
            live[d] = t
    idx.apply_batch(_batch(spark, b2), batch_id=2)
    return live, b2


def _full_recompute(spark, live):
    corpus = _batch(
        spark, [(d, "I", 0, t) for d, t in sorted(live.items())]
    ).select("doc_id", "text")
    return minhash_lsh_pairs(corpus, id_col="doc_id", text_col="text", **PARAMS)


def _rows(df):
    return sorted(
        (int(r["id_a"]), int(r["id_b"]), float(r["est_jaccard"]))
        for r in df.collect()
    )


def test_incremental_index_equals_full_recompute(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "mh"), **PARAMS).create(n_buckets=4)
    live, _ = _stream(spark, idx)
    assert _rows(idx.all_pairs()) == _rows(_full_recompute(spark, live))


def test_pairs_for_new_batch_is_new_vs_corpus(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "mh"), **PARAMS).create(n_buckets=4)
    live, b2 = _stream(spark, idx)
    touched = {d for d, op, _, _ in b2 if op != "D"}
    got = _rows(
        idx.pairs_for(
            _batch(spark, [r for r in b2 if r[1] != "D"]).select("doc_id")
        )
    )
    exp = [
        r for r in _rows(_full_recompute(spark, live))
        if r[0] in touched or r[1] in touched
    ]
    assert got == exp
    assert got, "stream is built so the last batch has near-dup pairs"


def test_apply_batch_is_idempotent(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "mh"), **PARAMS).create(n_buckets=4)
    live, b2 = _stream(spark, idx)
    before = _rows(idx.all_pairs())
    s1, s2 = idx.apply_batch(_batch(spark, b2), batch_id=2)  # replay
    assert s1.skipped and s2.skipped
    assert _rows(idx.all_pairs()) == before


def test_delete_removes_all_pairs_for_doc(spark, tmp_path):
    idx = MinHashIndex(spark, str(tmp_path / "mh"), **PARAMS).create(n_buckets=4)
    live, _ = _stream(spark, idx)
    victim = max(live)
    idx.apply_batch(
        _batch(spark, [(victim, "D", 900, None)]), batch_id=3
    )
    live.pop(victim)
    rows = _rows(idx.all_pairs())
    assert all(victim not in (a, b) for a, b, _ in rows)
    assert rows == _rows(_full_recompute(spark, live))
