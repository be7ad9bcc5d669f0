"""Deterministic synthetic change-stream generator (FIXTURES.md §1-2).

Produces a binlog/WAL-style CDC feed over the transcript table fixed by
BASELINE.json input_hint:

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

keyed by (conv_id, turn_idx), with injected anomalies:

- out-of-order delivery (events shuffled within a ±lsn window, so arrival
  order != commit order),
- exact duplicates (same lsn re-delivered),
- deletes / update-after-delete sequences,
- one mid-stream schema change at the 60% mark: `tool_meta` column appears
  and `turn_idx` is emitted as int64 (widening candidate).

Everything is vectorized numpy/pandas and chunk-written, so generating tens
of millions of events for the bench stays cheap. Files are offset-ordered
(`events-00000.jsonl`, ...) so a file-based streaming source replays the
feed deterministically — the stand-in for a binlog tail, mirroring the
reference's "tail a source file, push records downstream" model
(/root/reference/cmd/xgeo/main.go:44-51) without a message broker.

The wire format is NDJSON — the same canonical one-JSON-document-per-line
shape the reference emits (/root/reference/cmd/xgeo/main.go:57-61) — with
optional .gz compression, exercising the suffix-dispatch decode path
(/root/reference/cmd/xgeo/main.go:25-40).
"""

from __future__ import annotations

import bz2
import gc
import gzip
import json
import os
from contextlib import contextmanager
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "code", "browse"])

# Small deterministic sentence bank with unicode + whitespace edge cases for
# the normalization UDF (FIXTURES.md §1 "text" notes).
_SENTENCE_BANK_SIZE = 512


def _sentence_bank(rng: np.random.Generator) -> np.ndarray:
    vocab = np.array(
        [
            "the", "model", "replied", "with", "a", "plan", "to", "refactor",
            "query", "engine", "spark", "shuffle", "partition", "merge",
            "naïve", "café", "逐次", "ストリーム", "данные", "Ωmega", "tab\there",
            "double  space", "trailing ", " leading", "emoji🙂", "quote\"q",
        ]
    )
    lengths = rng.integers(4, 60, size=_SENTENCE_BANK_SIZE)
    out = []
    for n in lengths:
        words = vocab[rng.integers(0, len(vocab), size=int(n))]
        out.append(" ".join(words.tolist()))
    return np.array(out, dtype=object)


@contextmanager
def _gc_paused():
    """Python's generational GC re-scans every live object each gen-2
    collection; allocating tens of millions of strings makes that
    quadratic (measured: 14s -> 426s for 4M -> 6M rows of string concat).
    Nothing in the generator creates reference cycles, so pausing the
    collector during generation is safe and restores linear scaling."""
    was = gc.isenabled()
    gc.disable()
    try:
        yield
    finally:
        if was:
            gc.enable()


@dataclass
class ChangeStreamConfig:
    n_events: int = 10_000
    n_convs: int = 400
    mean_turns: float = 6.0
    seed: int = 42
    update_frac: float = 0.25          # of non-insert events
    delete_frac: float = 0.05
    patch_frac: float = 0.0            # of non-insert events: partial images
    out_of_order_frac: float = 0.10
    out_of_order_window: int = 1000
    duplicate_frac: float = 0.05
    schema_change_at: float = 0.60     # fraction of stream where v2 starts
    zipf_s: float = 1.2                # conv_id hot-key skew
    n_files: int = 8
    compression: str | None = None     # None | "gzip" | "bzip2"
    base_ts: str = "2026-01-01T00:00:00"
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        # Per-file offset bases reserve `lo * 2` headroom per slice, which
        # guarantees globally-unique offsets only while < 100% of events are
        # duplicated; reject configs that would silently break the
        # (lsn, offset) tie-break contract.
        if not 0.0 <= self.duplicate_frac < 1.0:
            raise ValueError(
                f"duplicate_frac must be in [0, 1), got {self.duplicate_frac}"
            )


class _GlobalArtifacts:
    """Stream-level deterministic state every slice derives from: the key
    universe, Zipf weights, base-insert permutation, sentence bank, schema
    cut. Computed identically (seeded) in every worker process, so slices
    can be generated independently and in parallel."""

    def __init__(self, cfg: ChangeStreamConfig):
        rng = np.random.default_rng(cfg.seed)
        self.bank = _sentence_bank(rng)
        n_convs = cfg.n_convs
        turns_per_conv = 1 + rng.poisson(cfg.mean_turns, size=n_convs)
        self.conv_ids = np.array(
            [f"conv-{i:08d}" for i in range(n_convs)], dtype=object
        )
        self.key_conv = np.repeat(np.arange(n_convs), turns_per_conv)
        self.n_keys = len(self.key_conv)
        # turn index within each conversation, fully vectorized: global
        # position minus the conversation's starting offset
        starts = np.concatenate([[0], np.cumsum(turns_per_conv)[:-1]])
        self.key_turn = np.arange(self.n_keys) - np.repeat(starts, turns_per_conv)

        # Zipf weight per conversation -> hot keys
        ranks = np.arange(1, n_convs + 1, dtype=np.float64)
        conv_w = 1.0 / ranks ** cfg.zipf_s
        key_w = conv_w[self.key_conv]
        self.key_w = key_w / key_w.sum()

        # first n_keys events insert every key once (shuffled)
        self.n_base = min(self.n_keys, cfg.n_events)
        self.base_order = rng.permutation(self.n_keys)[: self.n_base]
        self.cut = int(cfg.n_events * cfg.schema_change_at)
        self.meta_pool = np.array(
            ['{"latency_ms": %d, "retries": %d}' % (m, r_) for m, r_ in
             zip(rng.integers(1, 5000, size=64), rng.integers(0, 3, size=64))],
            dtype=object,
        )


def _slice_bounds(n_events: int, n_files: int) -> list[tuple[int, int]]:
    edges = np.linspace(0, n_events, n_files + 1).astype(np.int64)
    return [(int(edges[i]), int(edges[i + 1])) for i in range(n_files)]


# Generation unit within a file slice. Large single-shot slices thrash the
# allocator under multiprocess concurrency on this host (measured: 625k-row
# slices x 32 workers = 249 s for a 20M-event feed; the SAME volume as
# 156k-row slices = 8.5 s — a 30x cliff). Every producer (in-memory feed,
# jsonl writer, parquet writer) walks the SAME fixed grid, each chunk
# seeding its own rng from its global lower bound, so chunking can never
# change the generated events.
_SUBSLICE_ROWS = 131_072


def _sub_bounds(lo: int, hi: int) -> list[tuple[int, int]]:
    return [(l2, min(l2 + _SUBSLICE_ROWS, hi)) for l2 in range(lo, hi, _SUBSLICE_ROWS)]


def _generate_slice(
    cfg: ChangeStreamConfig, art: _GlobalArtifacts, lo: int, hi: int
) -> pd.DataFrame:
    """Events with lsn in [lo, hi), arrival-shuffled, duplicates injected.

    Per-event randomness comes from ``default_rng([seed, lo])`` so any slice
    is reproducible in isolation; duplicates and out-of-order jitter act
    within the slice (slices = feed files, so redelivery/reordering inside a
    file models the binlog-segment behavior; cross-file ordering is already
    covered by lsn >> arrival decoupling at batch boundaries)."""
    rng = np.random.default_rng([cfg.seed, lo])
    n = hi - lo
    lsn = np.arange(lo, hi, dtype=np.int64)  # commit order

    in_base = lsn < art.n_base
    n_rest = int((~in_base).sum())
    key_idx = np.empty(n, dtype=np.int64)
    key_idx[in_base] = art.base_order[lsn[in_base]]
    if n_rest:
        key_idx[~in_base] = rng.choice(art.n_keys, size=n_rest, p=art.key_w)

    op = np.full(n, "U", dtype=object)
    op[in_base] = "I"
    r = rng.random(n_rest)
    rest_ops = op[~in_base]
    rest_ops[r < cfg.delete_frac] = "D"
    # partial images (op P, "null means unchanged") take the next slice of
    # the same uniform draw so D/P/U fractions are independent of each other
    rest_ops[(r >= cfg.delete_frac) & (r < cfg.delete_frac + cfg.patch_frac)] = "P"
    op[~in_base] = rest_ops

    conv = art.conv_ids[art.key_conv[key_idx]]
    turn = art.key_turn[key_idx].astype(np.int64)
    role = _ROLES[art.key_turn[key_idx] % 3]
    is_tool = role == "tool"
    tool = np.where(is_tool, _TOOLS[rng.integers(0, 3, size=n)], None)

    # text varies per event so LWW picks are observable; suffix = lsn.
    # A plain comprehension (with the collector paused) beats pandas
    # str.cat: object-string ufunc reduction churns the cycle GC.
    sel = art.bank[rng.integers(0, len(art.bank), size=n)]
    text = np.fromiter(
        (f"{s} #{i}" for s, i in zip(sel.tolist(), lsn.tolist())),
        dtype=object, count=n,
    )
    text[op == "D"] = None
    role = np.where(op == "D", None, role)
    tool = np.where(op == "D", None, tool)

    # patches set a SUBSET of columns; null means "unchanged". Two
    # deterministic variants: text-only (the common transcript edit) and
    # tool-only (attach/replace tool metadata without touching the text).
    text_patch = np.zeros(n, dtype=bool)
    if cfg.patch_frac > 0:
        is_p = op == "P"
        text_patch = is_p & (rng.random(n) < 0.5)
        tool_patch = is_p & ~text_patch
        text = np.where(tool_patch, None, text)
        role = np.where(is_p, None, role)
        tool = np.where(
            tool_patch, _TOOLS[rng.integers(0, 3, size=n)],
            np.where(is_p, None, tool),
        )

    base_ts = np.datetime64(cfg.base_ts, "us")
    ts = base_ts + (lsn * 1_000_000 + rng.integers(0, 1_000_000, size=n)).astype(
        "timedelta64[us]"
    )

    schema_version = np.where(lsn < art.cut, 1, 2).astype(np.int32)
    tool_meta = np.where(
        (schema_version == 2) & is_tool & (op != "D") & ~text_patch,
        art.meta_pool[rng.integers(0, len(art.meta_pool), size=n)],
        None,
    )

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": conv,
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
            "schema_version": schema_version,
            "tool_meta": tool_meta,
        }
    )

    # --- inject exact duplicates (same lsn re-delivered) ---
    if cfg.duplicate_frac > 0:
        n_dup = int(n * cfg.duplicate_frac)
        dup_rows = df.iloc[rng.integers(0, n, size=n_dup)]
        df = pd.concat([df, dup_rows], ignore_index=True)

    # --- out-of-order arrival: perturb sort key within ±window ---
    jitter = np.zeros(len(df))
    ooo = rng.random(len(df)) < cfg.out_of_order_frac
    jitter[ooo] = rng.uniform(-cfg.out_of_order_window, cfg.out_of_order_window,
                              size=int(ooo.sum()))
    arrival_key = df["lsn"].to_numpy() + jitter
    df = df.iloc[np.argsort(arrival_key, kind="stable")].reset_index(drop=True)
    # globally unique, per-file-monotone offsets (2x headroom for dups)
    df["offset"] = lo * 2 + np.arange(len(df), dtype=np.int64)
    return df


def generate_change_events(cfg: ChangeStreamConfig) -> pd.DataFrame:
    """Return the full event feed as one pandas DataFrame in ARRIVAL order
    (slice-concatenated — byte-identical to what the feed writers emit).

    Columns: lsn int64, offset int64, op str, conv_id str, turn_idx int64,
    role str, text str, tool str, ts datetime64[us], schema_version int32,
    tool_meta str|None.
    """
    with _gc_paused():
        art = _GlobalArtifacts(cfg)
        parts = [
            _generate_slice(cfg, art, lo2, hi2)
            for lo, hi in _slice_bounds(cfg.n_events, cfg.n_files)
            for lo2, hi2 in _sub_bounds(lo, hi)
        ]
        return pd.concat(parts, ignore_index=True)


def _write_jsonl_rows(part: pd.DataFrame, f) -> None:
    # int64 turn_idx in v2, int32-ranged in v1 is a schema concern at READ
    # time; JSON wire format is width-agnostic which is exactly the point.
    recs = part.copy()
    recs["ts"] = recs["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    for row in recs.to_dict(orient="records"):
        if row.get("schema_version") == 1:
            row.pop("tool_meta", None)  # column genuinely absent pre-change
        f.write(json.dumps({k: _clean(v) for k, v in row.items()},
                           ensure_ascii=False))
        f.write("\n")


def _clean(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def write_change_stream(out_dir: str, cfg: ChangeStreamConfig) -> list[str]:
    """Write the feed as offset-ordered NDJSON files; return the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    ext = {"gzip": ".jsonl.gz", "bzip2": ".jsonl.bz2"}.get(cfg.compression, ".jsonl")
    opener = {"gzip": gzip.open, "bzip2": bz2.open}.get(cfg.compression, open)
    with _gc_paused():
        art = _GlobalArtifacts(cfg)
        for i, (lo, hi) in enumerate(_slice_bounds(cfg.n_events, cfg.n_files)):
            path = os.path.join(out_dir, f"events-{i:05d}{ext}")
            with opener(path, "wt", encoding="utf-8") as f:
                for lo2, hi2 in _sub_bounds(lo, hi):
                    _write_jsonl_rows(_generate_slice(cfg, art, lo2, hi2), f)
            paths.append(path)
    return paths


def _parquet_schema(v2: bool):
    import pyarrow as pa

    fields = [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64() if v2 else pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("schema_version", pa.int32()),
    ]
    if v2:
        fields.append(("tool_meta", pa.string()))
    fields.append(("offset", pa.int64()))
    return pa.schema(fields)


_ART_CACHE: dict[tuple, "_GlobalArtifacts"] = {}


def _cached_artifacts(cfg: ChangeStreamConfig) -> "_GlobalArtifacts":
    """Per-process memo of the (deterministic) stream-level artifacts.

    A pool worker handles many file slices of the SAME stream; rebuilding
    the key universe / Zipf weights / permutation per slice is pure waste
    and at 10^7+ conversations costs seconds per file. Keyed by the config
    fields the artifacts derive from; bounded to one entry (workers only
    ever see one stream per pool)."""
    key = (cfg.seed, cfg.n_convs, cfg.n_events, cfg.mean_turns, cfg.zipf_s,
           cfg.schema_change_at)
    if _ART_CACHE.get("key") != key:  # type: ignore[comparison-overlap]
        _ART_CACHE.clear()
        with _gc_paused():
            _ART_CACHE["key"] = key  # type: ignore[assignment]
            _ART_CACHE["art"] = _GlobalArtifacts(cfg)  # type: ignore[assignment]
    return _ART_CACHE["art"]  # type: ignore[return-value]


def _write_parquet_slice(args) -> str:
    """Worker: generate slice i and write one parquet file (module-level so
    multiprocessing can pickle it; artifacts recomputed from the seed).

    Generates and appends one _SUBSLICE_ROWS chunk at a time through a
    ParquetWriter: bounded per-worker allocation (the 30x concurrency cliff
    note at _SUBSLICE_ROWS), and the explicit schema keeps all-null chunks
    (e.g. a chunk with no tool rows) type-stable across row groups."""
    cfg, lo, hi, path = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    art = _cached_artifacts(cfg)
    # whole-FILE schema decision, same rule as the single-shot writer:
    # any v2 row in [lo, hi) -> v2 layout (v2 rows are lsn >= cut)
    v2 = hi > art.cut
    schema = _parquet_schema(v2)
    writer = None
    try:
        for lo2, hi2 in _sub_bounds(lo, hi):
            # GC pause is scoped PER CHUNK: pausing across the whole file
            # lets pandas/pyarrow reference cycles pile up over chunks,
            # growing the working set back to exactly the big-allocation
            # cliff the chunking exists to avoid.
            with _gc_paused():
                part = _generate_slice(cfg, art, lo2, hi2)
                if not v2:
                    part = part.drop(columns=["tool_meta"])
                    part = part.astype({"turn_idx": np.int32})
                tbl = pa.Table.from_pandas(
                    part[schema.names], schema=schema, preserve_index=False
                )
            if writer is None:
                # modest row groups keep the files SPLITTABLE: parquet
                # scan splits align to row-group boundaries, so one-row-
                # group files cap the decode stage at one task per file
                # no matter how many cores the cluster has (measured:
                # the 8->32-core scaling wall).
                writer = pq.ParquetWriter(path, schema)
            writer.write_table(tbl, row_group_size=16_384)
            del part, tbl
    finally:
        if writer is not None:
            writer.close()
    return path


def write_change_stream_parquet(
    out_dir: str,
    cfg: ChangeStreamConfig,
    workers: int | None = None,
    file_range: tuple[int, int] | None = None,
) -> list[str]:
    """Parquet wire-format variant (faster to scan; used by the bench).

    v1 files carry turn_idx as int32 and NO tool_meta column; v2 files carry
    int64 + tool_meta — the honest schema-evolution-on-disk fixture.

    ``workers > 1`` generates files in parallel processes — slices are
    seeded independently (default_rng([seed, lo])), so the output is
    identical regardless of worker count.

    ``file_range=(i, j)`` writes only files [i, j) of the SAME global
    stream (identical bytes to a full run's files i..j-1, since slices are
    independently seeded). This is how a feed too large for disk is
    produced in waves: generate a wave, replay it, delete it, repeat —
    the 10^9+-event long-run protocol.
    """
    os.makedirs(out_dir, exist_ok=True)
    jobs = [
        (cfg, lo, hi, os.path.join(out_dir, f"events-{i:05d}.parquet"))
        for i, (lo, hi) in enumerate(_slice_bounds(cfg.n_events, cfg.n_files))
    ]
    if file_range is not None:
        jobs = jobs[file_range[0] : file_range[1]]
    if workers is None:
        workers = min(len(jobs), os.cpu_count() or 1) if cfg.n_events >= 1_000_000 else 1
    if workers <= 1:
        return [_write_parquet_slice(j) for j in jobs]
    import multiprocessing as mp

    # one BLAS/OpenMP thread per worker: otherwise every worker spins up a
    # full set of spin-waiting math-lib threads (workers x cores threads ->
    # measured 10M context switches/sec and a 48% sys-time collapse)
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
    # fork, not spawn: spawn re-imports the caller's __main__, which fork-
    # bombs any driver script lacking a main guard; fork just inherits the
    # loaded interpreter (workers only touch numpy/pyarrow, never the JVM)
    with mp.get_context("fork").Pool(workers) as pool:
        return list(pool.map(_write_parquet_slice, jobs))


def lww_oracle(events: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas reference applier (FIXTURES.md §5).

    Last writer per (conv_id, turn_idx) by commit lsn wins; a winning 'D'
    removes the key. Returns the final table sorted by (conv_id, turn_idx).
    """
    e = events.sort_values(["lsn", "offset"], kind="stable")
    last = e.groupby(["conv_id", "turn_idx"], as_index=False).tail(1)
    final = last[last["op"] != "D"].copy()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_meta"]
    for c in cols:
        if c not in final.columns:
            final[c] = None
    return (
        final[cols]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": np.int64})
    )


def fold_oracle(events: pd.DataFrame) -> pd.DataFrame:
    """Patch-aware reference applier: sequential fold in (lsn, offset)
    order per key. Full images (I/U) replace the whole row, 'P' overrides
    only its non-null columns ("null means unchanged"), 'D' removes the
    key (a later P re-creates a partial row). Reduces to ``lww_oracle``
    when no P events exist. O(n) python loop — oracle-only, never the
    engine path."""
    payload = ["role", "text", "tool", "ts", "tool_meta"]
    e = events.sort_values(["lsn", "offset"], kind="stable")
    for c in payload:
        if c not in e.columns:
            e = e.assign(**{c: None})
    state: dict = {}
    cols_idx = {c: i for i, c in enumerate(
        ["op", "conv_id", "turn_idx", *payload]
    )}
    for row in e[["op", "conv_id", "turn_idx", *payload]].itertuples(
        index=False, name=None
    ):
        k = (row[cols_idx["conv_id"]], row[cols_idx["turn_idx"]])
        op = row[cols_idx["op"]]
        if op == "D":
            state.pop(k, None)
        elif op == "P":
            cur = state.get(k, dict.fromkeys(payload))
            new = dict(cur)
            for c in payload:
                v = row[cols_idx[c]]
                if not pd.isna(v):
                    new[c] = v
            state[k] = new
        else:
            state[k] = {c: row[cols_idx[c]] for c in payload}
    out = pd.DataFrame(
        [
            {"conv_id": k[0], "turn_idx": k[1], **v}
            for k, v in state.items()
        ],
        columns=["conv_id", "turn_idx", *payload],
    )
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    obj_cols = [c for c in out.columns if c != "ts"]
    out[obj_cols] = out[obj_cols].where(pd.notna(out[obj_cols]), None)
    return (
        out.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": np.int64})
    )
