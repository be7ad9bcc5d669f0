"""Near-duplicate detection: MinHash+LSH and SimHash.

Scale design (the point of these over naive O(n²) comparison):
- MinHash signatures are computed in ONE Arrow-batched pandas UDF
  (numpy inner loop: a vectorized (n_hashes × n_shingles) universal-hash
  min-reduce per doc — no per-row Python function calls per hash).
- LSH banding happens JVM-side with higher-order array functions
  (`slice`/`transform`/`posexplode`/`hash`), so the candidate-generation
  shuffle keys (band_idx, band_hash) are produced inside whole-stage
  codegen. Candidates are found with a self-equi-join on the band key —
  a hash join on a high-cardinality key, which scales linearly with data
  (vs the quadratic cross join a naive near-dup does).
- Estimated Jaccard for candidate pairs = fraction of equal minhash slots,
  computed with `zip_with` — again JVM-side.

At 100 TB you'd additionally partition by band_hash and cap bucket sizes
(hot-bucket guard); the shape here already supports that (the join key IS
the bucket key).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# 31-bit Mersenne prime: with a,b < 2^31 and crc32 inputs x < 2^32,
# a*x + b < 2^63 + 2^31 fits uint64 exactly — the whole universal-hash
# min-reduce stays in native uint64 numpy (no object/arbitrary-precision
# ints, ~100x faster than a bigint path). 31-bit hash space is ample for
# per-document shingle sets (collision prob ~ n_shingles^2 / 2^31).
_MERSENNE_P = np.uint64((1 << 31) - 1)


def _minhash_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE_P), size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE_P), size=n_hashes, dtype=np.uint64)
    return a, b


def make_minhash_udf(n_hashes: int = 64, shingle_k: int = 5, seed: int = 42):
    """Returns a pandas UDF: text -> array<long> minhash signature."""
    a, b = _minhash_params(n_hashes, seed)
    a_col = a[:, None]
    b_col = b[:, None]

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not isinstance(t, str) or len(t) < shingle_k:
                out.append([0] * n_hashes)
                continue
            t = " ".join(t.lower().split())
            # byte-level k-shingles hashed with a base-257 polynomial mod p:
            # sliding_window_view gives an (n_shingles, k) uint8 matrix and
            # the rolling hash is k vectorized passes — no per-shingle
            # Python loop (the crc32-per-shingle version was the bench's
            # hot spot at ~10ms/KB of text).
            raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(raw) < shingle_k:
                out.append([0] * n_hashes)
                continue
            win = np.lib.stride_tricks.sliding_window_view(raw, shingle_k)
            h = np.zeros(win.shape[0], dtype=np.uint64)
            for j in range(shingle_k):
                h = (h * np.uint64(257) + win[:, j]) % _MERSENNE_P
            base = np.unique(h)
            # universal hashing: (a*x + b) mod p, min over shingles per row
            hashed = (a_col * base[None, :] + b_col) % _MERSENNE_P
            out.append(hashed.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash_sig


def _cap_hot_buckets(
    bands: DataFrame, key_cols: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop LSH buckets with more than ``max_bucket_size`` members.

    The 100-TB guard: one degenerate bucket (empty-text signatures,
    boilerplate headers, a hash pathology) turns the linear bucket
    self-join into an O(k²) blowup on that key. A windowed count over the
    bucket key costs one shuffle ON THE SAME KEY the candidate join needs
    (the exchange is reused), and dropping over-full buckets bounds the
    worst-case join output at max_bucket_size² per bucket. The recall
    trade-off is explicit: members of a mega-bucket are overwhelmingly
    near-identical boilerplate, exactly what exact-hash dedup (cheaper)
    already catches."""
    if max_bucket_size is None:
        return bands
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    return (
        bands.withColumn("_bsize", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsize") <= max_bucket_size)
        .drop("_bsize")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    min_est_jaccard: float = 0.0,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs with estimated Jaccard.

    Returns (id_a, id_b, est_jaccard) for pairs sharing >=1 LSH band.
    ``max_bucket_size`` enables the hot-bucket cap (see
    :func:`_cap_hot_buckets`) — set it at scale.
    """
    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    sig_udf = make_minhash_udf(n_hashes, shingle_k, seed)

    # spread the signature computation across all cores: small tables often
    # arrive as a single file split, which would pin the UDF to one task
    n_part = df.sparkSession.sparkContext.defaultParallelism
    sigs = df.repartition(n_part).select(
        F.col(id_col).alias("_id"), sig_udf(F.col(text_col)).alias("_sig")
    )

    # JVM-side banding: band b = hash(slice(sig, b*r+1, r))
    bands = sigs.select(
        "_id",
        "_sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda bidx: F.hash(F.slice("_sig", bidx * r + 1, r)),
            )
        ).alias("band_idx", "band_hash"),
    )
    bands = _cap_hot_buckets(bands, ["band_idx", "band_hash"], max_bucket_size)

    left = bands.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"),
        "band_idx", "band_hash",
    )
    right = bands.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"),
        "band_idx", "band_hash",
    )
    cand = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(n_hashes)
    )
    out = cand.select(
        "id_a", "id_b", F.round(est, 4).alias("est_jaccard")
    ).filter(F.col("est_jaccard") >= min_est_jaccard)
    return out.orderBy("id_a", "id_b")


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constant set). CRC32 is LINEAR
    over GF(2) in both its input and its seed, so structurally-related
    tokens (w0001, w0002, ...) produce correlated hash bit-columns and the
    simhash vote on many bits sits at the decision boundary — measured: a
    single-word edit in a 4000-word doc flipped ~27/64 bits. The avalanche
    mix breaks the linearity; the same edit flips 0-3 bits."""
    with np.errstate(over="ignore"):
        z = z.copy()
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


@pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens; two salted crc32s form the
    64-bit token hash (avalanche-mixed, see :func:`_mix64`); bit-vote
    accumulation via numpy unpackbits."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not isinstance(t, str) or not t.strip():
            out[i] = 0
            continue
        toks = t.lower().split()
        h = np.fromiter(
            (
                (zlib.crc32(w.encode()) << 32) | zlib.crc32(w.encode(), 0xBEEF)
                for w in toks
            ),
            dtype=np.uint64, count=len(toks),
        )
        h = _mix64(h)
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        votes = bits.sum(axis=0) * 2 - len(toks)  # +1 per set bit, -1 per unset
        sim = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
        out[i] = int.from_bytes(sim.tobytes(), "little", signed=True)
    return pd.Series(out)


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), _simhash64(F.col(text_col)).alias("simhash")
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bands: int = 4,
    max_hamming: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Hamming-near candidate pairs via band decomposition (multi-probe).

    The 64-bit simhash is split into ``n_bands`` contiguous bit-bands and
    docs are bucketed on every (band_idx, band_bits) pair. By pigeonhole,
    two hashes within hamming distance < n_bands agree exactly on at least
    one full band — so recall is GUARANTEED for d <= n_bands-1, unlike the
    single fixed-prefix bucket this replaces (which missed near-dups whose
    differing bits fell in the prefix). Exact hamming distance is then
    computed per candidate with bit_count(xor), all JVM-side.

    Scale: banding multiplies rows by n_bands (cheap, no Python), and the
    candidate join stays an equi-join on a high-cardinality key — linear,
    the same shuffle shape as the MinHash LSH path. ``max_hamming`` post-
    filters candidates (guaranteed complete when max_hamming < n_bands)."""
    assert 64 % n_bands == 0
    w = 64 // n_bands
    mask = (1 << w) - 1
    sig = simhash_signatures(df, id_col, text_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftrightunsigned(F.col("simhash"), i * w)
                .bitwiseAND(F.lit(mask))
                .alias("band_bits"),
            )
            for i in range(n_bands)
        ]
    )
    bands = sig.select(
        F.col(id_col), "simhash", F.explode(band_structs).alias("b")
    ).select(F.col(id_col), "simhash", "b.band_idx", "b.band_bits")
    bands = _cap_hot_buckets(bands, ["band_idx", "band_bits"], max_bucket_size)
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"),
        "band_idx", "band_bits",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"),
        "band_idx", "band_bits",
    )
    out = (
        a.join(b, ["band_idx", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
    )
    if max_hamming is not None:
        out = out.filter(F.col("hamming") <= max_hamming)
    return out.orderBy("id_a", "id_b")
