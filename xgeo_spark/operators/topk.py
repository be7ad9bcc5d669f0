"""Salted two-phase per-group top-k — the skew-safe window variant.

The registry's ``top_orders_per_customer`` uses the textbook shape
(``row_number() over (partition by group order by ...) <= k``): every row
of a group shuffles to ONE reducer partition, so at 100× scale a hot group
(one customer with 10^8 orders) becomes a straggler task.

``salted_topk`` keeps identical semantics with bounded per-task work:

- phase 1 windows over ``(group, salt)`` where the salt is derived from the
  row's own ordering column — a hot group's rows scatter over
  ``n_salts`` partitions and each salt keeps only its local top-k;
- phase 2 re-windows the ≤ ``n_salts * k`` survivors per group.

Top-k is distributive (the global top-k of a group is contained in the
union of per-salt top-ks, because dropping a row that is not in its salt's
top-k can never promote it globally), so the two plans are equivalent —
property-tested against the direct window in tests/test_operators_topk.py.

Both phases benefit from Spark's WindowGroupLimit pushdown (rank filters
are applied before the full sort materializes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def direct_topk(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Textbook per-group top-k (single window)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def salted_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    n_salts: int = 16,
    salt_src: str | None = None,
    rank_col: str = "rn",
) -> DataFrame:
    """Skew-safe per-group top-k; same output as :func:`direct_topk`.

    ``order_by`` must be a TOTAL order (include a unique tie-break column)
    for the two plans to be deterministically identical. ``salt_src`` names
    the column the salt is hashed from; any reasonably-unique column works
    (it only affects how evenly a hot group spreads, never the result).
    Default: hash of the whole row."""
    salt = (
        F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
        if salt_src is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    salted = df.withColumn("_salt", salt)
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    return direct_topk(survivors, group_cols, order_by, k, rank_col=rank_col)
