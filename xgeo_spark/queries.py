"""Operator-coverage query registry for the driver contract.

Each entry is ``name -> (spark_fn, oracle_sql | None)``:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the idiomatic-Spark plan;
- ``oracle_sql`` — ANSI SQL DuckDB runs on the same parquet tables; the
  driver compares row count + schema + order-insensitive value hash.
  ``None`` marks genuinely non-SQL-expressible ops (the driver then does a
  rows-only check).

Numeric discipline (so value hashes match across engines): money/value
aggregates go through ``CAST(x AS DECIMAL(18,2))`` before SUM — decimal
sums are exact and engine-order-independent — then cast back to double;
time arithmetic uses integer microseconds (``unix_micros`` /
``epoch_us``); float similarity scores are rounded. Every computed column
is aliased identically on both sides.

Operator parity notes reference SURVEY.md §2: the reference engine itself
has no joins/aggs/windows (§2.3); this registry implements the target
operator set (§2.4) plus the training-data-pipeline operators the task
brief requires (dedup family, similarity search, text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(c, alias):
    """Exact, order-independent money sum: decimal accumulate, double out."""
    return F.sum(F.col(c).cast("decimal(18,2)")).cast("double").alias(alias)


def _dec_avg(c, alias):
    return (
        F.sum(F.col(c).cast("decimal(18,2)")).cast("double")
        / F.count(F.col(c))
    ).alias(alias)


_SQL_DEC_SUM = "CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"
_SQL_DEC_AVG = "(CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({c}))"


# ---------------------------------------------------------------- TPC-H-ish

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy agg with arithmetic; only 7 of 11 columns
    are read (check ReadSchema in .explain) and the date filter is pushed
    to the parquet scan.

    Deliberate cost note: the money sums accumulate in DECIMAL (measured
    ~5x a double sum) because exactness is the point — decimal addition is
    associative/commutative, so the result is bit-identical across any
    partitioning AND across engines (the DuckDB oracle), where float sums
    are order-dependent. Real TPC-H stores these columns as DECIMAL; this
    is the semantics a money pipeline wants, not an optimization gap."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            _dec_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            _dec_avg("l_quantity", "avg_qty"),
            _dec_avg("l_extendedprice", "avg_price"),
            _dec_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       {_SQL_DEC_SUM.format(c='l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       {_SQL_DEC_AVG.format(c='l_quantity')} AS avg_qty,
       {_SQL_DEC_AVG.format(c='l_extendedprice')} AS avg_price,
       {_SQL_DEC_AVG.format(c='l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """3-way join + agg + top-k. Customer is small -> broadcast; lineitem
    x orders co-partition on the order key."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark, sf_dir):
    """6-way star join: all dimension tables broadcast, one shuffle for the
    final agg — the plan a 100 TB fact table needs."""
    region = F.broadcast(_t(spark, sf_dir, "region"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    cust = F.broadcast(_t(spark, sf_dir, "customer"))
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def top_orders_per_customer(spark, sf_dir):
    """Window top-k: row_number over (custkey) ordered by price. At 100x
    with hot customers, use the equivalent salted two-phase plan
    (operators/topk.salted_topk — property-tested identical)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


def running_customer_spend(spark, sf_dir):
    """Running-sum window (ROWS frame), decimal-exact."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn(
            "cum_spend",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"),
        )
        .select("o_custkey", "o_orderkey", "cum_spend")
    )


RUNNING_SPEND_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
FROM orders
"""


# ---------------------------------------------------------------- events / CDC-ish

def events_lww_latest(spark, sf_dir):
    """The north-star dedup operator on the driver's events table:
    last writer per (user_id, event_type) by (ts, event_id)."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


EVENTS_LWW_SQL = """
SELECT user_id, event_type, event_id, ts, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


def events_hourly(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dec_sum("value", "sum_value"),
        )
        .orderBy("hour")
    )


EVENTS_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {_SQL_DEC_SUM.format(c='value')} AS sum_value
FROM events GROUP BY 1 ORDER BY 1
"""


def events_json_props(spark, sf_dir):
    """Semi-structured payload: JSON path extraction + agg (the canonical
    CDC 'dynamic properties' pattern, reference analogue io/interface.go:4)."""
    return (
        _t(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_rollup(spark, sf_dir):
    """ROLLUP grouping sets over (event_type, hour-of-day)."""
    ev = _t(spark, sf_dir, "events").withColumn("hr", F.hour("ts"))
    return (
        ev.rollup("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"), _dec_sum("value", "sum_value"))
        .orderBy(F.col("event_type").asc_nulls_first(), F.col("hr").asc_nulls_first())
    )


EVENTS_ROLLUP_SQL = f"""
SELECT event_type, CAST(hr AS INT) AS hr, COUNT(*) AS n,
       {_SQL_DEC_SUM.format(c='value')} AS sum_value
FROM (SELECT *, EXTRACT(hour FROM ts) AS hr FROM events)
GROUP BY ROLLUP (event_type, hr)
ORDER BY event_type NULLS FIRST, hr NULLS FIRST
"""


def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) — lag + running conditional sum,
    all integer-microsecond arithmetic."""
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros needs TIMESTAMP (not NTZ); session tz is UTC so the cast
    # is instant-preserving
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag("ts").over(w_ord).cast("timestamp"))
    gap_us = ts_us - prev_us
    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("is_new", F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("is_new").over(
                w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)) AS gap_us
  FROM events),
s AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g)
SELECT user_id, MAX(session_id) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id
"""


def asof_latest_event_per_user(spark, sf_dir):
    """As-of/argmax: the latest event at-or-before a cutoff, per user —
    max_by aggregation (map-side combinable), not a window sort."""
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    ord_key = F.struct(F.col("ts").alias("t"), F.col("event_id").alias("e"))
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") <= cutoff)
        .groupBy("user_id")
        .agg(
            F.max_by("event_id", ord_key).alias("last_event_id"),
            F.max_by("event_type", ord_key).alias("last_event_type"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


ASOF_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       last_ts
FROM (
  SELECT user_id, event_id, event_type,
         MAX(ts) OVER (PARTITION BY user_id) AS last_ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
WHERE rn = 1 ORDER BY user_id
"""


# ---------------------------------------------------------------- joins/set ops

def customers_without_orders(spark, sf_dir):
    """Anti join: customers with no orders since 2001 (non-empty at sf0.01;
    with no date filter every synthetic customer has orders)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
ORDER BY c_custkey
"""


def suppliers_with_returns_semi(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


SEMI_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_returnflag = 'R')
ORDER BY s_suppkey
"""


def buyer_seller_set_ops(spark, sf_dir):
    """Set operators: (click-users INTERSECT purchase-users) EXCEPT
    error-prone users (>= 14 error events) — each leg non-trivial at sf0.01."""
    ev = _t(spark, sf_dir, "events")
    u = lambda t: ev.filter(F.col("event_type") == t).select("user_id").distinct()  # noqa: E731
    error_prone = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 14)
        .select("user_id")
    )
    return u("click").intersect(u("purchase")).exceptAll(error_prone).orderBy("user_id")


SET_OPS_SQL = """
(SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
 INTERSECT
 SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
EXCEPT
(SELECT user_id FROM events WHERE event_type = 'error'
 GROUP BY user_id HAVING COUNT(*) >= 14)
ORDER BY user_id
"""


def part_string_funcs(spark, sf_dir):
    """Scalar string/expression library over part."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").isin("PROMO", "ECONOMY"))
        .select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.length(F.col("p_name")).alias("name_len"),
            F.substring(F.col("p_name"), 1, 5).alias("name_prefix"),
            F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            (F.col("p_retailprice").cast("decimal(18,2)") * 2).cast("double").alias("double_price"),
        )
        .orderBy("p_partkey")
    )


STRING_FUNCS_SQL = """
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price
FROM part WHERE p_type IN ('PROMO', 'ECONOMY') ORDER BY p_partkey
"""


def high_value_nations_having(spark, sf_dir):
    """groupBy + HAVING + conditional aggregation."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dec_sum("c_acctbal", "total_bal"),
            F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0)).alias("n_positive"),
        )
        .filter(F.col("n_customers") > 20)
        .orderBy("n_name")
    )


HAVING_SQL = f"""
SELECT n_name, COUNT(*) AS n_customers,
       {_SQL_DEC_SUM.format(c='c_acctbal')} AS total_bal,
       CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name HAVING COUNT(*) > 20 ORDER BY n_name
"""


# ---------------------------------------------------------------- documents

def _norm_text_col():
    return F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))


def doc_exact_dedup(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy): keep min doc_id per md5,
    report group size. The baseline dedup operator for training pipelines."""
    d = _t(spark, sf_dir, "documents").withColumn("h", F.md5(_norm_text_col()))
    return (
        d.groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


DOC_EXACT_DEDUP_SQL = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY keep_doc_id
"""


def doc_token_stats(spark, sf_dir):
    """Token counting JVM-side (codegen) — whitespace tokens + char stats."""
    d = _t(spark, sf_dir, "documents")
    norm = _norm_text_col()
    n_tokens = F.when(F.length(norm) == 0, 0).otherwise(F.size(F.split(norm, " ")))
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.length(F.col("text")).alias("n_chars_actual"),
        (F.length(norm) - F.length(F.regexp_replace(norm, " ", ""))).alias("n_spaces"),
    ).orderBy("doc_id")


DOC_TOKEN_STATS_SQL = """
WITH n AS (SELECT doc_id, lang, text,
                  lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
           FROM documents)
SELECT doc_id, lang,
       CASE WHEN length(norm) = 0 THEN 0
            ELSE CAST(len(string_split(norm, ' ')) AS INT) END AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(length(norm) - length(replace(norm, ' ', '')) AS BIGINT) AS n_spaces
FROM n ORDER BY doc_id
"""


def doc_ngram_jaccard_anchor(spark, sf_dir):
    """Word-3-gram Jaccard of every document against doc 0 — the exact
    n-gram near-dup primitive, entirely with higher-order array builtins
    (no Python). Integer set sizes only -> hash-exact oracle."""
    d = _t(spark, sf_dir, "documents")
    words = F.split(_norm_text_col(), " ")
    n = F.size(words)
    grams = F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                    F.element_at(words, i + 3),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    docs = d.select("doc_id", grams.alias("grams"))
    anchor = docs.filter(F.col("doc_id") == 0).select(
        F.col("grams").alias("anchor_grams")
    )
    return (
        docs.crossJoin(F.broadcast(anchor))
        .select(
            "doc_id",
            F.size(F.array_intersect("grams", "anchor_grams")).alias("n_common"),
            F.size(F.array_union("grams", "anchor_grams")).alias("n_union"),
        )
        .orderBy("doc_id")
    )


DOC_NGRAM_SQL = """
WITH g AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(words)-2),
             i -> array_to_string(list_slice(words, i, i+2), ' ')))
         ELSE [] END AS grams
  FROM (SELECT doc_id,
               string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))), ' ') AS words
        FROM documents)),
a AS (SELECT grams AS anchor_grams FROM g WHERE doc_id = 0)
SELECT g.doc_id,
       CAST(len(list_intersect(g.grams, a.anchor_grams)) AS INT) AS n_common,
       CAST(len(list_distinct(list_concat(g.grams, a.anchor_grams))) AS INT) AS n_union
FROM g, a ORDER BY g.doc_id
"""


def doc_text_analysis(spark, sf_dir):
    """Pandas-UDF text analysis: lang-id, quality, fingerprint, BPE-ish
    tokens. Not SQL-expressible (heuristics live in the UDFs) -> rows-only
    driver check; determinism is covered by tests/test_text_functions.py."""
    from xgeo_spark.functions.text import (
        bpe_ish_token_count,
        doc_fingerprint,
        lang_id,
        normalize_text,
        quality_score,
    )

    d = _t(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        lang_id(norm).alias("lang_pred"),
        quality_score(norm).alias("quality"),
        doc_fingerprint(norm).alias("fingerprint"),
        bpe_ish_token_count(norm).alias("n_bpe_tokens"),
    ).orderBy("doc_id")


def doc_minhash_near_dup(spark, sf_dir):
    """MinHash+LSH near-duplicate candidate pairs (rows-only check)."""
    from xgeo_spark.functions.dedup_text import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text",
        n_hashes=64, n_bands=16, shingle_k=5, min_est_jaccard=0.2,
    )


def doc_incremental_near_dup(spark, sf_dir):
    """Near-dup of a NEW document batch against a PERSISTED MinHash index
    (operators/incremental_dedup.py) — the incremental form of
    `doc_minhash_near_dup` a daily 100-TB pipeline actually runs: the
    corpus (doc_id % 5 != 4, ~80%) is folded into the index via the lake's
    CDC merge, the "new arrivals" (doc_id % 5 == 4) land as a second
    batch, and only THAT batch is band-joined against the index — the
    corpus is never re-signed. Same LSH parameters as the full-recompute
    query, so the output equals its pairs restricted to pairs touching a
    new doc (equivalence asserted under I/U/D streams in
    tests/test_incremental_dedup.py). Oracle: golden VALUES pin (minhash
    is not SQL-re-derivable; same class as doc_minhash_near_dup)."""
    import tempfile

    from xgeo_spark.operators.incremental_dedup import MinHashIndex

    d = _t(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="xgeo_mhidx_")
    idx = MinHashIndex(
        spark, root, n_hashes=64, n_bands=16, shingle_k=5, seed=42
    ).create(n_buckets=8)
    corpus = d.filter(F.col("doc_id") % 5 != 4).select(
        "doc_id", F.lit("I").alias("op"),
        F.col("doc_id").cast("long").alias("lsn"), "text",
    )
    idx.apply_batch(corpus, batch_id=0)
    new_batch = d.filter(F.col("doc_id") % 5 == 4).select(
        "doc_id", F.lit("I").alias("op"),
        (F.col("doc_id") + 1_000_000).cast("long").alias("lsn"), "text",
    )
    idx.apply_batch(new_batch, batch_id=1)
    return idx.pairs_for(new_batch.select("doc_id"), min_est_jaccard=0.2)


def doc_simhash_buckets(spark, sf_dir):
    """SimHash 64-bit signatures + hamming-adjacent bucket counts.
    Oracle: golden VALUES pin (hash not re-derivable in SQL; semantics
    tested in tests/test_vectors.py)."""
    from xgeo_spark.functions.dedup_text import simhash_signatures

    sig = simhash_signatures(
        _t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text"
    )
    return (
        sig.groupBy(F.shiftright(F.col("simhash"), 48).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- embeddings

def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def emb_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k against an anchor vector (vec_id 0) — the
    exact-ANN baseline. One vectorized numpy matmul per Arrow batch (a
    higher-order zip_with/aggregate version is ~50x slower: non-codegen
    per-element expression evaluation). round(6) absorbs the pairwise-vs-
    sequential float64 summation difference vs the DuckDB oracle."""
    from xgeo_spark.functions.vectors import cosine_to_anchor_udf

    e = _t(spark, sf_dir, "embeddings")
    anchor = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cos = cosine_to_anchor_udf([float(x) for x in anchor])
    return (
        e.select("vec_id", "label", F.round(cos(F.col("embedding")), 6).alias("cosine"))
        .filter(F.col("vec_id") != 0)
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(20)
    )


EMB_COSINE_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
a AS (SELECT embedding AS anchor FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       ROUND({_dot_sql('e.embedding', 'a.anchor')} /
             (sqrt({_dot_sql('e.embedding', 'e.embedding')}) *
              sqrt({_dot_sql('a.anchor', 'a.anchor')})), 6) AS cosine
FROM e, a WHERE vec_id != 0
ORDER BY cosine DESC, vec_id
LIMIT 20
"""


def emb_label_stats(spark, sf_dir):
    """Per-label vector statistics: count + mean L2 norm (rounded)."""
    e = _t(spark, sf_dir, "embeddings").withColumn(
        "emb_d", F.col("embedding").cast("array<double>")
    )
    norm = F.sqrt(
        F.aggregate("emb_d", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        e.select("label", norm.alias("l2"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.round(F.avg("l2"), 4).alias("avg_norm"))
        .orderBy("label")
    )


EMB_LABEL_SQL = f"""
SELECT label, COUNT(*) AS n_vecs,
       ROUND(AVG(sqrt({_dot_sql('embedding', 'embedding')})), 4) AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
"""


def emb_cosine_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the brief's third dedup
    family beside MinHash and SimHash): deterministic sign-band LSH —
    band k's hash = the sign bits of dims [k*8, k*8+8) folded into an
    integer — candidates join on (band_idx, band_hash), exact cosine
    >= tau verified on candidates only. Axis-aligned planes make the
    bucketing re-derivable in plain SQL, so the oracle value-checks the
    ENTIRE operator (bucketing + verify), unlike the seeded-hyperplane
    ANN path which needs a golden pin. Pure JVM expressions throughout
    (fold/slice/zip_with); linear bucket join, never all-pairs."""
    from xgeo_spark.functions.vectors import cosine_near_dup

    return cosine_near_dup(
        _t(spark, sf_dir, "embeddings"), id_col="vec_id", vec_col="embedding",
        tau=0.4, n_bands=8, band_width=8, max_bucket_size=512,
    )


def _band_hash_sql(k: int, w: int = 8) -> str:
    # sign bit of dim k*w+j (1-indexed in DuckDB) weighted 2^(w-1-j):
    # first dimension = most significant bit, matching the Spark fold
    terms = [
        f"(CASE WHEN e[{k * w + j + 1}] >= 0 THEN {1 << (w - 1 - j)} ELSE 0 END)"
        for j in range(w)
    ]
    return " + ".join(terms)


def _emb_near_dup_sql() -> str:
    bands = "\nUNION ALL\n".join(
        f"SELECT vec_id, {k} AS band_idx, {_band_hash_sql(k)} AS band_hash FROM v"
        for k in range(8)
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
b AS (
{bands}
),
sized AS (
  SELECT b.*, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS bsize FROM b
),
cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM sized l JOIN sized r
    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
   AND l.vec_id < r.vec_id
  WHERE l.bsize <= 512 AND r.bsize <= 512
),
p AS (
  SELECT id_a, id_b, a.e AS ea, b2.e AS eb
  FROM cand
  JOIN v a ON a.vec_id = cand.id_a
  JOIN v b2 ON b2.vec_id = cand.id_b
)
SELECT id_a, id_b,
       ROUND({_dot_sql('ea', 'eb')} /
             (sqrt({_dot_sql('ea', 'ea')}) * sqrt({_dot_sql('eb', 'eb')})), 6)
         AS cosine
FROM p
WHERE ROUND({_dot_sql('ea', 'eb')} /
            (sqrt({_dot_sql('ea', 'ea')}) * sqrt({_dot_sql('eb', 'eb')})), 6)
      >= 0.4
ORDER BY id_a, id_b
"""


EMB_NEAR_DUP_SQL = _emb_near_dup_sql()


def emb_dup_clusters(spark, sf_dir):
    """Duplicate-CLUSTER resolution — the step after candidate pairs in a
    real dedup pipeline: fold the near-dup pair relation's transitive
    closure into connected components (A~B, B~C => one cluster even when
    A!~C directly) and emit per-member cluster assignment with the
    canonical representative (min member id = the doc you keep) and the
    cluster size. Pairs come from the same deterministic sign-band LSH as
    emb_cosine_near_dup, so the ENTIRE chain — bucketing, cosine verify,
    transitive closure — is re-derivable by the DuckDB oracle (components
    via a recursive CTE). Spark side: iterative min-label propagation,
    one join + one groupBy per round (operators/components.py)."""
    from xgeo_spark.functions.vectors import cosine_near_dup
    from xgeo_spark.operators.components import dup_clusters

    pairs = cosine_near_dup(
        _t(spark, sf_dir, "embeddings"), id_col="vec_id", vec_col="embedding",
        tau=0.4, n_bands=8, band_width=8, max_bucket_size=512,
    )
    return (
        dup_clusters(pairs, id_a="id_a", id_b="id_b")
        .select(
            "cluster_id",
            "member_id",
            F.col("n_members").cast("long").alias("n_members"),
        )
        .orderBy("cluster_id", "member_id")
    )


def _emb_dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS (
{_emb_near_dup_sql()}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
),
lab AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
SELECT CAST(l.component AS BIGINT) AS cluster_id,
       CAST(l.node AS BIGINT)      AS member_id,
       CAST(c.n AS BIGINT)         AS n_members
FROM lab l
JOIN (SELECT component, COUNT(*) AS n FROM lab GROUP BY component) c
  USING (component)
ORDER BY cluster_id, member_id
"""


EMB_DUP_CLUSTERS_SQL = _emb_dup_clusters_sql()


def emb_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (random-hyperplane signs, seeded) — the scale path
    for similarity search: candidates only join within a bucket. Oracle:
    golden VALUES pin (seeded hyperplanes not re-derivable in SQL); recall
    vs brute force is asserted in tests/test_vectors.py."""
    from xgeo_spark.functions.vectors import lsh_bucket_neighbors

    return lsh_bucket_neighbors(
        _t(spark, sf_dir, "embeddings"), id_col="vec_id", vec_col="embedding",
        n_planes=12, seed=42,
    )


# ---------------------------------------------------------------- geodesic

def geo_event_distance(spark, sf_dir):
    """Geodesic scalar functions (SURVEY.md §2.2 parity: orb/geo distance)
    as pure JVM column expressions. Synthetic coordinates are derived
    arithmetically from event columns (the driver tables carry no lat/lon);
    per-row DECIMAL quantization keeps the cross-engine sum exact and
    order-independent despite libm last-ulp drift."""
    from xgeo_spark.functions.geo import haversine_m

    ev = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 170 - 85).cast("double") + F.lit(0.5)
    lon = (F.col("event_id") % 360 - 180).cast("double") + F.lit(0.25)
    dist_km = haversine_m(lat, lon, F.lit(0.0), F.lit(0.0)) / 1000.0
    return (
        ev.select("event_type", dist_km.cast("decimal(18,3)").alias("d"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("d").cast("double") / F.count(F.lit(1))).alias("avg_km_q"),
            F.min("d").cast("double").alias("min_km_q"),
            F.max("d").cast("double").alias("max_km_q"),
        )
        .orderBy("event_type")
    )


GEO_DIST_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(2 * 6371.0088 * ASIN(SQRT(
             POW(SIN(RADIANS(0.0 - ((user_id % 170 - 85) + 0.5)) / 2), 2)
             + COS(RADIANS((user_id % 170 - 85) + 0.5)) * COS(RADIANS(0.0))
               * POW(SIN(RADIANS(0.0 - ((event_id % 360 - 180) + 0.25)) / 2), 2)
         )) AS DECIMAL(18,3)) AS d
  FROM events)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(d) AS DOUBLE) / COUNT(*) AS avg_km_q,
       CAST(MIN(d) AS DOUBLE) AS min_km_q,
       CAST(MAX(d) AS DOUBLE) AS max_km_q
FROM g GROUP BY event_type ORDER BY event_type
"""


def geo_olc_codes(spark, sf_dir):
    """Open Location Code encode (SURVEY.md §2.2 parity) over synthetic
    per-user coordinates; vectorized pandas UDF. The oracle re-derives the
    code in pure SQL (base-20 digit arithmetic per the public OLC spec) —
    exact because the synthetic lat/lon are multiples of 1/8000 deg plus
    an exactly-representable offset, so FLOOR sees integral doubles."""
    from xgeo_spark.functions.geo import olc_encode, olc_encode10

    ev = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 170 - 85).cast("double") + F.lit(0.5)
    lon = (F.col("user_id") % 360 - 180).cast("double") + F.lit(0.25)
    return (
        ev.select("user_id", lat.alias("lat"), lon.alias("lon"))
        .distinct()
        .withColumn("plus_code", olc_encode10(F.col("lat"), F.col("lon")))
        .withColumn(
            "plus_code11", olc_encode(F.col("lat"), F.col("lon"), F.lit(11))
        )
        .orderBy("user_id")
    )


# OLC digit i (0-indexed, most significant first) of integer cell index u:
# alphabet[(u // 20^(4-i)) % 20]. The synthetic coords never hit the
# lat-clamp / lon-wrap edge cases, so the plain arithmetic IS the spec.
_OLC_DIGIT = (
    "substr('23456789CFGHJMPQRVWX', CAST(({u} // {shift}) % 20 AS INT) + 1, 1)"
)


def _olc_sql_code() -> str:
    parts = []
    for i in range(5):
        shift = 20 ** (4 - i)
        parts.append(_OLC_DIGIT.format(u="la_u", shift=shift))
        parts.append(_OLC_DIGIT.format(u="lo_u", shift=shift))
    parts.insert(8, "'+'")
    return " || ".join(parts)


GEO_OLC_SQL = f"""
WITH u AS (
  SELECT DISTINCT user_id,
         CAST(user_id % 170 - 85 AS DOUBLE) + 0.5 AS lat,
         CAST(user_id % 360 - 180 AS DOUBLE) + 0.25 AS lon
  FROM events),
c AS (
  SELECT user_id, lat, lon,
         CAST(FLOOR((lat + 90.0) * 8000.0) AS BIGINT) AS la_u,
         CAST(FLOOR((lon + 180.0) * 8000.0) AS BIGINT) AS lo_u,
         -- full 15-digit-resolution units for the grid-refinement digit:
         -- lat 1/(8000*5^5), lon 1/(8000*4^5) of a degree (public spec)
         CAST(FLOOR((lat + 90.0) * 25000000.0) AS BIGINT) AS la15,
         CAST(FLOOR((lon + 180.0) * 8192000.0) AS BIGINT) AS lo15
  FROM u)
SELECT user_id, lat, lon, {_olc_sql_code()} AS plus_code,
       {_olc_sql_code()} ||
       substr('23456789CFGHJMPQRVWX',
              CAST(((la15 // 625) % 5) * 4 + ((lo15 // 256) % 4) AS INT) + 1,
              1) AS plus_code11
FROM c ORDER BY user_id
"""


# Fixed test geometries for geo_planar_ops: a concave "C" ring (exercises
# the even-odd ray-cast on a non-convex shape) and a 3-vertex polyline.
# Vertices sit at .3/.7 offsets while the synthetic points sit at .5/.25,
# so no probe ever lands on an edge or vertex-aligned ray (the boundary
# cases where even-odd semantics are unspecified).
_PLANAR_RING = [
    (-100.3, -50.3), (60.7, -50.3), (60.7, 10.7), (-20.3, 10.7),
    (-20.3, 40.7), (60.7, 40.7), (60.7, 70.7), (-100.3, 70.7),
    (-100.3, -50.3),
]
_PLANAR_LINE = [(-150.3, -60.3), (0.7, 0.7), (150.3, 60.3)]


def geo_planar_ops(spark, sf_dir):
    """Planar ops + projections parity (SURVEY.md §2.2-6 closure: ref
    orb/planar/contains.go ray-cast, orb/planar/distance_from.go segment
    distance, orb/project/projections.go WGS84->Mercator) as pure column
    expressions over per-user synthetic coordinates. in_poly and dist are
    exact IEEE arithmetic (identical cross-engine); merc_y goes through
    libm log/tan, so it is rounded to mm like the other libm columns."""
    from xgeo_spark.functions.geo import (
        planar_distance,
        planar_distance_from,
        planar_length,
        planar_ring_area,
        ring_contains,
        webmercator_x,
        webmercator_y,
    )

    ev = _t(spark, sf_dir, "events")
    lat = (F.col("user_id") % 170 - 85).cast("double") + F.lit(0.5)
    lon = (F.col("user_id") % 360 - 180).cast("double") + F.lit(0.25)
    ring = F.array(
        *[
            F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat"))
            for x, y in _PLANAR_RING
        ]
    )
    line = F.array(
        *[
            F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat"))
            for x, y in _PLANAR_LINE
        ]
    )
    # per-row closed triangle ring (CCW -> positive shoelace): the r4
    # orb/planar/{area,length}.go parity columns. Vertices are exact binary
    # fractions, so the shoelace fold is IEEE-exact cross-engine; the
    # perimeter goes through sqrt and is rounded like the other libm cols.
    d = (F.col("user_id") % 3 + 1).cast("double")
    tri = F.array(
        F.struct(F.col("lon").alias("lon"), F.col("lat").alias("lat")),
        F.struct((F.col("lon") + d).alias("lon"), F.col("lat").alias("lat")),
        F.struct(F.col("lon").alias("lon"), (F.col("lat") + d).alias("lat")),
        F.struct(F.col("lon").alias("lon"), F.col("lat").alias("lat")),
    )
    return (
        ev.select("user_id", lat.alias("lat"), lon.alias("lon"))
        .distinct()
        .select(
            "user_id",
            "lat",
            "lon",
            ring_contains(ring, F.col("lon"), F.col("lat")).alias("in_poly"),
            F.round(
                planar_distance_from(line, F.col("lon"), F.col("lat")), 6
            ).alias("dist_deg"),
            webmercator_x(F.col("lon")).alias("merc_x"),
            F.round(webmercator_y(F.col("lat")), 3).alias("merc_y_q"),
            planar_ring_area(tri).alias("tri_area"),
            F.round(planar_length(tri), 6).alias("tri_perim"),
            # r5: orb/planar/distance.go Distance — point-to-point hypot to
            # a fixed anchor. All inputs are exact binary fractions and
            # sqrt is correctly rounded, so the column is IEEE-exact
            # cross-engine with no quantization.
            planar_distance(
                F.col("lon"), F.col("lat"), F.lit(12.25), F.lit(-33.5)
            ).alias("pt_dist"),
        )
        .orderBy("user_id")
    )


def _planar_sql() -> tuple[str, str]:
    """DuckDB restatements of the ray-cast (crossing-count parity over the
    fixed ring's edges) and the min point-to-segment distance (explicit
    per-segment clamp arithmetic, LEAST over segments)."""
    crossings = []
    r = _PLANAR_RING
    for (xi, yi), (xj, yj) in zip(r, r[1:]):
        crossings.append(
            f"(CASE WHEN (({yi} > lat) <> ({yj} > lat)) AND "
            f"(lon < ({xj} - {xi}) * (lat - {yi}) / ({yj} - {yi}) + {xi}) "
            "THEN 1 ELSE 0 END)"
        )
    in_poly = "((" + " + ".join(crossings) + ") % 2 = 1)"
    seg_d2 = []
    for (x1, y1), (x2, y2) in zip(_PLANAR_LINE, _PLANAR_LINE[1:]):
        dx, dy = x2 - x1, y2 - y1
        denom = dx * dx + dy * dy
        t = f"GREATEST(0.0, LEAST(((lon - {x1}) * {dx} + (lat - {y1}) * {dy}) / {denom}, 1.0))"
        seg_d2.append(
            f"((lon - ({x1} + {dx} * {t})) * (lon - ({x1} + {dx} * {t})) + "
            f"(lat - ({y1} + {dy} * {t})) * (lat - ({y1} + {dy} * {t})))"
        )
    dist = f"ROUND(SQRT(LEAST({', '.join(seg_d2)})), 6)"
    return in_poly, dist


_IN_POLY_SQL, _DIST_SQL = _planar_sql()

GEO_PLANAR_SQL = f"""
WITH u AS (
  SELECT DISTINCT user_id,
         CAST(user_id % 170 - 85 AS DOUBLE) + 0.5 AS lat,
         CAST(user_id % 360 - 180 AS DOUBLE) + 0.25 AS lon,
         CAST(user_id % 3 + 1 AS DOUBLE) AS d
  FROM events)
SELECT user_id, lat, lon,
       {_IN_POLY_SQL} AS in_poly,
       {_DIST_SQL} AS dist_deg,
       lon * (6378137.0 * PI() / 180.0) AS merc_x,
       ROUND(GREATEST(-6378137.0 * PI(),
                      LEAST(LN(TAN((90.0 + lat) * PI() / 360.0)) * 6378137.0,
                            6378137.0 * PI())), 3) AS merc_y_q,
       -- shoelace over the closed triangle (lon,lat)->(lon+d,lat)->
       -- (lon,lat+d), same left-to-right edge fold as the engine's
       -- aggregate; all vertices are exact binary fractions -> IEEE-exact
       ((lon*lat - (lon+d)*lat)
        + ((lon+d)*(lat+d) - lon*lat)
        + (lon*lat - lon*(lat+d))) / 2.0 AS tri_area,
       ROUND(d + SQRT(d*d + d*d) + d, 6) AS tri_perim,
       SQRT((lon - 12.25) * (lon - 12.25)
            + (lat - (-33.5)) * (lat - (-33.5))) AS pt_dist
FROM u ORDER BY user_id
"""


def geo_user_bounds(spark, sf_dir):
    """Bound family parity (orb/geo/bound.go:43,64,70): per-event-type
    bounding box of the synthetic coordinates, padded by 10 km, plus
    approximate height/width in meters. Pad and height are linear
    arithmetic (exact cross-engine); width goes through haversine, so it is
    DECIMAL-quantized like geo_event_distance to absorb libm last-ulp
    drift."""
    from xgeo_spark.functions.geo import bound_height_m, bound_pad, bound_width_m

    ev = _t(spark, sf_dir, "events")
    # sparse sample + sub-world coordinate ranges: each event_type's box is
    # a DIFFERENT non-degenerate rectangle (a dense modulo would saturate
    # every group to the same world-spanning box and test nothing)
    lat = (F.col("user_id") % 120 / 2 - 30).cast("double") + F.lit(0.5)
    lon = (F.col("event_id") % 200 / 2 - 50).cast("double") + F.lit(0.25)
    raw = ev.filter(F.col("event_id") % 97 == 0).select(
        "event_type", lat.alias("lat"), lon.alias("lon")
    )
    b = raw.groupBy("event_type").agg(
        F.struct(
            F.min("lon").alias("min_lon"),
            F.min("lat").alias("min_lat"),
            F.max("lon").alias("max_lon"),
            F.max("lat").alias("max_lat"),
        ).alias("b")
    )
    padded = bound_pad(F.col("b"), 10_000.0)
    return b.select(
        "event_type",
        F.round(padded["min_lon"], 6).alias("p_min_lon"),
        F.round(padded["min_lat"], 6).alias("p_min_lat"),
        F.round(padded["max_lon"], 6).alias("p_max_lon"),
        F.round(padded["max_lat"], 6).alias("p_max_lat"),
        F.round(bound_height_m(F.col("b")), 3).alias("height_m"),
        bound_width_m(F.col("b")).cast("decimal(18,3)").cast("double").alias("width_m"),
    ).orderBy("event_type")


GEO_BOUNDS_SQL = """
WITH pts AS (
  SELECT event_type,
         CAST(user_id % 120 AS DOUBLE) / 2 - 30 + 0.5 AS lat,
         CAST(event_id % 200 AS DOUBLE) / 2 - 50 + 0.25 AS lon
  FROM events WHERE event_id % 97 = 0),
b AS (
  SELECT event_type,
         MIN(lon) AS min_lon, MIN(lat) AS min_lat,
         MAX(lon) AS max_lon, MAX(lat) AS max_lat
  FROM pts GROUP BY event_type),
p AS (
  SELECT *,
         10000.0 / 111131.75 AS dy,
         GREATEST((10000.0 / 111131.75) / COS(RADIANS(max_lat)),
                  (10000.0 / 111131.75) / COS(RADIANS(min_lat))) AS dx,
         (min_lat + max_lat) / 2.0 AS c_lat
  FROM b)
SELECT event_type,
       ROUND(GREATEST(min_lon - dx, -180.0), 6) AS p_min_lon,
       ROUND(GREATEST(min_lat - dy, -90.0), 6) AS p_min_lat,
       ROUND(LEAST(max_lon + dx, 180.0), 6) AS p_max_lon,
       ROUND(LEAST(max_lat + dy, 90.0), 6) AS p_max_lat,
       ROUND(111131.75 * (max_lat - min_lat), 3) AS height_m,
       CAST(CAST(2.0 * 6371008.8 * ASIN(SQRT(
           POW(SIN(RADIANS(0.0) / 2), 2)
           + COS(RADIANS(c_lat)) * COS(RADIANS(c_lat))
             * POW(SIN(RADIANS(max_lon - min_lon) / 2), 2)
       )) AS DECIMAL(18,3)) AS DOUBLE) AS width_m
FROM p ORDER BY event_type
"""


def multimodal_decode(spark, sf_dir):
    """Binary media columns (image/audio/video) -> typed features through
    mapInPandas; decode itself is a deterministic stub (no media libs in the
    container) but the Spark plumbing — binary column, metadata struct,
    Arrow batch shape, typed output schema — is real. Rows-only check;
    value semantics covered by tests/test_multimodal.py."""
    from xgeo_spark.functions.multimodal import decode_images, synthesize_media_table

    media = synthesize_media_table(spark, n=96, seed=42)
    return decode_images(media).orderBy("media_id")


# ---------------------------------------------------------------- CDC flagship

def cdc_replay_small(spark, sf_dir):
    """The engine itself as a query: generate a deterministic small change
    stream, replay through the full pipeline (decode -> LWW dedup -> schema
    evolution -> idempotent bucket-merge), return the final transcript
    table. Non-SQL (stateful multi-batch apply) -> rows-only driver check;
    oracle equality is asserted in tests/test_cdc_replay.py."""
    import tempfile

    from xgeo_spark.fixtures.generator import ChangeStreamConfig, write_change_stream
    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable
    from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig

    tmp = tempfile.mkdtemp(prefix="xgeo_flagship_")
    cfg = ChangeStreamConfig(n_events=5000, n_convs=100, seed=42, n_files=4)
    write_change_stream(f"{tmp}/feed", cfg)
    table = ParquetLakeTable(spark, f"{tmp}/lake")
    pipe = CDCIngestPipeline(
        spark, f"{tmp}/feed", table,
        config=IngestConfig(n_buckets=8, lineage=False),
    )
    pipe.run_batch_replay(files_per_batch=2)
    return table.read().orderBy("conv_id", "turn_idx")


def flagship_oracle_sql() -> str:
    """Independent DuckDB restatement of ``cdc_replay_small``.

    The INPUT is pinned by the deterministic generator (seed=42; pandas/
    numpy only — no Spark, no engine code) and inlined as a VALUES literal;
    the TRANSFORMATION — multi-batch LWW fold under the engine's total
    order (lsn DESC, ts DESC, op-rank DESC), delete filtering, and the
    mid-stream schema evolution (tool_meta null on keys whose winner
    predates the v2 cut) — is re-derived in SQL, never copied from engine
    output. Equal-lsn ties are exact duplicate redeliveries by the
    generator's contract, so the offset tiebreak cannot change values.

    Built lazily (…oracle_sql() call time): inlining ~5k events costs a
    ~2 MB SQL string and ~0.5 s of generation, which must not tax every
    ``import xgeo_spark.queries``.
    """
    from xgeo_spark.fixtures.generator import (
        ChangeStreamConfig,
        generate_change_events,
    )

    cfg = ChangeStreamConfig(n_events=5000, n_convs=100, seed=42, n_files=4)
    ev = generate_change_events(cfg)

    def s(v):  # SQL string literal (standard quoting: '' escapes ')
        return "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else "NULL"

    rows = []
    for r in ev.itertuples(index=False):
        ts = (
            f"TIMESTAMP '{r.ts.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
            if r.ts is not None and r.ts == r.ts
            else "CAST(NULL AS TIMESTAMP)"
        )
        rows.append(
            f"({r.lsn},{r.offset},{s(r.op)},{s(r.conv_id)},{r.turn_idx},"
            f"{s(r.role)},{s(r.text)},{s(r.tool)},{ts},{s(r.tool_meta)})"
        )
    values = ",\n".join(rows)
    return f"""
WITH events AS (
  SELECT CAST(lsn AS BIGINT) AS lsn, CAST(off AS BIGINT) AS off, op, conv_id,
         CAST(turn_idx AS INTEGER) AS turn_idx, role, text, tool,
         CAST(ts AS TIMESTAMP) AS ts, tool_meta
  FROM (VALUES
{values}
  ) AS t(lsn, off, op, conv_id, turn_idx, role, text, tool, ts, tool_meta)
)
SELECT conv_id, turn_idx, role, text, tool, ts, tool_meta
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY conv_id, turn_idx
    ORDER BY lsn DESC, ts DESC NULLS LAST,
             CASE op WHEN 'D' THEN 2 WHEN 'U' THEN 1 ELSE 0 END DESC,
             off DESC
  ) AS rn
  FROM events
) w
WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""


def _build_events_lake(spark, sf_dir):
    """The shared rig for the CDC driver-gate queries: the driver's events
    table read as a deterministic change feed (lsn = event_id, key =
    (user_id, event_type), every 20th event a delete), applied through the
    real sink in two batches so the merge-on-read delta reduce is
    exercised on read.

    Built ONCE per (session, sf_dir) and reused by every CDC gate query in
    the process — rebuilding leaked a temp lake dir and paid two merges +
    a compaction per query per gate run."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EVENTS_LAKE_CACHE.get(key)
    if cached is not None and cached.exists():
        return cached
    import tempfile

    from pyspark.sql import types as T

    from xgeo_spark.sinks.parquet_lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    updates = ev.select(
        F.col("event_id").alias("lsn"),
        F.col("event_id").alias("offset"),
        F.when(F.pmod(F.col("event_id"), F.lit(20)) == 0, "D")
        .otherwise("U").alias("op"),
        F.col("user_id").cast("long"),
        F.col("event_type"),
        F.col("ts"),
        F.col("value"),
        F.col("props"),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    root = tempfile.mkdtemp(prefix="xgeo_cdc_apply_")
    table = ParquetLakeTable(spark, f"{root}/lake")
    table.create(schema, ["user_id", "event_type"], n_buckets=8)
    # two batches split mid-stream: batch boundaries must not be observable
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    table.merge(updates.filter(F.col("lsn") <= mid), batch_id=0)
    table.merge(updates.filter(F.col("lsn") > mid), batch_id=1)
    _EVENTS_LAKE_CACHE[key] = table
    return table


_EVENTS_LAKE_CACHE: dict = {}


def cdc_apply_events(spark, sf_dir):
    """The CDC apply path cross-checked against an INDEPENDENT engine: the
    change-feed derivation of ``_build_events_lake`` applied through the
    real sink — LWW dedup, tombstones, idempotent bucket merge — and the
    final table must equal DuckDB's window-function LWW over the same
    derivation. This makes the north star's merge semantics (last-writer-
    wins by commit LSN, winning delete hides the key, batch boundaries
    invisible) part of the driver gate, not just the local replay suite."""
    table = _build_events_lake(spark, sf_dir)
    return table.read().orderBy("user_id", "event_type")


def cdc_scan_window(spark, sf_dir):
    """The stat-pruned read path under the same independent cross-check:
    after the apply, compact with ts clustering (so base files get
    near-disjoint ts ranges and the manifest's footer stats can actually
    exclude files), then read a mid-feed time window through ``scan()`` —
    manifest file pruning first, parquet row-group stats second, residual
    filter last. Must equal DuckDB's windowed LWW filtered to the same
    bounds: file skipping is an accelerator, never a semantics change."""
    import datetime as dt

    table = _build_events_lake(spark, sf_dir)
    table.compact(cluster_by="ts", max_rows_per_file=256)
    return table.scan(
        ts_from=dt.datetime(2024, 1, 20), ts_to=dt.datetime(2024, 1, 28)
    ).orderBy("user_id", "event_type")


CDC_APPLY_SQL = """
WITH ranked AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, event_type, ts, value, props,
         CASE WHEN event_id % 20 = 0 THEN 'D' ELSE 'U' END AS op,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type ORDER BY event_id DESC
         ) AS rn
  FROM events)
SELECT user_id, event_type, ts, value, props
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY user_id, event_type
"""

CDC_SCAN_WINDOW_SQL = """
WITH ranked AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, event_type, ts, value, props,
         CASE WHEN event_id % 20 = 0 THEN 'D' ELSE 'U' END AS op,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type ORDER BY event_id DESC
         ) AS rn
  FROM events)
SELECT user_id, event_type, ts, value, props
FROM ranked
WHERE rn = 1 AND op <> 'D'
  AND ts >= TIMESTAMP '2024-01-20 00:00:00'
  AND ts <= TIMESTAMP '2024-01-28 00:00:00'
ORDER BY user_id, event_type
"""


# ------------------------------------------------------- round-2 additions


def events_quantiles(spark, sf_dir):
    """Exact interpolated quantiles of event value per event type.

    Spark's `percentile` (exact, linear interpolation at index p*(n-1))
    has the identical definition to ANSI/DuckDB `quantile_cont`, so the
    oracle value-checks the whole distribution computation. The 100 TB
    path swaps `percentile` for `percentile_approx` (mergeable t-digest
    sketch: map-side combinable, bounded memory, no per-group value
    materialization); tests/test_entry_contract.py::test_quantiles_approx
    asserts the sketch lands within tolerance of the exact answer so the
    swap is a config change, not a semantics change.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


EVENTS_QUANTILES_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def orders_open_range_join(spark, sf_dir):
    """Point-in-interval range join: open orders per calendar month start,
    where an order is "open" for (7 + o_orderkey % 53) days from
    o_orderdate.

    The naive formulation is a theta join (calendar x orders on
    m >= start AND m < end) — the oracle states it that way, and on Spark
    that plan degenerates to BroadcastNestedLoopJoin: every order compared
    against every month. This implementation uses the interval-bucketing
    rewrite instead: each interval explodes to the <=3 month-start points
    it covers (`sequence` + `explode`, JVM-side, bounded fan-out =
    interval_length / bucket_width) and the join disappears into a plain
    hash aggregation — linear in input, shuffles only n_months rows.
    """
    o = _t(spark, sf_dir, "orders")
    start = F.col("o_orderdate")
    end = F.expr(
        "o_orderdate + make_dt_interval(CAST(7 + o_orderkey % 53 AS INT), 0, 0, 0)"
    )
    months = F.sequence(
        F.date_trunc("month", start),
        F.date_trunc("month", end),
        F.expr("interval 1 month"),
    )
    return (
        o.select(F.explode(months).alias("month_start"),
                 start.alias("_s"), end.alias("_e"))
        .filter((F.col("month_start") >= F.col("_s"))
                & (F.col("month_start") < F.col("_e")))
        .groupBy("month_start")
        .agg(F.count(F.lit(1)).alias("n_open"))
        .orderBy("month_start")
    )


ORDERS_RANGE_JOIN_SQL = """
WITH cal AS (
  -- calendar bounds derived from the data (not a pinned window), so the
  -- gate cannot silently diverge from the Spark side if the fixture's
  -- date range ever changes; the JOIN filter makes over-coverage harmless
  SELECT unnest(generate_series(
      date_trunc('month', (SELECT min(o_orderdate) FROM orders)),
      date_trunc('month', (SELECT max(o_orderdate) + to_days(59) FROM orders)),
      INTERVAL 1 MONTH)) AS month_start),
iv AS (
  SELECT o_orderdate AS s,
         o_orderdate + to_days(CAST(7 + o_orderkey % 53 AS INT)) AS e
  FROM orders)
SELECT c.month_start, COUNT(*) AS n_open
FROM cal c JOIN iv ON c.month_start >= iv.s AND c.month_start < iv.e
GROUP BY c.month_start ORDER BY c.month_start
"""


def doc_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per document — the text-pipeline term-weighting
    primitive, entirely with builtins (split/explode/groupBy/window).

    The doc-frequency side is broadcast here because vocabulary is always
    much smaller than the corpus (Heaps' law) — at 100 TB it's still only
    the distinct-term table; if it ever exceeded the broadcast threshold
    AQE falls back to a shuffle join on `term`, which is fine because tf
    is already pre-aggregated (one row per (doc, term), not per token).
    Ranking orders by the ROUNDED score so the cross-engine tie-break
    (score DESC, term ASC) is decided on identical values.
    """
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    tok = d.select(
        "doc_id", F.explode(F.split(_norm_text_col(), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("term_count"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    scored = tf.join(F.broadcast(df_), "term").withColumn(
        "tfidf",
        F.round(
            F.col("term_count")
            * F.log((F.lit(n_docs) + 1.0) / (F.col("doc_freq") + 1.0)),
            6,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "term_count", "doc_freq", "tfidf", "rk")
        .orderBy("doc_id", "rk")
    )


DOC_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))), ' ')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS term_count
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.term_count, df.doc_freq,
         ROUND(tf.term_count * ln((n.n_docs + 1.0) / (df.doc_freq + 1.0)), 6) AS tfidf
  FROM tf JOIN df USING (term), n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored)
SELECT doc_id, term, term_count, doc_freq, tfidf, rk
FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
"""


def emb_ann_ivf(spark, sf_dir):
    """IVF (inverted-file) approximate nearest neighbour — the third ANN
    path next to brute force (`emb_cosine_topk`) and random-hyperplane LSH
    (`emb_ann_lsh`).

    Centroids are K=8 deterministic seed vectors (vec_id 1..8); every
    vector is assigned to its max-cosine centroid in one Arrow-batched
    float64 matmul (`ivf_assign_udf`); the query (the vec_id-0 anchor)
    probes its nprobe=2 nearest cells and exact cosine runs only inside
    them — the index reads ~nprobe/K of the table. Unlike the hash-based
    LSH paths this is fully SQL-re-derivable (assignment is an argmax the
    oracle restates as a row_number over the vector x seed cross join), so
    the oracle value-checks assignment, probe selection, AND verify with
    no golden pin. At 100 TB the real variant k-means-refines the same
    seed centroids and writes `cell` as a partition column so probing is
    partition pruning, not a filter.
    """
    from xgeo_spark.functions.vectors import (
        cosine_to_anchor_udf, ivf_assign_udf, ivf_probe_cells,
    )

    e = _t(spark, sf_dir, "embeddings")
    seed_rows = (
        e.filter(F.col("vec_id").between(1, 8))
        .select("vec_id", "embedding").collect()
    )
    seed_ids = [int(r["vec_id"]) for r in seed_rows]
    seed_mat = [[float(x) for x in r["embedding"]] for r in seed_rows]
    anchor = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    probe = ivf_probe_cells(seed_mat, seed_ids, anchor, nprobe=2)
    assign = ivf_assign_udf(seed_mat, seed_ids)
    cos = cosine_to_anchor_udf(anchor)
    return (
        e.withColumn("cell", assign(F.col("embedding")))
        .filter(F.col("cell").isin(probe) & (F.col("vec_id") != 0))
        .select("vec_id", "label", "cell",
                F.round(cos(F.col("embedding")), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


_IVF_COS = (
    lambda a, b: f"({_dot_sql(a, b)} / "
    f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"
)

EMB_ANN_IVF_SQL = f"""
WITH a AS (SELECT embedding AS anchor FROM embeddings WHERE vec_id = 0),
seeds AS (SELECT vec_id AS seed_id, embedding AS s
          FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
assign AS (
  SELECT e.vec_id, e.label, e.embedding, s.seed_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {_IVF_COS('e.embedding', 's.s')} DESC, s.seed_id) AS rk
  FROM embeddings e CROSS JOIN seeds s),
cells AS (SELECT vec_id, label, embedding, seed_id AS cell
          FROM assign WHERE rk = 1),
probe AS (SELECT s.seed_id FROM seeds s, a
          ORDER BY {_IVF_COS('s.s', 'a.anchor')} DESC, s.seed_id LIMIT 2)
SELECT c.vec_id, c.label, c.cell,
       ROUND({_IVF_COS('c.embedding', 'a.anchor')}, 6) AS cosine
FROM cells c JOIN probe p ON c.cell = p.seed_id, a
WHERE c.vec_id <> 0
ORDER BY cosine DESC, c.vec_id
LIMIT 10
"""


def emb_ann_ivf_kmeans(spark, sf_dir):
    """IVF with k-means-REFINED centroids (the `emb_ann_ivf` docstring's
    promised scale path, VERDICT r2 item 6): two Lloyd rounds as DataFrame
    ops (`kmeans_refine` — one map-side-combinable hash aggregate per
    round, centroids quantized to 1e-6 for cross-engine determinism), then
    the standard nprobe=2 probe + exact verify. Fully SQL-re-derivable:
    the oracle restates BOTH Lloyd rounds (assignment cross-join + per-dim
    rounded AVG reassembled with list(ORDER BY dim)), the probe, and the
    verify — so the hash check covers the refinement itself, not just the
    final ranking. At scale the refined centroids feed `write_ivf_index`,
    which lays the table out partitioned by cell so probing is partition
    pruning (tests/test_vectors.py evidences the PartitionFilters plan).
    """
    from xgeo_spark.functions.vectors import (
        cosine_to_anchor_udf,
        ivf_assign_udf,
        ivf_probe_cells,
        kmeans_refine,
    )

    e = _t(spark, sf_dir, "embeddings")
    seed_rows = (
        e.filter(F.col("vec_id").between(1, 8))
        .select("vec_id", "embedding").collect()
    )
    seed_ids = [int(r["vec_id"]) for r in seed_rows]
    seed_mat = [[float(x) for x in r["embedding"]] for r in seed_rows]
    anchor = [
        float(x)
        for x in e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    mat, ids = kmeans_refine(
        e, seed_mat, seed_ids, n_rounds=2, quantize=6, empty_cells="drop"
    )
    probe = ivf_probe_cells(mat, ids, anchor, nprobe=2)
    assign = ivf_assign_udf(mat, ids)
    cos = cosine_to_anchor_udf(anchor)
    return (
        e.withColumn("cell", assign(F.col("embedding")))
        .filter(F.col("cell").isin(probe) & (F.col("vec_id") != 0))
        .select("vec_id", "label", "cell",
                F.round(cos(F.col("embedding")), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


def _ivf_kmeans_sql() -> str:
    """DuckDB restatement of two Lloyd rounds + probe + verify. Each round
    is: cosine-argmax assignment (cross join, row_number tie-broken to the
    lower cell id) then per-cell centroid = per-dim ROUND(AVG, 6)
    reassembled in dim order — exactly kmeans_refine(quantize=6,
    empty_cells='drop')."""
    cos = _IVF_COS

    def _round(src: str, cents: str, out_assign: str, out_cent: str) -> str:
        return f"""
{out_assign} AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos('e.embedding', 'c.s')} DESC, c.cell) AS rk
    FROM {src} e CROSS JOIN {cents} c)
  WHERE rk = 1),
{out_cent} AS (
  SELECT cell, list(m ORDER BY i) AS s FROM (
    SELECT t.cell, g.i,
           ROUND(AVG(CAST(t.embedding[g.i] AS DOUBLE)), 6) AS m
    FROM {out_assign} t, UNNEST(generate_series(1, len(t.embedding))) AS g(i)
    GROUP BY t.cell, g.i) GROUP BY cell)"""

    return f"""
WITH a AS (SELECT embedding AS anchor FROM embeddings WHERE vec_id = 0),
seeds AS (SELECT vec_id AS cell, embedding AS s
          FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
{_round('embeddings', 'seeds', 'a1', 'c1')},
{_round('embeddings', 'c1', 'a2', 'c2')},
a3 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {cos('e.embedding', 'c.s')} DESC, c.cell) AS rk
    FROM embeddings e CROSS JOIN c2 c)
  WHERE rk = 1),
probe AS (SELECT c.cell FROM c2 c, a
          ORDER BY {cos('c.s', 'a.anchor')} DESC, c.cell LIMIT 2)
SELECT e.vec_id, e.label, x.cell,
       ROUND({cos('e.embedding', 'a.anchor')}, 6) AS cosine
FROM a3 x
JOIN embeddings e ON e.vec_id = x.vec_id
JOIN probe p ON x.cell = p.cell, a
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id
LIMIT 10
"""


EMB_ANN_IVF_KMEANS_SQL = _ivf_kmeans_sql()


def events_cube(spark, sf_dir):
    """CUBE grouping sets over (event_type, hour-of-day): all four grouping
    combinations in ONE pass — Catalyst expands the cube into a single
    Expand + hash aggregate, so the scan isn't repeated per grouping set
    (the hand-rolled alternative is 4 scans + a union). Grouping-null
    markers are made explicit ('ALL') so the oracle comparison is
    unambiguous about which nulls are grouping vs data."""
    ev = _t(spark, sf_dir, "events")
    hod = F.hour("ts").alias("hod")
    return (
        ev.cube(F.col("event_type"), hod)
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum("value", "sum_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("hod").cast("string"), F.lit("ALL")).alias("hod"),
            "n",
            "sum_value",
        )
        .orderBy("event_type", "hod")
    )


EVENTS_CUBE_SQL = f"""
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(hod AS VARCHAR), 'ALL') AS hod,
       COUNT(*) AS n,
       {_SQL_DEC_SUM.format(c='value')} AS sum_value
FROM (SELECT event_type, CAST(hour(ts) AS INT) AS hod, value FROM events)
GROUP BY CUBE (event_type, hod)
ORDER BY event_type, hod
"""


def events_pivot(spark, sf_dir):
    """Pivot event_type to columns (per-user event-mix matrix) with a
    PINNED pivot-column list: at 100 TB an unpinned pivot needs an extra
    distinct-values job and risks an unbounded column explosion; pinning
    makes it a single pass of conditional aggregates (what Catalyst lowers
    pivot to anyway). The oracle states the same thing as explicit
    FILTERed counts."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
        .orderBy("user_id")
    )


EVENTS_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


def events_approx_users(spark, sf_dir):
    """Sketch-family distinct counting: HyperLogLog++ approx-distinct users
    per event type, next to the exact count that bounds its error in the
    same row. `approx_count_distinct` is the 100 TB path — a fixed-size
    mergeable sketch, map-side combinable, one pass, no per-group value
    materialization (exact COUNT(DISTINCT) shuffles every distinct value).
    HLL++ is unseeded and merge-order-independent, so the result is
    deterministic across partitionings and pinnable; DuckDB's
    approx_count_distinct is a different sketch with different estimates,
    so this is a golden determinism pin, not an independent re-derivation
    (the exact column doubles as the semantic anchor; the tolerance test
    in tests/test_entry_contract.py asserts the estimate tracks it)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )
        .orderBy("event_type")
    )


def cdc_patch_events(spark, sf_dir):
    """Partial-image (op 'P') fold under the driver's value gate: events is
    read as a single-batch change feed where event_id%20==0 is a delete,
    event_id%7==3 a PATCH that sets (value, ts) but leaves props unchanged
    (null-means-unchanged), the rest full updates. The engine's
    ``resolve_patches`` per-column lsn-ordered fold (operators/patch.py —
    the exact code the ingest pipeline runs) is cross-checked against an
    independent DuckDB restatement via window + FILTERed arg_max. The
    oracle wraps arg_max args in single-element lists because DuckDB's
    arg_max skips NULL args while Spark's max_by carries them — and a full
    image legitimately sets a column to NULL."""
    from xgeo_spark.operators.patch import resolve_patches

    ev = _t(spark, sf_dir, "events")
    is_p = (F.pmod(F.col("event_id"), 20) != 0) & (
        F.pmod(F.col("event_id"), 7) == 3
    )
    batch = ev.select(
        F.col("event_id").alias("lsn"),
        F.col("event_id").alias("offset"),
        F.when(F.pmod(F.col("event_id"), 20) == 0, "D")
        .when(F.pmod(F.col("event_id"), 7) == 3, "P")
        .otherwise("U")
        .alias("op"),
        F.lit(1).alias("schema_version"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
        F.col("ts"),
        F.col("value"),
        F.when(is_p, F.lit(None).cast("string")).otherwise(F.col("props")).alias(
            "props"
        ),
    )
    resolved = resolve_patches(batch, None, ["user_id", "event_type"])
    final = (
        resolved.groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("op", "ts", "value", "props"), F.col("lsn")
            ).alias("_w")
        )
        .filter(F.col("_w.op") != "D")
        .select(
            "user_id",
            "event_type",
            F.col("_w.ts").alias("ts"),
            F.col("_w.value").alias("value"),
            F.col("_w.props").alias("props"),
        )
    )
    return final.orderBy("user_id", "event_type")


CDC_PATCH_SQL = """
WITH ev AS (
  SELECT CAST(event_id AS BIGINT) AS lsn,
         CAST(user_id AS BIGINT) AS user_id, event_type, ts, value,
         CASE WHEN event_id % 20 = 0 THEN 'D'
              WHEN event_id % 7 = 3 THEN 'P' ELSE 'U' END AS op,
         CASE WHEN event_id % 20 <> 0 AND event_id % 7 = 3 THEN NULL
              ELSE props END AS props
  FROM events),
lf AS (
  SELECT *, MAX(CASE WHEN op <> 'P' THEN lsn END)
              OVER (PARTITION BY user_id, event_type) AS last_full
  FROM ev),
live AS (
  SELECT * FROM lf
  WHERE (op <> 'P' AND lsn = last_full)
     OR (op = 'P' AND (last_full IS NULL OR lsn > last_full))),
folded AS (
  SELECT user_id, event_type,
         arg_max(op, lsn) AS last_op,
         (arg_max([ts], lsn)
            FILTER (WHERE op <> 'P' OR ts IS NOT NULL))[1] AS ts,
         (arg_max([value], lsn)
            FILTER (WHERE op <> 'P' OR value IS NOT NULL))[1] AS value,
         (arg_max([props], lsn)
            FILTER (WHERE op <> 'P' OR props IS NOT NULL))[1] AS props
  FROM live GROUP BY user_id, event_type)
SELECT user_id, event_type, ts, value, props
FROM folded WHERE last_op <> 'D'
ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------- registry

# Golden (VALUES-literal) oracles for deterministic queries another SQL
# engine cannot re-derive (hash bucketing, UDF text heuristics, the seeded
# multimodal stub) — determinism/regression pins generated by
# tools/make_golden_oracles.py from this engine's own sf0.01 output; the
# operators' semantics are verified independently in tests/ (band recall vs
# exact hamming, ANN recall vs brute force, text/multimodal unit tests).
try:
    from xgeo_spark.golden_oracles import GOLDEN_SQL as _GOLDEN
except ImportError:  # pragma: no cover - regenerate with the tool
    _GOLDEN = {}

# Golden pins freeze sf0.01 output specifically (the driver's correctness
# scale); comparing them at another scale factor is a guaranteed false
# mismatch. Harnesses running other scales must skip these names
# (tools/check_oracle.py does).
GOLDEN_PINNED = frozenset(_GOLDEN)
GOLDEN_SF = 0.01

QUERIES: dict[str, tuple[Callable, str | None]] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "top_orders_per_customer": (top_orders_per_customer, TOP_ORDERS_SQL),
    "running_customer_spend": (running_customer_spend, RUNNING_SPEND_SQL),
    "events_lww_latest": (events_lww_latest, EVENTS_LWW_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "events_json_props": (events_json_props, EVENTS_JSON_SQL),
    "events_rollup": (events_rollup, EVENTS_ROLLUP_SQL),
    "events_sessionize": (events_sessionize, EVENTS_SESSIONIZE_SQL),
    "asof_latest_event_per_user": (asof_latest_event_per_user, ASOF_SQL),
    "customers_without_orders": (customers_without_orders, ANTI_SQL),
    "suppliers_with_returns_semi": (suppliers_with_returns_semi, SEMI_SQL),
    "buyer_seller_set_ops": (buyer_seller_set_ops, SET_OPS_SQL),
    "part_string_funcs": (part_string_funcs, STRING_FUNCS_SQL),
    "high_value_nations_having": (high_value_nations_having, HAVING_SQL),
    "doc_exact_dedup": (doc_exact_dedup, DOC_EXACT_DEDUP_SQL),
    "doc_token_stats": (doc_token_stats, DOC_TOKEN_STATS_SQL),
    "doc_ngram_jaccard_anchor": (doc_ngram_jaccard_anchor, DOC_NGRAM_SQL),
    "doc_text_analysis": (doc_text_analysis, _GOLDEN.get("doc_text_analysis")),
    "doc_minhash_near_dup": (doc_minhash_near_dup, _GOLDEN.get("doc_minhash_near_dup")),
    "doc_incremental_near_dup": (
        doc_incremental_near_dup, _GOLDEN.get("doc_incremental_near_dup")),
    "doc_simhash_buckets": (doc_simhash_buckets, _GOLDEN.get("doc_simhash_buckets")),
    "emb_cosine_topk": (emb_cosine_topk, EMB_COSINE_SQL),
    "emb_label_stats": (emb_label_stats, EMB_LABEL_SQL),
    "emb_cosine_near_dup": (emb_cosine_near_dup, EMB_NEAR_DUP_SQL),
    "emb_dup_clusters": (emb_dup_clusters, EMB_DUP_CLUSTERS_SQL),
    "emb_ann_lsh": (emb_ann_lsh, _GOLDEN.get("emb_ann_lsh")),
    "geo_event_distance": (geo_event_distance, GEO_DIST_SQL),
    "geo_olc_codes": (geo_olc_codes, GEO_OLC_SQL),
    "geo_planar_ops": (geo_planar_ops, GEO_PLANAR_SQL),
    "geo_user_bounds": (geo_user_bounds, GEO_BOUNDS_SQL),
    "multimodal_decode": (multimodal_decode, _GOLDEN.get("multimodal_decode")),
    # oracle built lazily (see LAZY_SQL below): the VALUES-literal input pin
    # is ~2 MB and must not be constructed on every module import
    "cdc_replay_small": (cdc_replay_small, None),
    "cdc_apply_events": (cdc_apply_events, CDC_APPLY_SQL),
    "cdc_scan_window": (cdc_scan_window, CDC_SCAN_WINDOW_SQL),
    "events_quantiles": (events_quantiles, EVENTS_QUANTILES_SQL),
    "orders_open_range_join": (orders_open_range_join, ORDERS_RANGE_JOIN_SQL),
    "doc_tfidf_top_terms": (doc_tfidf_top_terms, DOC_TFIDF_SQL),
    "emb_ann_ivf": (emb_ann_ivf, EMB_ANN_IVF_SQL),
    "emb_ann_ivf_kmeans": (emb_ann_ivf_kmeans, EMB_ANN_IVF_KMEANS_SQL),
    "cdc_patch_events": (cdc_patch_events, CDC_PATCH_SQL),
    "events_approx_users": (events_approx_users, _GOLDEN.get("events_approx_users")),
    "events_cube": (events_cube, EVENTS_CUBE_SQL),
    "events_pivot": (events_pivot, EVENTS_PIVOT_SQL),
}

# Oracles whose SQL text is expensive to build (input pinned as a VALUES
# literal): constructed on demand by __spark_entry__.oracle_sql(), not at
# import. Unlike GOLDEN_PINNED these are sf-independent (the flagship
# stream is fixed by its own seed, not by the driver's scale factor).
LAZY_SQL: dict[str, Callable[[], str]] = {
    "cdc_replay_small": flagship_oracle_sql,
}
