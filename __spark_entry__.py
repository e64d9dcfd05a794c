"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver hash-compares
against at sf0.01.  Engine queries exercise the rules engine
(conditional override, sequencing, audit, keep-old, struct paths, lenient
nulls); ``delegated_*`` queries demonstrate the full Spark SQL surface the
reference delegates to (SURVEY §2.2); extension queries cover the
large-scale pipeline operators (dedup, similarity, text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkplug_spark import PlugAction, PlugRule, SparkPlug


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# Rule sets (the engine's own query surface)
# ---------------------------------------------------------------------------

PART_RULES = [
    PlugRule(
        "fix_brand23",
        "v1",
        "p_brand = 'Brand#23' and p_retailprice < 1000",
        (PlugAction("p_retailprice", "999.99"),),
    ),
    PlugRule(
        "xl_parts",
        "v1",
        "p_size >= 40",
        (PlugAction("p_name", "`concat('XL ', p_name)`"),),
    ),
    PlugRule(
        "std_brass",
        "v1",
        "p_type like '%BRASS%'",
        (PlugAction("p_type", "STANDARD BRASS"),),
    ),
]

SEQ_RULES = [
    PlugRule(
        "flag_delinquent",
        "v1",
        "c_acctbal < 0",
        (PlugAction("c_mktsegment", "DELINQUENT"),),
    ),
    PlugRule(
        "zero_delinquent",
        "v1",
        "c_mktsegment = 'DELINQUENT'",
        (PlugAction("c_acctbal", "0.0"),),
    ),
]


def q_plug_overrides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O4/O5/O6: literal + backtick-SQL overrides, sequential fold."""
    part = _read(spark, sf_dir, "part")
    out = SparkPlug.builder(spark).create().plug(part, PART_RULES)
    return out.select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")


def q_plug_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: rule k+1 observes rule k's writes (SparkPlug.scala:42-50)."""
    customer = _read(spark, sf_dir, "customer")
    out = SparkPlug.builder(spark).create().plug(customer, SEQ_RULES)
    return out.select("c_custkey", "c_mktsegment", "c_acctbal")


def q_plug_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9/O14: plug-details audit with the null-safe change gate."""
    part = _read(spark, sf_dir, "part")
    out = (
        SparkPlug.builder(spark)
        .enable_plug_details()
        .create()
        .plug(part, PART_RULES)
    )
    return out.select(
        "p_partkey",
        F.size("plugDetails").alias("n_rules_applied"),
        F.array_join(F.transform("plugDetails", lambda d: d["name"]), ",").alias(
            "rules_applied"
        ),
    )


def q_plug_keep_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7/O8: keep-old-value audit columns (<updateKey>_<rule>_old)."""
    supplier = _read(spark, sf_dir, "supplier")
    rules = [
        PlugRule(
            "boost_poor",
            "v1",
            "s_acctbal < 0",
            (PlugAction("s_acctbal", "`abs(s_acctbal)`"),),
        )
    ]
    out = (
        SparkPlug.builder(spark).keep_old_field().create().plug(supplier, rules)
    )
    return out.select(
        "s_suppkey",
        "s_acctbal",
        F.col("s_acctbal_boost_poor_old").alias("s_acctbal_old"),
    )


def q_plug_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: nested-struct override with null-struct preservation."""
    part = _read(spark, sf_dir, "part")
    df = part.withColumn(
        "price",
        F.when(F.col("p_size") % 7 == 0, F.lit(None)).otherwise(
            F.struct(
                (F.col("p_retailprice") * 0.9).alias("minPrice"),
                (F.col("p_retailprice") * 1.1).alias("maxPrice"),
                F.lit("available").alias("availability"),
            )
        ),
    )
    rules = [
        PlugRule(
            "floor_brand34",
            "v1",
            "p_brand = 'Brand#34'",
            (
                PlugAction("price.minPrice", "1.0"),
                PlugAction("price.availability", "limited"),
            ),
        )
    ]
    out = SparkPlug.builder(spark).create().plug(df, rules)
    return out.select(
        "p_partkey",
        F.col("price.minPrice").alias("price_min"),
        F.col("price.maxPrice").alias("price_max"),
        F.col("price.availability").alias("price_avail"),
    )


def q_plug_lenient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference quirk Q3: lenient mode writes null on uncoercible literals."""
    part = _read(spark, sf_dir, "part")
    rules = [
        PlugRule(
            "bad_literal",
            "v1",
            "p_size > 45",
            (PlugAction("p_size", "not-an-int"),),
        )
    ]
    out = SparkPlug(spark, lenient=True).plug(part, rules)
    return out.select("p_partkey", "p_size")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; read nanos as long and convert to a micros timestamp
    (safe for whole-second predicate boundaries)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))


def q_plug_events_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp predicates in rule conditions (events table)."""
    events = read_events(spark, sf_dir)
    rules = [
        PlugRule(
            "boost_click",
            "v1",
            "event_type = 'click' and value < 10 and ts >= timestamp'2024-01-15 00:00:00'",
            (PlugAction("value", "`value * 2.0`"),),
        ),
        PlugRule(
            "tag_purchase",
            "v1",
            "event_type = 'purchase'",
            (PlugAction("props", "high-value"),),
        ),
    ]
    out = SparkPlug.builder(spark).create().plug(events, rules)
    return out.select("event_id", "event_type", "value", "props")


# ---------------------------------------------------------------------------
# Delegated Spark SQL surface (SURVEY §2.2) — TPC-H-style probes
# ---------------------------------------------------------------------------


def q_delegated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style: filter + groupBy + decimal aggregates (exact across
    engines), output doubles/longs."""
    li = _read(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    out = (
        li.filter(F.col("l_shipdate") <= F.expr("timestamp'1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice").cast(dec) * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))).cast(dec)
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out


def q_delegated_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + top-k; small dims broadcast."""
    cust = F.broadcast(
        _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    )
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast(dec) * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))).cast(dec)
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    return out


def q_delegated_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: tight filter + single aggregate."""
    li = _read(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast(dec) * F.col("l_discount").cast(dec)).cast(dec)
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: rules engine over sf0.001 part with audit details."""
    return q_plug_audit(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "plug_overrides": q_plug_overrides,
        "plug_sequential": q_plug_sequential,
        "plug_audit": q_plug_audit,
        "plug_keep_old": q_plug_keep_old,
        "plug_struct": q_plug_struct,
        "plug_lenient": q_plug_lenient,
        "plug_events_time": q_plug_events_time,
        "delegated_agg": q_delegated_agg,
        "delegated_join_topk": q_delegated_join_topk,
        "delegated_filter_agg": q_delegated_filter_agg,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "plug_overrides": """
            WITH r1 AS (
              SELECT p_partkey, p_name, p_brand, p_type, p_size,
                     CASE WHEN p_brand = 'Brand#23' AND p_retailprice < 1000
                          THEN 999.99 ELSE p_retailprice END AS p_retailprice
              FROM part
            ), r2 AS (
              SELECT p_partkey,
                     CASE WHEN p_size >= 40 THEN 'XL ' || p_name ELSE p_name END AS p_name,
                     p_brand, p_type, p_size, p_retailprice
              FROM r1
            ), r3 AS (
              SELECT p_partkey, p_name, p_brand,
                     CASE WHEN p_type LIKE '%BRASS%' THEN 'STANDARD BRASS' ELSE p_type END AS p_type,
                     p_size, p_retailprice
              FROM r2
            )
            SELECT p_partkey, p_name, p_brand, p_type, p_retailprice FROM r3
        """,
        "plug_sequential": """
            WITH r1 AS (
              SELECT c_custkey, c_acctbal,
                     CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END AS c_mktsegment
              FROM customer
            ), r2 AS (
              SELECT c_custkey, c_mktsegment,
                     CASE WHEN c_mktsegment = 'DELINQUENT' THEN 0.0 ELSE c_acctbal END AS c_acctbal
              FROM r1
            )
            SELECT c_custkey, c_mktsegment, c_acctbal FROM r2
        """,
        "plug_audit": """
            WITH r1 AS (
              SELECT p_partkey, p_name, p_brand, p_type, p_size,
                     CASE WHEN p_brand = 'Brand#23' AND p_retailprice < 1000
                          THEN 999.99 ELSE p_retailprice END AS p_retailprice,
                     CASE WHEN p_brand = 'Brand#23' AND p_retailprice < 1000
                               AND NOT (p_retailprice IS NOT DISTINCT FROM 999.99)
                          THEN 'fix_brand23' END AS tag1
              FROM part
            ), r2 AS (
              SELECT p_partkey,
                     CASE WHEN p_size >= 40 THEN 'XL ' || p_name ELSE p_name END AS p_name,
                     p_brand, p_type, p_size, p_retailprice, tag1,
                     CASE WHEN p_size >= 40
                               AND NOT (p_name IS NOT DISTINCT FROM ('XL ' || p_name))
                          THEN 'xl_parts' END AS tag2
              FROM r1
            ), r3 AS (
              SELECT p_partkey, p_name, p_brand, p_size, p_retailprice, tag1, tag2,
                     CASE WHEN p_type LIKE '%BRASS%'
                               AND NOT (p_type IS NOT DISTINCT FROM 'STANDARD BRASS')
                          THEN 'std_brass' END AS tag3
              FROM r2
            )
            SELECT p_partkey,
                   ((tag1 IS NOT NULL)::int + (tag2 IS NOT NULL)::int + (tag3 IS NOT NULL)::int) AS n_rules_applied,
                   concat_ws(',', tag1, tag2, tag3) AS rules_applied
            FROM r3
        """,
        "plug_keep_old": """
            SELECT s_suppkey,
                   CASE WHEN s_acctbal < 0 THEN abs(s_acctbal) ELSE s_acctbal END AS s_acctbal,
                   s_acctbal AS s_acctbal_old
            FROM supplier
        """,
        "plug_struct": """
            SELECT p_partkey,
                   CASE WHEN p_size % 7 = 0 THEN NULL
                        WHEN p_brand = 'Brand#34' THEN 1.0
                        ELSE p_retailprice * 0.9 END AS price_min,
                   CASE WHEN p_size % 7 = 0 THEN NULL
                        ELSE p_retailprice * 1.1 END AS price_max,
                   CASE WHEN p_size % 7 = 0 THEN NULL
                        WHEN p_brand = 'Brand#34' THEN 'limited'
                        ELSE 'available' END AS price_avail
            FROM part
        """,
        "plug_lenient": """
            SELECT p_partkey,
                   CASE WHEN p_size > 45 THEN NULL ELSE p_size END AS p_size
            FROM part
        """,
        "plug_events_time": """
            WITH r1 AS (
              SELECT event_id, event_type, props,
                     CASE WHEN event_type = 'click' AND value < 10
                               AND ts >= TIMESTAMP '2024-01-15 00:00:00'
                          THEN value * 2.0 ELSE value END AS value
              FROM events
            ), r2 AS (
              SELECT event_id, event_type, value,
                     CASE WHEN event_type = 'purchase' THEN 'high-value' ELSE props END AS props
              FROM r1
            )
            SELECT event_id, event_type, value, props FROM r2
        """,
        "delegated_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * (CAST(1 AS DECIMAL(28,6)) - CAST(l_discount AS DECIMAL(28,6))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "delegated_join_topk": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * (CAST(1 AS DECIMAL(28,6)) - CAST(l_discount AS DECIMAL(28,6))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "delegated_filter_agg": """
            SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * CAST(l_discount AS DECIMAL(28,6)) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
    }
