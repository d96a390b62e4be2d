"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps each
implemented operator (SURVEY.md §2) to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL over the
pre-registered views (region nation customer supplier part orders lineitem
events documents embeddings).

Float determinism policy: every floating-point output column is either
(a) closed-form arithmetic on integers (identical IEEE ops both engines), or
(b) derived from exact decimal/integer aggregates with a single final cast —
so value hashes match bit-for-bit without rounding fudge.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imagery_utils_spark.functions.scoring import ScoreParams
from imagery_utils_spark.operators import spatial_join as SJ
from imagery_utils_spark.operators.asof import asof_backward
from imagery_utils_spark.operators.tile_grid import tile_assign_cols
from imagery_utils_spark.plans import mosaic_query as MQ
from imagery_utils_spark.sources import pages as P
from imagery_utils_spark.sources.tables import load


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocoded pages -> tile assignment -> score -> rank."""
    return MQ.ranked_assignments(spark, "/root/testdata/sf0.001").select(
        "doc_id", "url", "tile_name", "score", "tile_rank"
    )


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def q_tile_assign(spark, sf_dir) -> DataFrame:
    df = MQ.geocoded_pages(spark, sf_dir)
    return df.select(
        "doc_id", "lon", "lat",
        *tile_assign_cols(F.col("lon"), F.col("lat"),
                          -180.0, -90.0, 180.0, 90.0, 10.0, 10.0, "world"),
    )


def q_flagship_rank(spark, sf_dir) -> DataFrame:
    return MQ.ranked_assignments(spark, sf_dir).select(
        "doc_id", "tile_name", "score", "tile_rank"
    )


def q_tile_manifest(spark, sf_dir) -> DataFrame:
    return MQ.tile_manifest(spark, sf_dir)


def q_extent_union(spark, sf_dir) -> DataFrame:
    df = MQ.geocoded_pages(spark, sf_dir)
    return df.agg(
        F.min("lon").alias("min_lon"), F.max("lon").alias("max_lon"),
        F.min("lat").alias("min_lat"), F.max("lat").alias("max_lat"),
    )


def q_cell_rollup(spark, sf_dir) -> DataFrame:
    df = MQ.geocoded_pages(spark, sf_dir)
    fine = df.select(SJ.cell_col(F.col("lon"), F.col("lat"), 6).alias("cell6"))
    # parent rollup: linear id math (R5 pyramid analog)
    n6, n3 = 1 << 6, 1 << 3
    parent = (F.floor(F.col("cell6") / n6 / 8) * n3 + F.floor((F.col("cell6") % n6) / 8)).cast("long")
    return fine.groupBy(parent.alias("cell3")).agg(F.count("*").alias("n")).orderBy("cell3")


def q_stats_agg(spark, sf_dir) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    n = F.count("*")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            n.alias("cnt"),
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_price"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_median_exact(spark, sf_dir) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("median_qty"))
        .orderBy("l_returnflag")
    )


def q_dedup_exact(spark, sf_dir) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("rep_doc_id", "n_copies")
        .orderBy("rep_doc_id")
    )


def q_anti_join(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q_semi_join(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def q_topk_per_group(spark, sf_dir) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    )


def q_asof_join(spark, sf_dir) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_backward(errors, clicks, on="user_id", ts="ts", right_ts_out="prev_click_ts")
    return (
        out.filter(F.col("prev_click_ts").isNotNull())
        .select("event_id", "prev_click_ts")
        .orderBy("event_id")
    )


def q_broadcast_join_agg(spark, sf_dir) -> DataFrame:
    """J5 analog: fact x broadcast dim -> rollup (revenue per nation)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("n_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_assign": q_tile_assign,
        "flagship_rank": q_flagship_rank,
        "tile_manifest": q_tile_manifest,
        "extent_union": q_extent_union,
        "cell_rollup": q_cell_rollup,
        "stats_agg": q_stats_agg,
        "median_exact": q_median_exact,
        "dedup_exact": q_dedup_exact,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "topk_per_group": q_topk_per_group,
        "asof_join": q_asof_join,
        "broadcast_join_agg": q_broadcast_join_agg,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def _pages_cte() -> str:
    lon, lat = P.lonlat_sql("doc_id")
    return (
        f"pages AS (SELECT doc_id, lang, text, {lon} AS lon, {lat} AS lat, "
        f"to_timestamp(1546300800 + (doc_id * 104729) % 157766400) AS warc_ts "
        f"FROM documents)"
    )


def _tile_cols_sql() -> str:
    # world 10-deg grid: 36 cols (pad 2), 18 rows (pad 2)
    col = "least(36, greatest(1, cast(floor((lon - (-180.0)) / 10.0) + 1 as int)))"
    row = "least(18, greatest(1, cast(floor((lat - (-90.0)) / 10.0) + 1 as int)))"
    name = (f"concat('world_', lpad(cast({row} as varchar), 2, '0'), '_', "
            f"lpad(cast({col} as varchar), 2, '0'))")
    return f"{row} AS tile_row, {col} AS tile_col, {name} AS tile_name"


def _scored_cte() -> str:
    attrs = MQ.scene_attrs_sql("doc_id")
    score = MQ.score_gated_sql(ScoreParams(bands=1), attrs, acq="warc_ts")
    return (
        f"scored AS (SELECT doc_id, lang, lon, lat, {_tile_cols_sql()}, "
        f"{score} AS score FROM pages)"
    )


def oracle_sql() -> dict[str, str]:
    pages = _pages_cte()
    scored = _scored_cte()
    return {
        "tile_assign": (
            f"WITH {pages} SELECT doc_id, lon, lat, {_tile_cols_sql()} FROM pages"
        ),
        "flagship_rank": (
            f"WITH {pages}, {scored} "
            "SELECT doc_id, tile_name, score, "
            "ROW_NUMBER() OVER (PARTITION BY tile_name ORDER BY score DESC, doc_id ASC) "
            "AS tile_rank FROM scored WHERE score > 0"
        ),
        "tile_manifest": (
            f"WITH {pages}, {scored} "
            "SELECT tile_name, count(*) AS n_pages, "
            "count(DISTINCT lang) AS n_langs, max(score) AS best_score, "
            "min(score) AS worst_score FROM scored WHERE score > 0 "
            "GROUP BY tile_name ORDER BY tile_name"
        ),
        "extent_union": (
            f"WITH {pages} SELECT min(lon) AS min_lon, max(lon) AS max_lon, "
            "min(lat) AS min_lat, max(lat) AS max_lat FROM pages"
        ),
        "cell_rollup": (
            f"WITH {pages}, cells AS (SELECT {SJ.cell_sql('lon', 'lat', 6)} AS cell6 "
            "FROM pages) "
            "SELECT cast(floor(cell6 / 64 / 8) * 8 + floor((cell6 % 64) / 8) as bigint) "
            "AS cell3, count(*) AS n FROM cells GROUP BY 1 ORDER BY 1"
        ),
        "stats_agg": (
            "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
            "cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty, "
            "cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_price, "
            "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, "
            "cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*) AS avg_qty "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "median_exact": (
            "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "dedup_exact": (
            "SELECT min(doc_id) AS rep_doc_id, count(*) AS n_copies FROM documents "
            "GROUP BY text HAVING count(*) > 1 ORDER BY rep_doc_id"
        ),
        "anti_join": (
            "SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) ORDER BY c_custkey"
        ),
        "semi_join": (
            "SELECT c_mktsegment, count(*) AS n_customers FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders) "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "topk_per_group": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn "
            "FROM orders) WHERE rn = 1 ORDER BY o_custkey"
        ),
        "asof_join": (
            "SELECT e.event_id, max(c.ts) AS prev_click_ts FROM events e "
            "JOIN events c ON c.user_id = e.user_id AND c.event_type = 'click' "
            "AND c.ts <= e.ts WHERE e.event_type = 'error' "
            "GROUP BY e.event_id ORDER BY e.event_id"
        ),
        "broadcast_join_agg": (
            "SELECT n_name, cast(sum(cast(l_extendedprice as decimal(18,2)) * "
            "(cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) as double) "
            "AS revenue, count(*) AS n_items "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "GROUP BY n_name ORDER BY n_name"
        ),
    }
