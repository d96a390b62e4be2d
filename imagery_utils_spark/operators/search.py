"""Full-text retrieval over the page corpus: inverted-index build and
BM25-shaped top-k scoring.

The reference selects best contributors per tile by a deterministic
quality score (pgc_mosaic scoring); the text-payload analog is scoring
documents against a query and keeping the top k. Two operators:

``build_inverted_index``
    term -> (df, postings) where postings are (doc_id, tf) sorted by
    doc_id — the classic batch index build: one explode, one
    (term, doc) pre-aggregation (map-side combine absorbs Zipf skew),
    one term rollup. Postings stay distributed; nothing is collected.

``bm25_topk``
    Top-k docs for a FIXED small query-term list. Because the terms are
    known up front, per-doc term frequencies are pure column algebra
    (``size(filter(tokens, t = term))``) — zero explode, zero shuffle
    for the scoring scan; corpus stats (N, total length, per-term df)
    are ONE broadcast singleton aggregate; candidates are pre-filtered
    to docs containing >= 1 query term (pushed predicate); the top-k is
    TakeOrdered (orderBy + limit — never a full sort).

Bit-exactness policy: the idf is the Robertson/Sparck-Jones RATIO
surrogate (N - df + 0.5) / (df + 0.5) — the classic idf with the ln
dropped. ln is deliberately avoided: Java's Math.log and DuckDB's libm
are not guaranteed to round identically, while this rational form plus
the tf saturation term is pure IEEE arithmetic with an identical
expression tree on both engines, so scores hash bit-for-bit. (Per term
the map ln is monotone, so per-term contribution ORDER is unchanged;
the blended top-k ordering is the documented scoring function of this
engine.) All float literals are Python-computed once and injected into
both the Column expression and the SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imagery_utils_spark.functions.text import tokens_col

__all__ = ["build_inverted_index", "bm25_topk", "bm25_sql"]


def build_inverted_index(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(term, df, postings:array<struct<doc_id,tf>>) — postings sorted
    by doc_id. Tokenization: lowercased whitespace tokens."""
    toks = tokens_col(F.lower(F.col(text_col)))
    tf = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(toks).alias("term"))
          .groupBy("term", "doc_id").agg(F.count("*").alias("tf")))
    return (tf.groupBy("term")
            .agg(F.count("*").alias("df"),
                 F.sort_array(F.collect_list(
                     F.struct("doc_id", "tf"))).alias("postings")))


def _score_exprs(terms, k1: float, b: float):
    """Per-term score Column factory sharing exact float constants."""
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    return k1p1, one_minus_b


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-k (doc_id, score, rank) for the fixed query ``terms``."""
    assert terms, "query terms required"
    toks = tokens_col(F.lower(F.col(text_col)))
    # Per-doc stats in ONE codegen pass (r6, guide §1.2/§4.1): the
    # previous shape evaluated the interpreted tokenize once per
    # projected HOF (dl + one filter per term = |terms|+1 passes per
    # row, no codegen CSE), and the un-materialized ``base`` fed both
    # the corpus-stats aggregate and the candidate filter — every pass
    # ran twice. explode_outer keeps empty docs (dl=0, tf=0) so n and
    # total_len are unchanged; the checkpoint stores |docs| rows of
    # |terms|+2 longs — proxy metadata, not payload (guide §8).
    tok_rows = docs.select(F.col(id_col).alias("doc_id"),
                           F.explode_outer(toks).alias("_tok"))
    aggs = [F.count("_tok").alias("dl")]
    aggs += [
        F.sum(F.when(F.col("_tok") == F.lit(w), F.lit(1))
              .otherwise(F.lit(0))).alias(f"tf{i}")
        for i, w in enumerate(terms)
    ]
    base = tok_rows.groupBy("doc_id").agg(*aggs).localCheckpoint()
    aggs = [F.count("*").alias("n"),
            F.sum("dl").alias("total_len")]
    aggs += [F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
             for i in range(len(terms))]
    g = base.agg(*aggs)
    any_tf = None
    for i in range(len(terms)):
        c = F.col(f"tf{i}")
        any_tf = c if any_tf is None else any_tf + c
    cand = base.filter(any_tf > 0).crossJoin(F.broadcast(g))
    k1p1, one_minus_b = _score_exprs(terms, k1, b)
    avgdl = F.col("total_len").cast("double") / F.col("n").cast("double")
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}")
        idf = ((F.col("n") - df).cast("double") + 0.5) \
            / (df.cast("double") + 0.5)
        part = idf * (tf * k1p1) / (
            tf + k1 * (one_minus_b
                       + b * (F.col("dl").cast("double") / avgdl)))
        score = part if score is None else score + part
    topk = (cand.select("doc_id", score.alias("score"))
            .orderBy(F.desc("score"), "doc_id").limit(k))
    w = Window.orderBy(F.desc("score"), "doc_id")
    return topk.withColumn("rank", F.row_number().over(w))


def bm25_sql(terms: list[str], k: int = 20, k1: float = 1.2,
             b: float = 0.75, table: str = "documents") -> str:
    """The DuckDB twin of ``bm25_topk`` — identical expression tree,
    identical (repr-rendered) float constants."""
    k1p1, one_minus_b = _score_exprs(terms, k1, b)
    tf_defs = ", ".join(
        f"len(list_filter(t, x -> x = '{w}')) AS tf{i}"
        for i, w in enumerate(terms))
    df_defs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms)))
    any_tf = " + ".join(f"tf{i}" for i in range(len(terms)))
    parts = []
    for i in range(len(terms)):
        idf = (f"(cast(n - df{i} as double) + 0.5) / "
               f"(cast(df{i} as double) + 0.5)")
        denom = (f"(cast(tf{i} as double) + {k1!r} * ({one_minus_b!r} "
                 f"+ {b!r} * (cast(dl as double) / "
                 "(cast(total_len as double) / "
                 "cast(n as double)))))")
        parts.append(f"{idf} * (cast(tf{i} as double) * {k1p1!r}) "
                     f"/ {denom}")
    score = " + ".join(parts)
    return (
        r"WITH toks AS (SELECT doc_id, list_filter(string_split_regex("
        r"lower(text), '\s+'), x -> x <> '') AS t "
        f"FROM {table}), "
        f"d AS (SELECT doc_id, len(t) AS dl, {tf_defs} FROM toks), "
        f"g AS (SELECT count(*) AS n, sum(dl) AS total_len, {df_defs} "
        "FROM d), "
        f"s AS (SELECT doc_id, {score} AS score FROM d, g "
        f"WHERE {any_tf} > 0), "
        f"tk AS (SELECT doc_id, score FROM s "
        f"ORDER BY score DESC, doc_id LIMIT {k}) "
        "SELECT doc_id, score, cast(row_number() OVER ("
        "ORDER BY score DESC, doc_id) as int) AS rank FROM tk "
        "ORDER BY rank"
    )
