"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Table A1 — public) for webtext filtering:
per-document scalar heuristics plus the repetition metrics, each with an
explicit keep threshold, composed as one DataFrame operator.

Scale shape: the scalar metrics are pure JVM column algebra over the
token array (one scan, no shuffle, whole-stage codegen). The repetition
metrics (duplicate lines, top 2-gram) are explode → groupBy(doc, unit)
→ groupBy(doc) pipelines — partial aggregation map-side, rows are
(id, hash-sized unit) only, and both rollups re-use the doc_id
partitioning for the final joins. Adversarial million-line documents
stay linear (no per-doc O(L²) array lambdas).

Conventions (pinned so the SQL oracle is value-identical, not merely
similar):

* words = whitespace-split tokens, empties dropped.
* duplicate-line char fraction = chars in occurrences AFTER the first /
  total line chars (each line weighted by its occurrence count).
* top-2-gram char fraction = max over 2-grams of count(gram) ×
  chars(gram, space excluded) / total word chars — the count×chars
  maximization makes ties deterministic without a gram-order tiebreak.

Thresholds (Gopher Table A1): 50 ≤ words ≤ 100000; 3 ≤ mean word length
≤ 10; symbol-to-word ratio ('#' or '...') ≤ 0.1; ≥ 80% of words contain
an alphabetic character; ≥ 2 distinct stop words; duplicate-line
fraction ≤ 0.30; duplicate-line char fraction ≤ 0.20; top-2-gram char
fraction ≤ 0.20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gopher_quality", "GOPHER_STOPWORDS"]

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, text: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000,
                   stopwords: tuple[str, ...] = GOPHER_STOPWORDS
                   ) -> DataFrame:
    """Per-document Gopher metrics + ``keep`` flag. Lines split on
    ``\\n``; see module docstring for pinned conventions/thresholds."""
    words = F.filter(F.split(F.col(text), r"\s+"),
                     lambda w: w != F.lit(""))
    base = df.select(F.col(id_col), F.col(text).alias("_t"),
                     words.alias("_w"))

    n = F.size("_w")
    sum_len = F.aggregate("_w", F.lit(0),
                          lambda acc, x: acc + F.length(x))
    n_hash = F.length("_t") - F.length(F.expr("replace(_t, '#', '')"))
    n_ellip = ((F.length("_t")
                - F.length(F.expr("replace(_t, '...', '')"))) / 3
               ).cast("long")
    n_alpha = F.size(F.filter("_w", lambda x: x.rlike("[a-zA-Z]")))
    stops = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.array_intersect(
        F.transform("_w", F.lower), stops))

    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))
    scalars = base.select(
        id_col,
        n.alias("n_words"),
        sum_len.alias("_sum_len"),
        safe(sum_len.cast("double"), n.cast("double"))
        .alias("mean_word_len"),
        safe((n_hash + n_ellip).cast("double"), n.cast("double"))
        .alias("symbol_word_ratio"),
        safe(n_alpha.cast("double"), n.cast("double"))
        .alias("frac_alpha_words"),
        n_stop.alias("n_stopwords"),
    )

    # duplicate-line metrics: explode -> per-(doc,line) count -> per-doc
    lines = base.select(
        id_col,
        F.explode(F.filter(F.split("_t", "\n"),
                           lambda x: x != F.lit(""))).alias("line"))
    line_rollup = (
        lines.groupBy(id_col, "line")
        .agg(F.count("*").alias("cnt"), F.first(F.length("line")).alias("ln"))
        .groupBy(id_col)
        .agg(
            safe((F.sum("cnt") - F.count("*")).cast("double"),
                 F.sum("cnt").cast("double")).alias("dup_line_frac"),
            safe(F.sum((F.col("cnt") - 1) * F.col("ln")).cast("double"),
                 F.sum(F.col("cnt") * F.col("ln")).cast("double"))
            .alias("dup_line_char_frac"),
        ))

    # top 2-gram: explode consecutive word pairs -> count -> weighted max
    grams = base.select(
        id_col,
        F.explode(F.arrays_zip(
            F.expr("slice(_w, 1, greatest(size(_w) - 1, 0))").alias("a"),
            F.expr("slice(_w, 2, greatest(size(_w) - 1, 0))").alias("b"),
        )).alias("g"))
    gram_rollup = (
        grams.select(id_col, F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .groupBy(id_col, "a", "b")
        .agg((F.count("*")
              * (F.first(F.length("a")) + F.first(F.length("b"))))
             .alias("wcnt"))
        .groupBy(id_col)
        .agg(F.max("wcnt").alias("_top2")))

    out = (scalars
           .join(line_rollup, id_col, "left")
           .join(gram_rollup, id_col, "left"))
    top2 = F.when(F.col("_sum_len") > 0,
                  F.coalesce(F.col("_top2"), F.lit(0)).cast("double")
                  / F.col("_sum_len").cast("double")).otherwise(F.lit(0.0))
    dlf = F.coalesce("dup_line_frac", F.lit(0.0))
    dlcf = F.coalesce("dup_line_char_frac", F.lit(0.0))
    keep = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("mean_word_len") >= 3.0)
            & (F.col("mean_word_len") <= 10.0)
            & (F.col("symbol_word_ratio") <= 0.1)
            & (F.col("frac_alpha_words") >= 0.8)
            & (F.col("n_stopwords") >= 2)
            & (dlf <= 0.30) & (dlcf <= 0.20) & (top2 <= 0.20))
    return out.select(
        id_col, "n_words", "mean_word_len", "symbol_word_ratio",
        "frac_alpha_words", "n_stopwords",
        dlf.alias("dup_line_frac"),
        dlcf.alias("dup_line_char_frac"),
        top2.alias("top_2gram_char_frac"),
        keep.alias("keep"))
