"""Corpus-wide paragraph-level exact deduplication (RefinedWeb-style).

Falcon/RefinedWeb (Penedo et al. 2023, arXiv:2306.01116 §3.3) removes
EXACT duplicate paragraphs across the whole corpus, keeping the first
occurrence, then rebuilds each document from its surviving paragraphs —
the step that strips boilerplate (nav bars, cookie banners, footers)
that near-dup doc-level passes miss. The reference pipeline's analog is
its per-scene metadata dedupe (pgc_mosaic candidate de-duplication);
here the unit is the paragraph.

Paragraph unit: consecutive ``chunk``-token windows of the whitespace
tokenization (``functions.text.tokens_col``) — the corpus text is
single-line, so fixed-size token windows stand in for blank-line splits;
the operator takes any paragraph array, so a ``split(text, '\\n\\n')``
front-end drops in unchanged for real page text.

Scale shape (100 TB story):
 - chunking is a pure JVM projection (split/slice/transform — zero
   Python, zero shuffle);
 - keep-first is ``groupBy(paragraph).agg(min(struct(doc_id, idx)))`` —
   NOT a window over the paragraph key: hot boilerplate paragraphs
   (millions of copies of a cookie banner) are absorbed by map-side
   partial aggregation instead of all landing in one window task;
 - rebuild is one ``doc_id`` shuffle (sort_array over collected
   (idx, para) structs), partial-agg friendly.
Two shuffles total; both keys are either pre-hashed strings or the
original doc key — no skew amplification beyond what AQE handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imagery_utils_spark.functions.text import tokens_col

__all__ = ["paragraph_chunks", "dedup_paragraphs"]


def paragraph_chunks(docs: DataFrame, chunk: int = 10,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Explode each document into (doc_id, para_idx, para) rows.

    ``para_idx`` is 0-based; paragraph = ``chunk`` consecutive whitespace
    tokens joined by a single space (the final paragraph may be shorter).
    Pure column algebra: split -> sequence -> slice -> concat_ws.
    """
    toks = tokens_col(F.col(text_col))
    n_paras = F.floor((F.size(toks) + chunk - 1) / F.lit(chunk))
    # guard: sequence(0, -1) would DESCEND ([0, -1]) for empty docs
    paras = F.when(
        n_paras > 0,
        F.transform(
            F.sequence(F.lit(0), n_paras.cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * chunk + 1, chunk)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (docs
            .select(F.col(id_col).alias("doc_id"), paras.alias("_paras"))
            .filter(F.size("_paras") > 0)
            .select("doc_id", F.posexplode("_paras")
                    .alias("para_idx", "para")))


def dedup_paragraphs(docs: DataFrame, chunk: int = 10,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide keep-first paragraph dedup + clean-text rebuild.

    Returns one row per input document:
      doc_id, clean_text (surviving paragraphs rejoined in order),
      n_paras (paragraphs before), n_removed (duplicates dropped).
    First occurrence = minimum (doc_id, para_idx) over the corpus for
    that exact paragraph string — deterministic, order-independent.
    """
    chunks = paragraph_chunks(docs, chunk, text_col, id_col)
    first = chunks.groupBy("para").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("_first"))
    kept = (chunks.join(first, "para")
            .filter((F.col("doc_id") == F.col("_first.doc_id"))
                    & (F.col("para_idx") == F.col("_first.para_idx")))
            .select("doc_id", "para_idx", "para"))
    totals = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s["para"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("_n_kept"),
    )
    return (totals.join(rebuilt, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                "n_paras",
                (F.col("n_paras")
                 - F.coalesce("_n_kept", F.lit(0))).alias("n_removed"),
            ))
