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
    # One greedy regex pass over the single-space-joined token string
    # partitions it into exactly ``chunk``-token groups (tail shorter) —
    # identical strings to the old per-paragraph transform+slice+concat
    # build, which re-sliced the token array per paragraph and measured
    # 4x slower at sf1.0 (r6, guide §1.2 per-task work). ``\S``/
    # ``\s`` are the same Java classes tokens_col splits on, so group
    # boundaries land exactly between tokens.
    paras = F.regexp_extract_all(
        F.concat_ws(" ", toks),
        F.lit(r"\S+(?: \S+){0,%d}" % (chunk - 1)), 0)
    # no size filter (r6): posexplode (non-outer) already drops empty
    # arrays, and filter pushdown re-substituted the regex partition
    # into the Filter node below the Project — the whole pass ran twice
    return (docs
            .select(F.col(id_col).alias("doc_id"), paras.alias("_paras"))
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
    # keep-first NEEDS no join back to chunks (r6, guide §2.4): the
    # min-(doc_id, idx) struct per paragraph already IS the kept
    # occurrence — carrying the paragraph string through a second
    # chunks-sized exchange was pure waste.
    first = chunks.groupBy("para").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("_first"))
    kept = first.select(F.col("_first.doc_id").alias("doc_id"),
                        F.col("_first.para_idx").alias("para_idx"),
                        "para")
    # per-doc paragraph count is closed-form from the token count — a
    # pure projection, not a second explode + groupBy pass
    _toks = tokens_col(F.col(text_col))
    totals = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.floor((F.size(_toks) + chunk - 1) / F.lit(chunk))
        .cast("long").alias("n_paras"))
        .filter(F.col("n_paras") > 0))
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
