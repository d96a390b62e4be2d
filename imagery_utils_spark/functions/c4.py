"""C4-style line and document filters (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning" §2.2 — public): the line-granular
cleanup pass of a webtext pipeline.

Rules implemented (all pinned so the SQL oracle is value-identical):

* keep a line only if it ends in terminal punctuation (``. ! ? "``)
  AND has ≥ ``min_words_per_line`` whitespace words;
* drop the whole document if it contains "lorem ipsum" (lowercased) or
  a curly brace ``{`` (template/code page marker), or fewer than
  ``min_lines`` surviving lines;
* rebuild ``clean_text`` from the surviving lines.

Everything is one JVM projection over array higher-order functions
(split → filter with a nested word-count lambda → array_join) — no
shuffle, no Python; the filter composes with predicate pushdown when a
downstream stage selects ``keep``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_filter"]


def c4_filter(df: DataFrame, text: str = "text", id_col: str = "doc_id",
              min_words_per_line: int = 5, min_lines: int = 3
              ) -> DataFrame:
    """Per-document C4 cleanup: surviving-line counts, ``clean_text``,
    ``keep`` flag. Lines split on ``\\n``."""
    lines = F.filter(F.split(F.col(text), "\n"),
                     lambda ln: ln != F.lit(""))
    kept = F.filter(
        lines,
        lambda ln: ln.rlike('[.!?"]$')
        & (F.size(F.filter(F.split(ln, r"\s+"),
                           lambda w: w != F.lit("")))
           >= min_words_per_line))
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    banned = (F.lower(F.col(text)).contains("lorem ipsum")
              | F.col(text).contains("{"))
    return df.select(
        id_col,
        n_lines.alias("n_lines"),
        n_kept.alias("n_lines_kept"),
        (n_lines - n_kept).alias("n_lines_dropped"),
        F.array_join(kept, "\n").alias("clean_text"),
        (~banned & (n_kept >= min_lines)).alias("keep"),
    )
