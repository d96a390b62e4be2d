"""Feature hashing (the "hashing trick", Weinberger et al. 2009,
public): fixed-dimension sparse feature vectors from unbounded token
vocabularies, with NO vocabulary build, NO broadcast dictionary, NO
second pass — the property that makes it the default featurizer at
10^12-document scale (a vocabulary table for Common Crawl is itself a
multi-TB shuffle; the hash needs none).

bucket = sha-derived hash of the token mod ``dim``; sign = one extra
hash bit (±1), which makes collisions cancel in expectation (the
signed-hash variant from the paper). Both come from the SAME sha256
the rest of the repo uses for cross-engine hashing (first 15 hex
chars = 60 bits fits int64: Spark ``conv(hex, 16, 10)`` ↔ DuckDB
``('0x' || hex)::bigint``), so the DuckDB oracle replays the exact
vectors.

Scale shape: explode tokens (partition-local), ONE groupBy
(doc, bucket) with map-side partial aggregation — token multiplicity
collapses before the shuffle — then an optional per-doc rollup that
reuses the same doc partitioning. Zero Python, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imagery_utils_spark.functions.text import tokens_col

__all__ = ["feature_hash", "feature_vector_digest"]


def feature_hash(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", dim: int = 64,
                 dict_broadcast: bool = True) -> DataFrame:
    """(id, bucket, w): signed-hash feature vectors, zero entries
    dropped (a cancelled bucket is indistinguishable from an untouched
    one — exactly the hashing-trick semantics).

    ``dict_broadcast`` (r6, guide §2.3 — same move as the weighted
    cms_build): sha256 runs once per DISTINCT token via a broadcast
    (token, bucket, sign) dictionary instead of once per occurrence —
    identical output (bucket/sign are pure functions of the token).
    The distinct is Heaps-law-bounded and map-side combinable; pass
    ``False`` when the corpus vocabulary outgrows a broadcast (the
    hashing trick itself never *needs* the dictionary — that fallback
    is the 10^12-doc shape, paying sha per occurrence instead)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens_col(F.lower(F.col(text_col)))).alias("tok"))
    h = F.sha2(F.col("tok"), 256)
    bucket = (F.conv(F.substring(h, 1, 15), 16, 10)
              .cast("long") % dim).alias("bucket")
    sign = (1 - 2 * (F.conv(F.substring(h, 16, 1), 16, 10)
                     .cast("long") % 2)).alias("s")
    if dict_broadcast:
        dic = toks.select("tok").distinct().select("tok", bucket, sign)
        keyed = toks.join(F.broadcast(dic), "tok").select(
            F.col(id_col), "bucket", "s")
    else:
        keyed = toks.select(F.col(id_col), bucket, sign)
    return (keyed
            .groupBy(id_col, "bucket").agg(F.sum("s").alias("w"))
            .filter(F.col("w") != 0))


def feature_vector_digest(vecs: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """Per-doc rollup pinning the whole vector: nnz, l1 norm, and a
    sha over the sorted "bucket:w" rendering (structs sorted, not
    joined strings — string sorts diverge from ORDER BY on prefixes)."""
    rendered = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket", "w"))),
        lambda r: F.concat_ws(":", r["bucket"].cast("string"),
                              r["w"].cast("string")))
    return (vecs.groupBy(id_col)
            .agg(F.count("*").alias("nnz"),
                 F.sum(F.abs(F.col("w"))).alias("l1"),
                 F.sha2(F.concat_ws(",", rendered), 256)
                 .alias("vec_sha")))
