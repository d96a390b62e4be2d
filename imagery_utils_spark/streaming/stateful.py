"""Custom stateful streaming operator via ``applyInPandasWithState``.

The mosaic pipeline's streaming form: as scene records arrive, each tile
keeps a CHAMPION (the best-scoring contributor so far) and emits a row only
when the champion changes — the incremental-refresh path for cutline/
composite inputs (the batch engine re-ranks everything;
/root/reference/pgc_mosaic.py re-sorts the full candidate list per run).
The built-in windowed aggregates can't express "running argmax with
change-only emission"; this is exactly the custom-state shape
``applyInPandasWithState`` exists for.

State per key: (champion id, champion score, tie id) — O(1) bytes per key,
bounded by key cardinality, no timeout (champions never expire here; a
production deployment with retiring tiles would use event-time timeouts).

Determinism contract: the winner is max(score), ties broken by LOWEST id —
a total order, so the FINAL champion per key is batch/stream identical
regardless of how the input is split into micro-batches (the emission
HISTORY depends on batch boundaries; the fixed point does not — tests pin
both)."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

CHAMPION_OUT = StructType([
    StructField("key", StringType()),
    StructField("champion_id", LongType()),
    StructField("score", DoubleType()),
    StructField("n_challengers", LongType()),
])
CHAMPION_STATE = StructType([
    StructField("champion_id", LongType()),
    StructField("score", DoubleType()),
    StructField("n_seen", LongType()),
])


def _champion_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        champ_id, champ_score, n_seen = state.get
    else:
        champ_id, champ_score, n_seen = None, float("-inf"), 0
    prev = (champ_id, champ_score)
    for pdf in pdfs:
        n_seen += len(pdf)
        for cid, score in zip(pdf["id"], pdf["score"]):
            score = float(score)
            # order-independent fold: keeps (max score, min id at that
            # score) whatever the row order inside or across batches
            if score > champ_score or (
                score == champ_score and (champ_id is None or cid < champ_id)
            ):
                champ_id, champ_score = int(cid), score
    state.update((champ_id, champ_score, n_seen))
    if champ_id is not None and (champ_id, champ_score) != prev:
        yield pd.DataFrame({
            "key": [key[0]], "champion_id": [champ_id],
            "score": [champ_score], "n_challengers": [n_seen],
        })


def running_champion(df: DataFrame, key_col: str, id_col: str,
                     score_col: str) -> DataFrame:
    """(key, champion_id, score, n_challengers) per key per micro-batch —
    update output mode; the last row per key is the running champion."""
    from pyspark.sql import functions as F

    keyed = df.select(
        F.col(key_col).alias("key").cast("string"),
        F.col(id_col).alias("id").cast("long"),
        F.col(score_col).alias("score").cast("double"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _champion_update, CHAMPION_OUT, CHAMPION_STATE,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_champion_stream_to_memory(spark, src_path: str, schema: str,
                                  name: str, key_col: str, id_col: str,
                                  score_col: str, max_files: int = 1):
    """availableNow harness: drain ``src_path`` (one micro-batch per
    ``max_files`` files -> real multi-batch state transitions), memory sink
    accumulates every emission."""
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files).parquet(src_path))
    # The stateful exchange materializes one state-store instance per
    # shuffle partition PER TRIGGER; with a handful of keys, inheriting a
    # batch-tuned 4x-cores partition count just multiplies state-store
    # setup I/O (measured ~2x of the drain wall at 128 partitions). Clamp
    # while the stream is planned, restore after — a real deployment sets
    # this per-job at submit time.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (running_champion(src, key_col, id_col, score_col)
             .writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        if not q.awaitTermination(300):
            # a partial drain would silently return a wrong fixed point
            # (and race the caller's source cleanup) — fail loudly instead
            q.stop()
            raise TimeoutError(
                f"champion stream {name!r} did not drain within 300 s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)


QUOTA_OUT = StructType([
    StructField("domain", StringType()),
    StructField("doc_id", LongType()),
    StructField("rank", LongType()),
    StructField("batch_seq", LongType()),
])
QUOTA_STATE = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("batch_seq", LongType()),
])


def streaming_domain_quota(df: DataFrame, domain_col: str, id_col: str,
                           k: int) -> DataFrame:
    """Streaming twin of ``sampling.domain_cap``: each domain keeps the K
    LOWEST ids seen so far (an order-independent running top-K fold —
    unlike a first-K-arrivals quota, the fixed point is batch-boundary
    independent, so late arrivals with smaller ids correctly EVICT
    earlier members). State is O(K) longs per domain; every batch emits
    the domain's full current membership stamped with a batch sequence
    number, so the caller reads the fixed point as the rows of the
    highest batch_seq per domain."""
    from pyspark.sql import functions as F

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, seq = state.get
            ids = list(ids)
        else:
            ids, seq = [], 0
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["id"])
        ids = sorted(set(ids))[:k]
        seq += 1
        state.update((ids, seq))
        yield pd.DataFrame({
            "domain": [key[0]] * len(ids),
            "doc_id": ids,
            "rank": list(range(1, len(ids) + 1)),
            "batch_seq": [seq] * len(ids),
        })

    keyed = df.select(F.col(domain_col).alias("domain").cast("string"),
                      F.col(id_col).alias("id").cast("long"))
    return keyed.groupBy("domain").applyInPandasWithState(
        update, QUOTA_OUT, QUOTA_STATE,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_quota_stream_to_memory(spark, src_path: str, schema: str,
                               name: str, domain_col: str, id_col: str,
                               k: int, max_files: int = 1):
    """availableNow drain harness (same shape as the champion's)."""
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", max_files).parquet(src_path))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (streaming_domain_quota(src, domain_col, id_col, k)
             .writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True).start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                f"quota stream {name!r} did not drain within 300 s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)
