"""Bulk kNN contract (VERDICT r5 #7): the expanding-ring search batches
ALL still-active queries into one cell-join per round — the number of
Spark round-trips is O(log max_ring), independent of the query count.
1k queries must not cost 1k driver round-trips."""

from pyspark.sql import functions as F

from imagery_utils_spark.operators.knn import knn_expanding_ring


def test_bulk_queries_round_trips_independent_of_query_count(spark):
    pts = (spark.range(0, 3000)
           .select(F.col("id").alias("doc_id"),
                   ((F.col("id") * 7919) % 3600 / 10.0 - 180.0).alias("lon"),
                   ((F.col("id") * 104729) % 1700 / 10.0 - 85.0).alias("lat")))
    queries = [(f"q{i}", float((i * 37) % 360 - 180) + 0.25,
                float((i * 53) % 170 - 85) + 0.25) for i in range(1000)]
    stats: dict = {}
    out = knn_expanding_ring(pts, queries, k=3, res=3, stats=stats)
    rows = out.collect()
    # every query resolved with exactly k neighbors
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == 1000
    assert all(len(v) == 3 for v in by_q.values())
    # the scheduler ran a handful of batched rounds, NOT one per query:
    # each entry in probe_rows_per_round is one Spark job round-trip
    n_rounds = len(stats.get("probe_rows_per_round", []))
    assert 0 < n_rounds <= 10, n_rounds
