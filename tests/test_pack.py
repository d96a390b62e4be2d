"""Sequence packing (operators/pack.py): prefix-sum exactness under
arbitrary input partitioning, chunk arithmetic, empty docs."""
from pyspark.sql import functions as F

from imagery_utils_spark.operators.pack import global_offsets, pack_sequences


def test_global_offsets_exact_and_partitioning_invariant(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    expected = {}
    acc = 0
    for i, n in rows:
        expected[i] = acc
        acc += n
    for reparted in (df, df.repartition(11), df.repartition(1)):
        got = {r.doc_id: r.start
               for r in global_offsets(reparted, "n", "doc_id").collect()}
        assert got == expected


def test_pack_sequences_chunks(spark):
    rows = [(0, "a b c"), (1, ""), (2, "d e f g"), (3, "h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pack_sequences(df, seq_len=4).collect()}
    # token counts 3, 0, 4, 1 -> starts 0, 3, 3, 7
    assert (got[0].start, got[1].start, got[2].start, got[3].start) \
        == (0, 3, 3, 7)
    assert (got[0].first_chunk, got[0].last_chunk) == (0, 0)
    assert got[1].first_chunk is None and got[1].last_chunk is None
    assert (got[2].first_chunk, got[2].last_chunk) == (0, 1)  # spans 3..6
    assert (got[3].first_chunk, got[3].last_chunk) == (1, 1)
