"""Blocked fuzzy join (operators/fuzzy.py): distance filter, blocking
recall/miss contract, skew diagnostic."""

from pyspark.sql import functions as F

from imagery_utils_spark.operators.fuzzy import (
    block_stats,
    blocked_fuzzy_join,
)


def test_blocked_fuzzy_join_basics(spark):
    dirty = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme korp"), (3, "acme c0rpx"),
         (4, "zzzz other"), (5, "bcme corp")],
        "id long, name string")
    clean = spark.createDataFrame([("acme corp",), ("zeta inc",)],
                                  "cname string")
    got = {(r.id, r.cname): r.dist
           for r in blocked_fuzzy_join(dirty, clean, "name", "cname",
                                       max_dist=2, block_n=4).collect()}
    assert got == {(1, "acme corp"): 0, (2, "acme corp"): 1,
                   (3, "acme corp"): 2}
    # id 5 is distance 1 but breaks the block key -> declared miss
    assert not any(i == 5 for i, _ in got)


def test_block_stats_reports_skew(spark):
    df = spark.createDataFrame(
        [("aaaa%d" % i,) for i in range(9)] + [("bbbb1",)],
        "name string")
    rows = block_stats(df, "name", block_n=4).collect()
    assert (rows[0].block, rows[0].n) == ("aaaa", 9)
    assert (rows[1].block, rows[1].n) == ("bbbb", 1)


def test_case_insensitive_blocking(spark):
    dirty = spark.createDataFrame([(1, "ACME corp")], "id long, name string")
    clean = spark.createDataFrame([("acme corp",)], "cname string")
    rows = blocked_fuzzy_join(dirty, clean, "name", "cname",
                              max_dist=4, block_n=4).collect()
    assert len(rows) == 1 and rows[0].dist == 4  # blocks match on lower


def test_range_lookup_bucketed_equals_broadcast(spark):
    from imagery_utils_spark.operators.rangejoin import range_lookup
    probes = spark.createDataFrame(
        [(i, i * 1000 + 7) for i in range(50)], "id long, v long")
    # disjoint ranges with gaps; one range spans a bucket boundary
    ranges = spark.createDataFrame(
        [(0, 1500, "a"), (2000, 9000, "b"), (15000, 17000, "c"),
         (30000, 49999, "d")],
        "lo long, hi long, tag string")
    a = sorted(tuple(r) for r in range_lookup(
        probes, ranges, "v").select("id", "tag").collect())
    b = sorted(tuple(r) for r in range_lookup(
        probes, ranges, "v", bucket_bits=12).select("id", "tag").collect())
    assert a == b
    tags = dict(a)
    assert tags[0] == "a" and tags[2] == "b" and tags[20] is None
    assert tags[35] == "d"  # range spanning several 4096-buckets


# --------------------------------------------------------- Jaro-Winkler

def test_jaro_winkler_published_vectors():
    """Winkler's published examples (also the Wikipedia worked cases)."""
    from imagery_utils_spark.operators.fuzzy import (
        jaro_similarity_py, jaro_winkler_py)

    # MARTHA/MARHTA: m=6, t=1 -> (1 + 1 + 5/6)/3 = 17/18 ≈ 0.944444
    assert abs(jaro_similarity_py("MARTHA", "MARHTA") - 17 / 18) < 1e-9
    assert abs(jaro_winkler_py("MARTHA", "MARHTA") - 0.9611111111111111) \
        < 1e-9
    # DWAYNE/DUANE: m=4, t=0 -> (4/6 + 4/5 + 1)/3 ≈ 0.822222
    assert abs(jaro_similarity_py("DWAYNE", "DUANE") - 0.8222222222222223) \
        < 1e-9
    assert jaro_similarity_py("abc", "abc") == 1.0
    assert jaro_similarity_py("abc", "xyz") == 0.0
    assert jaro_winkler_py("", "x") == 0.0


def test_jaro_winkler_boost_threshold_gate():
    """Prefix bonus must NOT apply when base jaro <= 0.7 (Winkler's
    original behavior; DuckDB agrees)."""
    from imagery_utils_spark.operators.fuzzy import (
        jaro_similarity_py, jaro_winkler_py)

    j = jaro_similarity_py("Gauss", "Ghosh")
    assert j <= 0.7
    assert jaro_winkler_py("Gauss", "Ghosh") == j


def test_jaro_winkler_bitwise_vs_duckdb():
    import itertools

    import duckdb

    from imagery_utils_spark.operators.fuzzy import (
        jaro_similarity_py, jaro_winkler_py)
    from independent_oracles import _NAME_STEMS

    con = duckdb.connect()
    for a, b in itertools.product(_NAME_STEMS, _NAME_STEMS):
        dj, djw = con.execute(
            "SELECT jaro_similarity(?, ?), "
            "jaro_winkler_similarity(?, ?)", [a, b, a, b]).fetchone()
        assert jaro_similarity_py(a, b) == dj, (a, b)
        assert jaro_winkler_py(a, b) == djw, (a, b)
