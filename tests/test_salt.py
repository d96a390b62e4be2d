from pyspark.sql import functions as F

from imagery_utils_spark.operators import salt as S


def test_salted_collect_list_matches_plain(spark):
    rows = [("hot", i) for i in range(2000)] + [("cold", i) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, v int")
    plain = {
        r.k: sorted(r.vs)
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r.k: sorted(r.vs)
        for r in S.salted_aggregate(
            df, ["k"],
            [F.collect_list("v").alias("vs")],
            [F.flatten(F.collect_list("vs")).alias("vs")],
            n_salts=8, salt_from="v",
        ).collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    rows = [("hot", i) for i in range(1000)]
    df = S.with_salt(spark.createDataFrame(rows, "k string, v int"), 8, from_col="v")
    n = df.select("_salt").distinct().count()
    assert n == 8  # the single hot key fans out across all salts


def test_salted_explode_join_matches_plain(spark):
    stream = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 0)], "k string, v int"
    )
    build = spark.createDataFrame([("hot", "H"), ("cold", "C"), ("unused", "U")],
                                  "k string, payload string")
    plain = sorted(tuple(r) for r in stream.join(build, "k").collect())
    salted = sorted(tuple(r) for r in
                    S.salted_explode_join(stream, build, "k", n_salts=4,
                                          stream_salt_from="v").collect())
    assert salted == plain
