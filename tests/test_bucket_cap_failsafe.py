"""auto_bucket_cap fail-safe (VERDICT r5 #8): with NO size estimate, a
wide input engages the star-link cap via the partition-count heuristic
instead of failing open into an uncapped degenerate-bucket self-join."""

from imagery_utils_spark.operators.dedup import (
    DEFAULT_BUCKET_CAP, UNCAPPED_BUCKET, auto_bucket_cap)


def test_failsafe_caps_wide_unknown_input(spark):
    wide = spark.range(0, 10_000, numPartitions=300)
    narrow = spark.range(0, 100, numPartitions=4)
    # no estimate + wide input -> capped (the fail-safe)
    assert auto_bucket_cap(None, None, df=wide) == DEFAULT_BUCKET_CAP
    # no estimate + narrow input -> uncapped (battery regime unchanged)
    assert auto_bucket_cap(None, None, df=narrow) == UNCAPPED_BUCKET
    # no estimate, no df -> uncapped (legacy behavior)
    assert auto_bucket_cap(None, None) == UNCAPPED_BUCKET
    # explicit cap always wins
    assert auto_bucket_cap(7, None, df=wide) == 7
    # a real estimate overrides the heuristic in both directions
    assert auto_bucket_cap(None, 1, df=wide) == UNCAPPED_BUCKET
    assert auto_bucket_cap(None, 20_000_000, df=narrow) == DEFAULT_BUCKET_CAP
