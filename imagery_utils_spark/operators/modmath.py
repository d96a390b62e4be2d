"""Modular-arithmetic DataFrame kernels: binary exponentiation as a
column-rewrite chain, and baby-step/giant-step discrete log as an
equi-join (Shanks 1971).

Both keep every multiply in JVM long arithmetic (modulus must satisfy
mod^2 < 2^63, i.e. mod < ~3.0e9), so the hot path is whole-stage
codegen with zero Python. Square-and-multiply is a DRIVER loop of
``bits`` column rewrites — O(log exp) projections over the same rows,
no shuffle at all; on a cluster each executor exponentiates its own
partition independently.

BSGS is the Spark-native meet-in-the-middle: the two O(sqrt p)
half-enumerations are cheap row explosions, and the collision search —
the actual algorithm — is ONE hash equi-join on the group element.
(Reference kinship: /root/reference/lib/mosaic.py resolves candidate
collisions by join-on-derived-key the same way; see SURVEY.md J1.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_modpow", "bsgs_discrete_log"]


def with_modpow(df: DataFrame, out: str, base: str, exp: str,
                mod: str, bits: int) -> DataFrame:
    """Add column ``out`` = base^exp mod mod (square-and-multiply,
    low bit first; ``exp`` must fit in ``bits`` nonnegative bits)."""
    sq, res = f"__sq_{out}", f"__res_{out}"
    df = (df.withColumn(sq, F.col(base).cast("long") % F.col(mod))
            .withColumn(res, F.lit(1).cast("long")))
    for b in range(bits):
        bit = F.shiftright(F.col(exp).cast("long"), b) % 2
        df = df.withColumn(
            res, F.when(bit == 1, (F.col(res) * F.col(sq)) % F.col(mod))
                  .otherwise(F.col(res)))
        if b < bits - 1:
            df = df.withColumn(sq, (F.col(sq) * F.col(sq)) % F.col(mod))
    return df.withColumn(out, F.col(res)).drop(sq, res)


def bsgs_discrete_log(inst: DataFrame, key: str = "doc_id",
                      p: str = "p", g: str = "g", h: str = "h",
                      max_m: int = 64) -> DataFrame:
    """Per-instance minimal x with g^x = h (mod p), p prime, via
    baby-step/giant-step. Returns (key, dlog). Requires
    ceil(sqrt(p-1)) <= max_m. Coverage: every x in [0, m^2) has the
    unique split x = i*m + j, so min over join matches is the true
    minimal discrete log."""
    spark = inst.sparkSession
    m = F.ceil(F.sqrt((F.col(p) - 1).cast("double"))).cast("long")
    base = inst.select(key, p, g, h, m.alias("m"))
    steps = spark.range(max_m).select(F.col("id").alias("s"))
    ebits = max_m.bit_length()
    baby = with_modpow(
        base.crossJoin(steps).filter(F.col("s") < F.col("m"))
            .withColumnRenamed("s", "j"),
        "val", g, "j", p, ebits)
    # giant factor g^(p-1-m): Fermat inverse of g^m (p prime, p∤g)
    giant0 = with_modpow(
        base.withColumn("e", F.col(p) - 1 - F.col("m")),
        "fac", g, "e", p, 34)
    giant = with_modpow(
        giant0.crossJoin(steps).filter(F.col("s") < F.col("m"))
              .withColumnRenamed("s", "i"),
        "fi", "fac", "i", p, ebits
    ).select(key, "m", "i",
             ((F.col(h) * F.col("fi")) % F.col(p)).alias("val"))
    hit = baby.select(key, "j", "val").join(giant, [key, "val"])
    return (hit.groupBy(key)
            .agg(F.min(F.col("i") * F.col("m") + F.col("j"))
                 .alias("dlog")))
