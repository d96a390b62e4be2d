"""Bloom-filter pre-join — the runtime-row-filter pattern as an explicit,
cross-engine-replayable operator.

At 100 TB the expensive part of a selective dim⋈fact join is shuffling
fact rows that can never match. Spark's own runtime filters (and
Iceberg/Parquet bloom indexes) prune those rows before the shuffle; this
module reproduces that plan shape with a *deterministic* bloom so the
whole thing can be replayed bit-for-bit in SQL:

* **build** — the dim keys' k sha-derived positions in an ``m_bits``
  bitmap, packed into 32-bit words stored in int64 (shift amounts stay
  < 2^31, so the identical ``<<``/``&``/``bit_or`` algebra runs on both
  engines with no sign/overflow edge). The bitmap is ``m_bits/32`` rows
  — broadcast-sized by construction, independent of fact size.
* **probe** — each fact row tests its k bit positions against the
  broadcast word table (BroadcastHashJoin; ZERO fact shuffle). True
  members always survive (no false negatives); false positives survive
  at ~(set_bits/m_bits)^k and are eliminated by the exact semi-join
  that follows — which now shuffles only the candidate sliver.

Hash contract is the repo-wide one (sketch.sha_hash63_col): first 15
hex chars of sha256, salted per probe index — deterministic, identical
in DuckDB via ``('0x' || hex)::bigint``.

Reference parity: imagery_utils prunes its work lists with explicit
exclude/include membership sets (pgc_mosaic.py exclude lists); this is
the same membership gate built to survive a 10^12-row fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imagery_utils_spark.operators.sketch import sha_hash63_col

__all__ = ["bloom_positions", "bloom_build", "bloom_probe"]

WORD_BITS = 32  # packed word width; shifts < 2^31 are portable SQL


def bloom_positions(value, k: int, m_bits: int) -> list:
    """k salted bit positions for a key — position i is
    sha60("{i}:{key}") % m_bits."""
    return [
        (sha_hash63_col(F.concat(F.lit(f"{i}:"), value.cast("string")))
         % m_bits)
        for i in range(k)
    ]


def bloom_build(dim: DataFrame, value, k: int = 2,
                m_bits: int = 4096) -> DataFrame:
    """(word, bits) bitmap rows from the dim keys.

    One explode of k positions per dim row, one groupBy over a key
    space of at most m_bits/32 rows — map-side combinable, output
    broadcast-sized regardless of dim cardinality (choose m_bits for
    the target false-positive rate: fp ~ (1-e^{-kn/m})^k)."""
    pos = dim.select(F.explode(F.array(
        *bloom_positions(value, k, m_bits))).alias("p"))
    word = F.shiftright(F.col("p").cast("long"), 5).alias("w")
    return (pos.select(
        word,
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD_BITS} "
               f"AS INT))").alias("b"))
        .groupBy("w").agg(F.bit_or("b").alias("bits")))


def bloom_probe(fact: DataFrame, value, bloom: DataFrame, k: int = 2,
                m_bits: int = 4096,
                flag: str | None = None) -> DataFrame:
    """Fact rows whose k positions are ALL set in the bitmap.

    k broadcast left-joins against the word table (tiny), bit tests in
    JVM codegen; rows with any unset/missing word drop. No fact
    shuffle — the exact join downstream sees only the candidates.

    ``flag`` (r6): when set, keep EVERY fact row and emit the combined
    membership test as a boolean column named ``flag`` instead of
    filtering — lets a caller compute a whole probe funnel (total /
    candidates / matches) in ONE fact pass (guide §1.2) with identical
    per-row test results."""
    out = fact
    tests = []
    for i, p in enumerate(bloom_positions(value, k, m_bits)):
        out = out.withColumn(f"_p{i}", p)
        bw = bloom.select(F.col("w").alias(f"_w{i}"),
                          F.col("bits").alias(f"_b{i}"))
        out = out.join(
            F.broadcast(bw),
            F.shiftright(F.col(f"_p{i}").cast("long"), 5) == F.col(f"_w{i}"),
            "left")
        test = (F.col(f"_b{i}").isNotNull() & (
            F.col(f"_b{i}").bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                       f"CAST(_p{i} % {WORD_BITS} AS INT))")) != 0))
        if flag is None:
            out = out.filter(test)
        else:
            tests.append(test)
    if flag is not None:
        cond = tests[0]
        for t in tests[1:]:
            cond = cond & t
        out = out.withColumn(flag, cond)
    return out.drop(*[c for i in range(k)
                      for c in (f"_p{i}", f"_w{i}", f"_b{i}")])
