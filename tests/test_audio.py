"""G.711 companding: exhaustive spec parity over the full 16-bit input
space (DuckDB evaluates the shared expression text fast), plus a Spark
apply_steps spot-check proving the JVM path computes the same bytes."""

import duckdb
from pyspark.sql import functions as F

from imagery_utils_spark.functions.audio import (
    ALAW_DECODE_STEPS, ALAW_ENCODE_STEPS, ULAW_DECODE_STEPS,
    ULAW_ENCODE_STEPS, apply_steps, rebind, steps_sql)

SEG_UEND = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


# Independent reference: the classic public-domain g711.c bit-twiddling
# form (CLIP + overflow branch), NOT the CASE-ladder algebra under test.
def ref_ulaw_enc(x):
    mask = 0x7F if x < 0 else 0xFF
    m = min(abs(x) >> 2, 8159) + 33
    seg = next((i for i, e in enumerate(SEG_UEND) if m <= e), 8)
    if seg >= 8:
        return 0x7F ^ mask
    return ((seg << 4) | ((m >> (seg + 1)) & 0xF)) ^ mask


def ref_ulaw_dec(c):
    u = ~c & 0xFF
    mag = ((2 * (u & 0xF) + 33) << ((u >> 4) & 7)) - 33
    return (-mag if u & 0x80 else mag) << 2


def ref_alaw_enc(x):
    p = x >> 3
    mask = 0xD5 if p >= 0 else 0x55
    v = p if p >= 0 else ~p
    seg = next((i for i, e in enumerate(SEG_AEND) if v <= e), 8)
    if seg >= 8:
        return 0x7F ^ mask
    sh = 1 if seg < 2 else seg
    return ((seg << 4) | ((v >> sh) & 0xF)) ^ mask


def ref_alaw_dec(c):
    a = c ^ 0x55
    seg, mant = (a >> 4) & 7, a & 0xF
    t = mant << 4
    t = t + 8 if seg == 0 else t + 0x108 if seg == 1 else (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


ALL_STEPS = (ULAW_ENCODE_STEPS + ULAW_DECODE_STEPS + ALAW_ENCODE_STEPS
             + ALAW_DECODE_STEPS
             + rebind(ULAW_ENCODE_STEPS, "r", {"x": "upcm"})
             + rebind(ALAW_ENCODE_STEPS, "r", {"x": "apcm"}))


def test_g711_exhaustive_against_spec_reference():
    sql = steps_sql("SELECT range - 32768 AS x FROM range(65536)",
                    ALL_STEPS)
    rows = duckdb.sql(
        f"SELECT x, ucode, upcm, acode, apcm, rucode, racode "
        f"FROM ({sql}) q ORDER BY x").fetchall()
    assert len(rows) == 65536
    u_nonidem = a_nonidem = 0
    for x, uc, up, ac, ap, ruc, rac in rows:
        assert uc == ref_ulaw_enc(x), x
        assert up == ref_ulaw_dec(uc), x
        assert ac == ref_alaw_enc(x), x
        assert ap == ref_alaw_dec(ac), x
        if ruc != uc:
            u_nonidem += 1
            assert up == 0, "mu-law non-idempotence only at decoded 0"
        a_nonidem += rac != ac
    # the three 'negative zero' inputs (-1, -2, -3); A-law exact
    assert u_nonidem == 3
    assert a_nonidem == 0


def test_g711_spark_jvm_path_matches_reference(spark):
    xs = list(range(-32768, 32768, 997)) + [-32768, -4, -1, 0, 1, 32767]
    df = apply_steps(
        spark.createDataFrame([(x,) for x in xs], "x int"), ALL_STEPS)
    for r in df.select("x", "ucode", "upcm", "acode", "apcm").collect():
        assert r.ucode == ref_ulaw_enc(r.x)
        assert r.upcm == ref_ulaw_dec(r.ucode)
        assert r.acode == ref_alaw_enc(r.x)
        assert r.apcm == ref_alaw_dec(r.acode)


def test_g711_quantization_error_bounds():
    # worst case sits in the clip region: mu-law tops out at
    # decode(max code) = 32124, |x|<=32768 -> 644; A-law at 32256 -> 512
    sql = steps_sql("SELECT range - 32768 AS x FROM range(65536)",
                    ALL_STEPS)
    mu, aa = duckdb.sql(
        f"SELECT max(abs(x - upcm)), max(abs(x - apcm)) FROM ({sql}) q"
    ).fetchone()
    assert (mu, aa) == (644, 512)
