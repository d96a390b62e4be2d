"""G.711 audio companding (mu-law + A-law) as pure column algebra.

ITU-T G.711 is the telephony codec: 16-bit linear PCM compressed to one
log-companded byte per sample. Both directions are branchless integer
math — sign/segment/mantissa packing — so the WHOLE codec runs as JVM
column expressions (no Python in the hot path, whole-stage codegen),
and the identical expression TEXT doubles as the DuckDB oracle: every
step below is written in the dialect-shared SQL subset (CASE, floor,
abs, least, %, & and arithmetic; XOR-by-constant is rewritten as
``a + m - 2*(a & m)`` because DuckDB spells xor differently).

Formulas follow the ITU spec / the classic public-domain g711.c tables:

mu-law encode (14-bit magnitude domain, bias 33, clip 8159):
    s    = 128 if x < 0 else 0
    m    = min(|x| >> 2, 8159) + 33          # biased, in [33, 8192]
    e    = floor(log2 m) - 5                 # segment 0..7 (CASE ladder)
    mant = (m >> (e+1)) & 0xF
    code = ~(s | e<<4 | mant) & 0xFF  ==  255 - (s + 16e + mant)
decode is the midpoint inverse  m' = (2*mant + 33) << e  - 33, back to
16-bit via << 2.  Encode(decode(code)) == code for every code except
the "negative zero" cell (decoded sample 0 loses its sign — an ITU
quirk, counted not hidden).

A-law encode (13-bit domain, mask 0x55/0xD5, segment table 0x1F..0xFFF):
    p    = x >> 3                 # arithmetic shift == floor(x/8)
    v    = p if p >= 0 else -p-1  # one's-complement fold, mask carries sign
    seg  = CASE ladder over the seg_aend thresholds
    mant = (v >> max(seg,1)) & 0xF
    code = (seg<<4 | mant) XOR mask
decode:  t = (mant<<4 + (8 if seg==0 else 264)) << max(seg-1,0), signed
by the (inverted-convention) sign bit. A-law decode never returns 0, so
its roundtrip is exactly idempotent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ULAW_ENCODE_STEPS", "ULAW_DECODE_STEPS",
           "ALAW_ENCODE_STEPS", "ALAW_DECODE_STEPS",
           "apply_steps", "steps_sql", "rebind"]


def _seg_case(var: str, thresholds: list[int], base: int = 0) -> str:
    """Descending CASE ladder: value for the highest threshold <= var."""
    arms = " ".join(
        f"WHEN {var} >= {t} THEN {base + len(thresholds) - i}"
        for i, t in enumerate(sorted(thresholds, reverse=True)))
    return f"CASE {arms} ELSE {base} END"


# ---- mu-law ----------------------------------------------------------------
# input column: x (16-bit signed int), output column: ucode (0..255)
ULAW_ENCODE_STEPS: list[tuple[str, str]] = [
    ("u_s", "CASE WHEN x < 0 THEN 128 ELSE 0 END"),
    # clamp at 8158 so the biased value stays <= 8191: bit-identical to
    # the spec's CLIP=8159 + "seg >= 8 -> return max code" overflow arm
    ("u_m", "least(cast(floor(abs(x) / 4) as bigint), 8158) + 33"),
    # floor(log2 m) - 5 for m in [33, 8192]
    ("u_e", _seg_case("u_m", [64, 128, 256, 512, 1024, 2048, 4096])),
    ("u_mant",
     "cast(floor(u_m / cast(power(2, u_e + 1) as bigint)) as bigint) % 16"),
    ("ucode", "255 - (u_s + u_e * 16 + u_mant)"),
]

# input column: ucode, outputs: upcm (decoded 16-bit sample)
ULAW_DECODE_STEPS: list[tuple[str, str]] = [
    ("ud_u", "255 - ucode"),
    ("ud_s", "cast(floor(ud_u / 128) as bigint)"),
    ("ud_e", "cast(floor(ud_u / 16) as bigint) % 8"),
    ("ud_m", "ud_u % 16"),
    ("ud_mag",
     "(2 * ud_m + 33) * cast(power(2, ud_e) as bigint) - 33"),
    ("upcm", "(1 - 2 * ud_s) * ud_mag * 4"),
]

# ---- A-law -----------------------------------------------------------------
# input column: x, output column: acode (0..255)
ALAW_ENCODE_STEPS: list[tuple[str, str]] = [
    ("a_p", "cast(floor(x / 8) as bigint)"),
    ("a_mask", "CASE WHEN a_p >= 0 THEN 213 ELSE 85 END"),
    ("a_v", "CASE WHEN a_p >= 0 THEN a_p ELSE -a_p - 1 END"),
    # segment: 0 for v<=31, 1 for <=63, ... 7 for <=4095, 8 = clip
    ("a_seg", _seg_case("a_v", [32, 64, 128, 256, 512, 1024, 2048, 4096])),
    ("a_shift", "CASE WHEN a_seg < 2 THEN 1 ELSE a_seg END"),
    ("a_mant",
     "cast(floor(a_v / cast(power(2, a_shift) as bigint)) as bigint) % 16"),
    ("a_aval",
     "CASE WHEN a_seg >= 8 THEN 127 ELSE a_seg * 16 + a_mant END"),
    # aval XOR mask, spelled portably for a constant-free form
    ("acode", "a_aval + a_mask - 2 * (a_aval & a_mask)"),
]

# input column: acode, output: apcm
ALAW_DECODE_STEPS: list[tuple[str, str]] = [
    ("ad_a", "acode + 85 - 2 * (acode & 85)"),
    ("ad_pos", "cast(floor(ad_a / 128) as bigint)"),
    ("ad_seg", "cast(floor(ad_a / 16) as bigint) % 8"),
    ("ad_mant", "ad_a % 16"),
    ("ad_t",
     "CASE WHEN ad_seg = 0 THEN ad_mant * 16 + 8 "
     "WHEN ad_seg = 1 THEN ad_mant * 16 + 264 "
     "ELSE (ad_mant * 16 + 264) "
     "* cast(power(2, ad_seg - 1) as bigint) END"),
    ("apcm", "CASE WHEN ad_pos = 1 THEN ad_t ELSE -ad_t END"),
]


def apply_steps(df: DataFrame, steps: list[tuple[str, str]]) -> DataFrame:
    """Fold the step expressions onto ``df`` as JVM columns (Spark side).
    Each step may reference every earlier one; Catalyst inlines the
    chain into one whole-stage-codegen projection."""
    return reduce(lambda d, s: d.withColumn(s[0], F.expr(s[1])), steps, df)


def steps_sql(inner: str, steps: list[tuple[str, str]]) -> str:
    """The SAME step expressions as nested SELECTs over ``inner`` (the
    DuckDB oracle side) — identical expression text, so results are
    bit-exact by construction, not by luck."""
    sql = inner
    for name, expr in steps:
        sql = f"SELECT t.*, {expr} AS {name} FROM ({sql}) t"
    return sql


import re as _re


def rebind(steps: list[tuple[str, str]], prefix: str,
           inputs: dict[str, str]) -> list[tuple[str, str]]:
    """Re-instantiate a step chain against different input columns with
    prefixed output names (e.g. re-encode a DECODED sample to check
    roundtrip idempotence without column collisions). Pure text
    rewrite on word boundaries, so the re-bound chain stays in the
    dialect-shared SQL subset."""
    ren = dict(inputs)
    out = []
    for name, expr in steps:
        expr2 = _re.sub(r"\b\w+\b",
                        lambda m: ren.get(m.group(0), m.group(0)), expr)
        new = prefix + name
        out.append((new, expr2))
        ren[name] = new
    return out
