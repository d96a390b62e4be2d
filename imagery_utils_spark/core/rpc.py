"""RPC00B rational-polynomial camera model (terrain correction, R3 residual).

The reference terrain-corrects imagery by shelling out to
``gdalwarp -rpc -to RPC_DEM=<dem>|RPC_HEIGHT=<h>``
(/root/reference/lib/ortho_functions.py:1878-1932) and pulls the default
height from the RPC metadata's HEIGHT_OFF (get_rpc_height,
/root/reference/lib/ortho_functions.py:1936-1960). GDAL's ``-rpc``
transformer implements the public RPC00B model (the NITF RPC00B TRE /
GDAL RFC 22 "RPC georeferencing" — 20-term cubic rational polynomials per
image axis). This module implements that same model from the public spec,
three ways with a SHARED arithmetic order so results are bit-identical:

* numpy batch kernels (``rpc_forward_np`` / ``rpc_inverse_np``) — the
  image<->ground workhorse for Arrow-batched UDFs; the inverse is the
  Newton iteration GDAL's RPCInverseTransformPoint performs, with the
  analytic 2x2 Jacobian of the rational polynomials;
* Spark Column builders (``rpc_forward_cols``) — forward ground->image as
  pure JVM whole-stage-codegen column algebra (no UDF);
* ANSI-SQL twins (``rpc_forward_sql``) — the identical expression for the
  DuckDB oracle; term order, power chains, and accumulation association are
  generated from one exponent table, so IEEE-754 evaluation is bit-equal.

Scale: the model is ~90 doubles per scene. Per-scene coefficients ride as
literal expressions (one scene / broadcast dim) or as array columns; either
way the forward transform is a single codegen projection over the fact
table — zero shuffles, zero Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# RPC00B term order (NITF spec coefficient index 1..20):
# 1, L, P, H, LP, LH, PH, L^2, P^2, H^2, PLH, L^3, LP^2, LH^2, L^2P, P^3,
# PH^2, L^2H, P^2H, H^3    with L=normalized lon, P=normalized lat,
# H=normalized height.
RPC00B_EXPONENTS: tuple[tuple[int, int, int], ...] = (
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (2, 0, 0),
    (0, 2, 0), (0, 0, 2), (1, 1, 1), (3, 0, 0),
    (1, 2, 0), (1, 0, 2), (2, 1, 0), (0, 3, 0),
    (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
)


@dataclass(frozen=True)
class RPCModel:
    """The 90 numbers of an RPC00B TRE (offsets/scales + 4x20 coefficients)."""

    lat_off: float
    lat_scale: float
    lon_off: float
    lon_scale: float
    height_off: float
    height_scale: float
    line_off: float
    line_scale: float
    samp_off: float
    samp_scale: float
    line_num: tuple = field(default=())
    line_den: tuple = field(default=())
    samp_num: tuple = field(default=())
    samp_den: tuple = field(default=())

    def __post_init__(self):
        for name in ("line_num", "line_den", "samp_num", "samp_den"):
            c = tuple(float(v) for v in getattr(self, name))
            if len(c) != 20:
                raise ValueError(f"{name} must have 20 coefficients, got {len(c)}")
            object.__setattr__(self, name, c)


def demo_model() -> RPCModel:
    """Deterministic all-dyadic model for tests and the oracle battery: every
    offset, scale, and coefficient is an exact binary fraction, denominators
    stay within (0.75, 1.25) on the normalized unit box (|each den term|
    <= 3/256, 19 terms => |sum| <= 0.223), so the rational is well-behaved
    and both engines evaluate the identical IEEE sequence."""

    def num(seed, dominant):
        # camera-like: a dominant unit linear term (real RPCs have
        # line ~ -P, samp ~ L) + small cubic perturbations, so the Newton
        # inverse is well-posed on the unit box
        base = [((i * 7 + seed) % 13 - 6) / 1024.0 for i in range(20)]
        base[dominant] += 1.0
        return tuple(base)

    def den(seed):
        return (1.0,) + tuple(((i * 5 + seed) % 7 - 3) / 256.0 for i in range(1, 20))

    return RPCModel(
        lat_off=0.0, lat_scale=0.5, lon_off=0.0, lon_scale=0.5,
        height_off=64.0, height_scale=512.0,
        line_off=8192.0, line_scale=8192.0, samp_off=8192.0, samp_scale=8192.0,
        line_num=num(3, 2), line_den=den(1), samp_num=num(5, 1), samp_den=den(2),
    )


# ------------------------------------------------------------------ numpy


def _powers_np(v: np.ndarray) -> tuple:
    """(1, v, v*v, (v*v)*v) — explicit multiply chain, the same association
    the Column/SQL builders emit."""
    v2 = v * v
    return (None, v, v2, v2 * v)


def poly20_np(coeffs, L: np.ndarray, P: np.ndarray, H: np.ndarray) -> np.ndarray:
    Lp, Pp, Hp = _powers_np(L), _powers_np(P), _powers_np(H)
    acc = None
    for c, (eL, eP, eH) in zip(coeffs, RPC00B_EXPONENTS):
        t = np.full_like(L, c) if (eL, eP, eH) == (0, 0, 0) else np.float64(c)
        if eL:
            t = t * Lp[eL]
        if eP:
            t = t * Pp[eP]
        if eH:
            t = t * Hp[eH]
        acc = t if acc is None else acc + t
    return acc


def rpc_forward_np(m: RPCModel, lon, lat, height):
    """ground (lon, lat, h) -> image (line, samp). Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    height = np.asarray(height, dtype=np.float64)
    L = (lon - m.lon_off) / m.lon_scale
    P = (lat - m.lat_off) / m.lat_scale
    H = (height - m.height_off) / m.height_scale
    rn = poly20_np(m.line_num, L, P, H) / poly20_np(m.line_den, L, P, H)
    cn = poly20_np(m.samp_num, L, P, H) / poly20_np(m.samp_den, L, P, H)
    return rn * m.line_scale + m.line_off, cn * m.samp_scale + m.samp_off


def _poly20_partials_np(coeffs, L, P, H):
    """(d/dL, d/dP) of the 20-term polynomial (H fixed per point)."""
    Lp, Pp, Hp = _powers_np(L), _powers_np(P), _powers_np(H)
    one = np.ones_like(L)
    dL = np.zeros_like(L)
    dP = np.zeros_like(L)
    for c, (eL, eP, eH) in zip(coeffs, RPC00B_EXPONENTS):
        hpart = Hp[eH] if eH else one
        ppart = Pp[eP] if eP else one
        lpart = Lp[eL] if eL else one
        if eL:
            dL = dL + c * eL * (Lp[eL - 1] if eL > 1 else one) * ppart * hpart
        if eP:
            dP = dP + c * eP * lpart * (Pp[eP - 1] if eP > 1 else one) * hpart
    return dL, dP


def rpc_inverse_np(m: RPCModel, line, samp, height, iters: int = 12,
                   tol: float = 1e-12):
    """image (line, samp) at terrain height h -> ground (lon, lat).

    Newton iteration on the normalized system r(L,P)=rn, c(L,P)=cn with the
    analytic Jacobian of the rational polynomials (quotient rule) — the same
    fixed-point GDAL's RPC inverse performs. Starts at the offset point
    (L=P=0). Converges quadratically for well-posed RPCs; ``iters`` bounds
    the worst case."""
    line = np.asarray(line, dtype=np.float64)
    samp = np.asarray(samp, dtype=np.float64)
    height = np.asarray(height, dtype=np.float64)
    H = (height - m.height_off) / m.height_scale
    rn_t = (line - m.line_off) / m.line_scale
    cn_t = (samp - m.samp_off) / m.samp_scale
    L = np.zeros_like(rn_t)
    P = np.zeros_like(rn_t)
    for _ in range(iters):
        ln = poly20_np(m.line_num, L, P, H)
        ld = poly20_np(m.line_den, L, P, H)
        sn = poly20_np(m.samp_num, L, P, H)
        sd = poly20_np(m.samp_den, L, P, H)
        f1 = ln / ld - rn_t
        f2 = sn / sd - cn_t
        dln_L, dln_P = _poly20_partials_np(m.line_num, L, P, H)
        dld_L, dld_P = _poly20_partials_np(m.line_den, L, P, H)
        dsn_L, dsn_P = _poly20_partials_np(m.samp_num, L, P, H)
        dsd_L, dsd_P = _poly20_partials_np(m.samp_den, L, P, H)
        # quotient rule
        a = (dln_L * ld - ln * dld_L) / (ld * ld)   # d f1 / dL
        b = (dln_P * ld - ln * dld_P) / (ld * ld)   # d f1 / dP
        c = (dsn_L * sd - sn * dsd_L) / (sd * sd)   # d f2 / dL
        d = (dsn_P * sd - sn * dsd_P) / (sd * sd)   # d f2 / dP
        det = a * d - b * c
        det = np.where(np.abs(det) < 1e-30, np.copysign(1e-30, det), det)
        dL = (f1 * d - f2 * b) / det
        dP = (a * f2 - c * f1) / det
        L = L - dL
        P = P - dP
        if float(np.max(np.abs(dL))) < tol and float(np.max(np.abs(dP))) < tol:
            break
    return L * m.lon_scale + m.lon_off, P * m.lat_scale + m.lat_off


# ------------------------------------------------------ Column / SQL twins


def _poly20_col(coeffs, L, P, H):
    from pyspark.sql import functions as F

    L2, P2, H2 = L * L, P * P, H * H
    Lp = (None, L, L2, L2 * L)
    Pp = (None, P, P2, P2 * P)
    Hp = (None, H, H2, H2 * H)
    acc = None
    for c, (eL, eP, eH) in zip(coeffs, RPC00B_EXPONENTS):
        t = F.lit(float(c))
        if eL:
            t = t * Lp[eL]
        if eP:
            t = t * Pp[eP]
        if eH:
            t = t * Hp[eH]
        acc = t if acc is None else acc + t
    return acc


def rpc_forward_cols(m: RPCModel, lon, lat, height):
    """ground->image as pure Column algebra: (line, samp) Columns.
    Whole-stage-codegen JVM math — identical op order to rpc_forward_np and
    rpc_forward_sql."""
    from pyspark.sql import functions as F

    L = (lon - F.lit(m.lon_off)) / F.lit(m.lon_scale)
    P = (lat - F.lit(m.lat_off)) / F.lit(m.lat_scale)
    H = (height - F.lit(m.height_off)) / F.lit(m.height_scale)
    rn = _poly20_col(m.line_num, L, P, H) / _poly20_col(m.line_den, L, P, H)
    cn = _poly20_col(m.samp_num, L, P, H) / _poly20_col(m.samp_den, L, P, H)
    return rn * F.lit(m.line_scale) + F.lit(m.line_off), \
        cn * F.lit(m.samp_scale) + F.lit(m.samp_off)


def _dlit(v: float) -> str:
    """DOUBLE literal. A bare decimal token is typed DECIMAL(19,18) by
    DuckDB and decimal-rounded BEFORE any CAST can apply (double-rounding,
    1-ulp errors observed); an e-notation token is typed DOUBLE directly and
    parses correctly rounded — 17 significant digits round-trips every
    double."""
    return f"{float(v):.17e}"


def _poly20_sql(coeffs, L: str, P: str, H: str) -> str:
    L2, P2, H2 = f"({L}*{L})", f"({P}*{P})", f"({H}*{H})"
    Lp = (None, L, L2, f"({L2}*{L})")
    Pp = (None, P, P2, f"({P2}*{P})")
    Hp = (None, H, H2, f"({H2}*{H})")
    terms = []
    for c, (eL, eP, eH) in zip(coeffs, RPC00B_EXPONENTS):
        t = _dlit(c)
        if eL:
            t = f"({t}*{Lp[eL]})"
        if eP:
            t = f"({t}*{Pp[eP]})"
        if eH:
            t = f"({t}*{Hp[eH]})"
        terms.append(t)
    acc = terms[0]
    for t in terms[1:]:
        acc = f"({acc}+{t})"
    return acc


def rpc_forward_sql(m: RPCModel, lon: str, lat: str, height: str) -> tuple[str, str]:
    """The identical forward transform as two ANSI-SQL expressions
    (line_expr, samp_expr) for the DuckDB oracle — bit-equal to the Column
    form because term order, power chains, and accumulation association are
    generated from the same table."""
    L = f"(({lon}-{_dlit(m.lon_off)})/{_dlit(m.lon_scale)})"
    P = f"(({lat}-{_dlit(m.lat_off)})/{_dlit(m.lat_scale)})"
    H = f"(({height}-{_dlit(m.height_off)})/{_dlit(m.height_scale)})"
    rn = f"({_poly20_sql(m.line_num, L, P, H)}/{_poly20_sql(m.line_den, L, P, H)})"
    cn = f"({_poly20_sql(m.samp_num, L, P, H)}/{_poly20_sql(m.samp_den, L, P, H)})"
    return (f"(({rn}*{_dlit(m.line_scale)})+{_dlit(m.line_off)})",
            f"(({cn}*{_dlit(m.samp_scale)})+{_dlit(m.samp_off)})")
