"""Statistical scalar expressions shared between the Spark plan and the
SQL oracle.

The inverse normal CDF (probit) is not built into Spark or DuckDB, so
both sides evaluate the SAME rational approximation (Acklam's 2003
algorithm, relative error < 1.15e-9 over (0, 1) — the public-domain
standard used by GSLIB-adjacent tooling).  :func:`probit` renders it as
a Catalyst ``Column``; :func:`probit_sql` renders the identical formula
as a SQL string — parity by construction, which is what lets the
normal-score transform be hash-checked against DuckDB instead of
settling for a rows-only query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Acklam coefficients (public domain)
_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
_P_LOW = 0.02425


def _poly(q, coeffs):
    """Horner evaluation that works for Columns and SQL strings alike."""
    acc = None
    for c in coeffs:
        acc = c if acc is None else acc * q + c
    return acc


def probit(p: Column) -> Column:
    """Inverse standard-normal CDF of ``p`` in (0, 1) as a pure Catalyst
    expression (three-region Acklam rational approximation)."""
    q_mid = p - 0.5
    r = q_mid * q_mid
    mid = _poly(r, _A) * q_mid / (_poly(r, _B) * r + 1.0)

    q_lo = F.sqrt(-2.0 * F.log(p))
    lo = _poly(q_lo, _C) / (_poly(q_lo, _D) * q_lo + 1.0)

    q_hi = F.sqrt(-2.0 * F.log(1.0 - p))
    hi = -(_poly(q_hi, _C) / (_poly(q_hi, _D) * q_hi + 1.0))

    return (
        F.when(p < _P_LOW, lo)
        .when(p > 1.0 - _P_LOW, hi)
        .otherwise(mid)
    )


def probit_sql(expr: str) -> str:
    """The SAME Acklam formula as a SQL scalar over ``expr`` (a
    parenthesized expression evaluating to p in (0, 1))."""
    def poly(q, coeffs):
        acc = None
        for c in coeffs:
            acc = repr(c) if acc is None else f"({acc} * {q} + {c!r})"
        return acc

    qm = f"(({expr}) - 0.5)"
    r = f"({qm} * {qm})"
    mid = f"({poly(r, _A)} * {qm} / ({poly(r, _B)} * {r} + 1.0))"
    ql = f"sqrt(-2.0 * ln({expr}))"
    lo = f"({poly(ql, _C)} / ({poly(ql, _D)} * {ql} + 1.0))"
    qh = f"sqrt(-2.0 * ln(1.0 - ({expr})))"
    hi = f"(-({poly(qh, _C)} / ({poly(qh, _D)} * {qh} + 1.0)))"
    return (
        f"(CASE WHEN ({expr}) < {_P_LOW!r} THEN {lo} "
        f"WHEN ({expr}) > 1.0 - {_P_LOW!r} THEN {hi} "
        f"ELSE {mid} END)"
    )


def probit_np(p):
    """The SAME Acklam formula vectorized over a numpy array — for
    Arrow-batch ranking paths (`operators/geostats.nscore` exact mode).
    Identical Horner order and constants as :func:`probit`, so Spark-,
    SQL- and numpy-evaluated scores agree to the ulp of the underlying
    libm (absorbed by the harness's round-to-6)."""
    import numpy as np

    p = np.asarray(p, np.float64)
    out = np.empty_like(p)
    mid = (p >= _P_LOW) & (p <= 1.0 - _P_LOW)
    lo = p < _P_LOW
    hi = p > 1.0 - _P_LOW

    def poly(q, coeffs):
        acc = np.full_like(q, coeffs[0])
        for c in coeffs[1:]:
            acc = acc * q + c
        return acc

    qm = p[mid] - 0.5
    r = qm * qm
    out[mid] = poly(r, _A) * qm / (poly(r, _B) * r + 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        ql = np.sqrt(-2.0 * np.log(p[lo]))
        out[lo] = poly(ql, _C) / (poly(ql, _D) * ql + 1.0)
        qh = np.sqrt(-2.0 * np.log(1.0 - p[hi]))
        out[hi] = -(poly(qh, _C) / (poly(qh, _D) * qh + 1.0))
    return out
