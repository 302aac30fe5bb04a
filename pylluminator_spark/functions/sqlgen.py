"""ANSI-SQL text generators mirroring functions.stats expression trees.

Used by the correctness oracle: the DuckDB side of Stouffer/pOOBAH-style
queries needs the SAME arithmetic (identical operation order) as the Spark
column expressions so both engines produce bit-identical doubles. The
polynomial (Horner) structure here matches ndtri_expr / erfc_expr exactly.
"""

from __future__ import annotations

_A = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
      1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
_B = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
      6.680131188771972e01, -1.328068155288572e01]
_C = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
      -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
_D = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
      3.754408661907416e00]
_P_LOW = 0.02425

_ERFC_COEFFS = [-1.26551223, 1.00002368, 0.37409196, 0.09678418, -0.18628806,
                0.27886807, -1.13520398, 1.48851587, -0.82215223, 0.17087277]

_SQRT2 = "1.4142135623730951"


def _poly_sql(coeffs: list[float], x: str) -> str:
    """Horner form identical to stats._poly: acc = acc*x + c."""
    acc = repr(coeffs[0])
    for c in coeffs[1:]:
        acc = f"(({acc}) * ({x}) + {c!r})"
    return acc


def ndtri_sql(p: str) -> str:
    """Inverse normal CDF (Acklam) as a SQL expression over ``p``.

    NOTE: for bit-exact cross-engine parity keep p inside the central region
    [0.02425, 0.97575] — the tails involve log/sqrt (libm ulp differences).
    """
    q_c = f"(({p}) - 0.5)"
    r = f"({q_c} * {q_c})"
    central = (
        f"(({_poly_sql(_A, r)}) * {q_c} / (({_poly_sql(_B, r)}) * {r} + 1.0))"
    )
    q_low = f"sqrt(-2.0 * ln({p}))"
    x_low = f"(({_poly_sql(_C, q_low)}) / (({_poly_sql(_D, q_low)}) * ({q_low}) + 1.0))"
    q_high = f"sqrt(-2.0 * ln(1.0 - ({p})))"
    x_high = f"(-(({_poly_sql(_C, q_high)}) / (({_poly_sql(_D, q_high)}) * ({q_high}) + 1.0)))"
    return (
        f"(CASE WHEN ({p}) < {_P_LOW} THEN {x_low} "
        f"WHEN ({p}) > {1 - _P_LOW!r} THEN {x_high} "
        f"ELSE {central} END)"
    )


def erfc_sql(x: str) -> str:
    """Complementary error function, same polynomial as erfc_expr."""
    z = f"abs({x})"
    t = f"(1.0 / (1.0 + 0.5 * {z}))"
    # nested Horner identical to erfc_expr: c0 + t*(c1 + t*(...))
    poly = repr(_ERFC_COEFFS[-1])
    for c in reversed(_ERFC_COEFFS[:-1]):
        poly = f"({c!r} + ({t}) * ({poly}))"
    ans = f"(({t}) * exp(-({z}) * ({z}) + {poly}))"
    return f"(CASE WHEN ({x}) >= 0 THEN {ans} ELSE 2.0 - {ans} END)"


def norm_sf_sql(x: str) -> str:
    """P(X > x) for standard normal: 0.5 * erfc(x / sqrt(2))."""
    return f"(0.5 * {erfc_sql(f'(({x}) / {_SQRT2})')})"
