"""Statistical primitives replicated from the reference for golden parity.

- :func:`zprob` — area under the standard normal curve, Algorithm AS 66
  (Applied Statistics 22(3), 1973), replicated coefficient-for-
  coefficient from GT/core/SSUtils.java:48-109. Every hotspot statistic
  (Gi*, LISA, global Moran/Geary/G/Lee) derives its p-value through this
  exact approximation, so scipy's exact normal CDF would NOT reproduce
  reference outputs bit-for-bit.
- :func:`tprob` / :func:`fprob` — GT/core/SSUtils.java:111-250.
- :func:`format_round` — GT/core/FormatUtils.java:39-51
  (BigDecimal HALF_UP at 8 digits; applied to every stat column before
  it is written, e.g. GT/autocorrelation/LocalGStatisticOperation.java:173-176).

All functions are numpy-vectorized.
"""

from __future__ import annotations

import numpy as np

LEFT, RIGHT, BOTH = "left", "right", "both"


def zprob(x, tail: str = BOTH) -> np.ndarray:
    """AS-66 normal-curve tail area, vectorized. tail ∈ {left, right, both}."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)

    x0 = 0.398942280444
    x1 = 0.39990348504
    x2 = 5.75885480458
    x3 = -29.8213557808
    x4 = 2.62433121679
    x5 = 48.6959930692
    x6 = 5.92885724438
    x7 = 0.398942280385
    x8 = -3.8052e-08
    x9 = 1.00000615302
    x10 = 3.98064794e-04
    x11 = 1.98615381364
    x12 = -0.151679116635
    x13 = 5.29330324926
    x14 = 4.8385912808
    x15 = -15.1508972451
    x16 = 0.742380924027
    x17 = 30.789933034
    x18 = 3.99019417011
    lt = 7.0
    con = 1.28

    pos = x >= 0
    z = np.abs(x)
    y = 0.5 * z * z

    p_small = 0.5 - z * (x0 - x1 * y / (y + x2 + x3 / (y + x4 + x5 / (y + x6))))
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        p_large = (
            x7
            * np.exp(-y)
            / (z + x8 + x9
               / (z + x10 + x11
                  / (z + x12 + x13
                     / (z + x14 + x15 / (z + x16 + x17 / (z + x18))))))
        )
    p = np.where(z > lt, 0.0, np.where(z <= con, p_small, p_large))

    if tail == LEFT:
        p = np.where(pos, 1.0 - p, p)
    elif tail == RIGHT:
        p = np.where(~pos, 1.0 - p, p)
    else:
        p = 2.0 * p
    return float(p[0]) if scalar else p


def tprob(dof, t, tail: str = BOTH):
    """Student-t tail area, AS-66 approximation (GT/core/SSUtils.java:173-250)."""
    t = np.asarray(t, dtype=np.float64)
    scalar = t.ndim == 0
    t = np.atleast_1d(t)
    if dof <= 1:
        raise ValueError("Must have more than one degree of freedom")

    c = [0.09979441, -0.581821, 1.390993, -1.222452, 2.151185, 5.537409,
         11.42343, 0.04431742, -0.2206018, -0.03317253, 5.679969, -12.96519,
         5.166733, 13.49862, 0.009694901, -0.1408854, 1.88993, -12.75532,
         25.77532, 4.233736, 14.3963, -9.187228e-5, 0.03789901, -1.280346,
         9.249528, -19.08115, 2.777816, 16.46132, 5.79602e-4, -0.02763334,
         0.4517029, -2.657697, 5.127212, 0.5657187, 21.83269]
    (x1, x2, x3, x4, x5, x6, x7, x8, x9, x10, x11, x12, x13, x14, x15, x16,
     x17, x18, x19, x20, x21, x22, x23, x24, x25, x26, x27, x28, x29, x30,
     x31, x32, x33, x34, x35) = c

    V = 1.0 / float(dof)
    abst = np.abs(t)
    tmp = 1.0 + abst * (
        ((x1 + V * (x2 + V * (x3 + V * (x4 + V * x5)))) / (1 - V * (x6 - V * x7)))
        + abst * (
            ((x8 + V * (x9 + V * (x10 + V * (x11 + V * x12)))) / (1 - V * (x13 - V * x14)))
            + abst * (
                ((x15 + V * (x16 + V * (x17 + V * (x18 + V * x19)))) / (1 - V * (x20 - V * x21)))
                + abst * (
                    ((x22 + V * (x23 + V * (x24 + V * (x25 + V * x26)))) / (1 - V * (x27 - V * x28)))
                    + abst * ((x29 + V * (x30 + V * (x31 + V * (x32 + V * x33)))) / (1 - V * (x34 - V * x35)))
                )
            )
        )
    )
    p = 0.5 * np.power(tmp, -8.0)
    if tail == LEFT:
        p = np.where(t > 0, 1.0 - p, p)
    elif tail == BOTH:
        p = 2.0 * p
    return float(p[0]) if scalar else p


def fprob(x: float, m: int, n: int, tail: str = RIGHT) -> float:
    """F-distribution tail area (GT/core/SSUtils.java:111-171). Scalar."""
    a = 2 * (m // 2) - m + 2
    b = 2 * (n // 2) - n + 2
    w = x * (float(m) / float(n))
    z = 1.0 / (1.0 + w)
    y = 0.3183098862
    if a == 1:
        if b == 1:
            p = np.sqrt(w)
            d = y * z / p
            p = 2.0 * y * np.arctan(p)
        else:
            p = np.sqrt(w * z)
            d = 0.5 * p * z / w
    else:
        if b == 1:
            p = np.sqrt(z)
            d = 0.5 * z * p
            p = 1.0 - p
        else:
            d = z * z
            p = w * z
    y = 2.0 * w / z
    j = b + 2
    while j <= n:
        d = (1 + (1.0 * a) / (j - 2)) * d * z
        if a == 1:
            p = p + d * y / (j - 1)
        else:
            p = (p + w) * z
        j += 2
    y = w * z
    z = 2.0 / z
    b2 = n - 2
    i = a + 2
    while i <= m:
        j = i + b2
        d = y * d * j / (i - 2)
        p = p - z * d / j
        i += 2
    if tail == LEFT:
        p = 1.0 - p
    return float(p)


def format_round(val, digits: int = 8):
    """Decimal HALF_UP rounding at `digits` places (FormatUtils.round).

    numpy.round does banker's rounding; Java BigDecimal HALF_UP rounds
    .5 away from zero on the exact decimal expansion. For float64 values
    the two differ only when the scaled value lands exactly on .5 —
    emulated here via a tiny epsilon nudge away from zero, which matches
    BigDecimal(double) behavior for all practically occurring stats.
    """
    v = np.asarray(val, dtype=np.float64)
    scalar = v.ndim == 0
    v = np.atleast_1d(v)
    scale = 10.0 ** digits
    scaled = v * scale
    out = np.sign(scaled) * np.floor(np.abs(scaled) + 0.5) / scale
    out = np.where(np.isfinite(v), out, v)
    return float(out[0]) if scalar else out
