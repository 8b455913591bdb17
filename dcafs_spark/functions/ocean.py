"""Oceanographic column functions (pure Catalyst expressions).

The reference ships these as per-record BigDecimal lambdas inside
MathForward (`src/io/forward/MathForward.java:451-478`, formulas in
`src/util/math/Calculations.java:20-391`). All three are standard
published formulas — PSS-78 practical salinity (UNESCO 1983), Chen &
Millero 1977 sound velocity, COAPS true-wind — so we re-derive them
directly as Spark column arithmetic: fully codegen'd, vectorized,
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# PSS-78 constants (UNESCO technical paper 44)
_SAL_A = (0.0080, -0.1692, 25.3851, 14.0941, -7.0261, 2.7081)
_SAL_B = (0.0005, -0.0056, -0.0066, -0.0375, 0.0636, -0.0144)
_A1, _A2, _A3 = 2.070e-5, -6.370e-10, 3.989e-15
_B1, _B2, _B3, _B4 = 3.426e-2, 4.464e-4, 4.215e-1, -3.107e-3
_C0, _C1, _C2, _C3, _C4 = 6.766097e-1, 2.00564e-2, 1.104259e-4, -6.9698e-7, 1.0031e-9


def salinity(cond: Column, temp: Column, press: Column) -> Column:
    """PSS-78 practical salinity from conductivity (S/m), temperature
    (°C ITS-90) and pressure (dbar). Parity target:
    reference `Calculations.calcSalinity` (Calculations.java:61-99)."""
    c = cond * 10.0  # S/m → mmho/cm
    t = temp * 1.00024  # ITS-90 → IPTS-68
    r = c / 42.914
    val = F.lit(1.0) + _B1 * t + _B2 * t * t + _B3 * r + _B4 * r * t
    rp = F.lit(1.0) + (press * (_A1 + press * (_A2 + press * _A3))) / val
    rt_den = rp * (_C0 + (t * (_C1 + t * (_C2 + t * (_C3 + t * _C4)))))
    rt = r / rt_den
    rt = F.when(rt <= 0.0, F.lit(0.000001)).otherwise(rt)
    sum1 = F.lit(0.0)
    sum2 = F.lit(0.0)
    for i in range(6):
        p = F.pow(rt, i / 2.0)
        sum1 = sum1 + _SAL_A[i] * p
        sum2 = sum2 + _SAL_B[i] * p
    res = sum1 + sum2 * (t - 15.0) / (F.lit(1.0) + 0.0162 * (t - 15.0))
    return F.when(cond <= 0.0, F.lit(0.0)).otherwise(res)


def sound_velocity(sal: Column, temp: Column, press_db: Column) -> Column:
    """Chen & Millero 1977 sound velocity (m/s) from salinity (PSU),
    temperature (°C ITS-90), pressure (dbar). Parity target:
    reference `Calculations.calcSndVelC` (Calculations.java:108-146)."""
    t = temp * 1.00024
    p = press_db / 10.0
    s = F.when(sal < 0.0, F.lit(0.0)).otherwise(sal)
    sr = F.sqrt(s)
    d = 1.727e-3 - 7.9836e-6 * p
    b1 = 7.3637e-5 + 1.7945e-7 * t
    b0 = -1.922e-2 - 4.42e-5 * t
    b = b0 + b1 * p
    a3 = (-3.389e-13 * t + 6.649e-12) * t + 1.100e-10
    a2 = ((7.988e-12 * t - 1.6002e-10) * t + 9.1041e-9) * t - 3.9064e-7
    a1 = (((-2.0122e-10 * t + 1.0507e-8) * t - 6.4885e-8) * t - 1.2580e-5) * t + 9.4742e-5
    a0 = (((-3.21e-8 * t + 2.006e-6) * t + 7.164e-5) * t - 1.262e-2) * t + 1.389
    a = ((a3 * p + a2) * p + a1) * p + a0
    c3 = (-2.3643e-12 * t + 3.8504e-10) * t - 9.7729e-9
    c2 = (((1.0405e-12 * t - 2.5335e-10) * t + 2.5974e-8) * t - 1.7107e-6) * t + 3.1260e-5
    c1 = (((-6.1185e-10 * t + 1.3621e-7) * t - 8.1788e-6) * t + 6.8982e-4) * t + 0.153563
    c0 = ((((3.1464e-9 * t - 1.47800e-6) * t + 3.3420e-4) * t - 5.80852e-2) * t + 5.03711) * t + 1402.388
    c = ((c3 * p + c2) * p + c1) * p + c0
    return c + (a + b * sr + d * s) * s


def ctd_derive(
    df,
    cond: str = "cond",
    temp: str = "temp",
    press: str = "press",
    sal_out: str = "salinity_psu",
    svc_out: str = "soundvel_ms",
):
    """Staged salinity + sound-velocity over a CTD DataFrame.

    Same arithmetic as :func:`salinity` / :func:`sound_velocity`, but
    each shared subterm (t68, rt, the salinity result feeding soundvel)
    is materialized as its own projected column. Column-level
    composition would inline the full ``rt`` tree 12× (once per pow)
    and the whole salinity tree again inside soundvel — a combinatorial
    expression blow-up that overwhelms codegen (observed 50× slowdown
    at sf0.1). Catalyst's CollapseProject keeps non-cheap aliases that
    are referenced more than once as separate projections, so every
    subterm below is computed exactly once per row inside one
    whole-stage-codegen span.
    """
    t = F.col("_t68")
    p = F.col("_svp")
    r = F.col("_r")
    rt = F.col("_rt")
    df = (
        df.withColumn("_t68", F.col(temp) * 1.00024)
        .withColumn("_svp", F.col(press) / 10.0)
        .withColumn("_r", (F.col(cond) * 10.0) / 42.914)
    )
    val = F.lit(1.0) + _B1 * t + _B2 * t * t + _B3 * r + _B4 * r * t
    rp = F.lit(1.0) + (F.col(press) * (_A1 + F.col(press) * (_A2 + F.col(press) * _A3))) / val
    rt_den = rp * (_C0 + (t * (_C1 + t * (_C2 + t * (_C3 + t * _C4)))))
    rt0 = r / rt_den
    df = df.withColumn("_rt", F.when(rt0 <= 0.0, F.lit(0.000001)).otherwise(rt0))
    sum1 = F.lit(0.0)
    sum2 = F.lit(0.0)
    for i in range(6):
        pw = F.pow(rt, i / 2.0)
        sum1 = sum1 + _SAL_A[i] * pw
        sum2 = sum2 + _SAL_B[i] * pw
    res = sum1 + sum2 * (t - 15.0) / (F.lit(1.0) + 0.0162 * (t - 15.0))
    df = df.withColumn(sal_out, F.when(F.col(cond) <= 0.0, F.lit(0.0)).otherwise(res))

    s = F.col("_s")
    df = df.withColumn("_s", F.when(F.col(sal_out) < 0.0, F.lit(0.0)).otherwise(F.col(sal_out)))
    d = 1.727e-3 - 7.9836e-6 * p
    b1 = 7.3637e-5 + 1.7945e-7 * t
    b0 = -1.922e-2 - 4.42e-5 * t
    b = b0 + b1 * p
    a3 = (-3.389e-13 * t + 6.649e-12) * t + 1.100e-10
    a2 = ((7.988e-12 * t - 1.6002e-10) * t + 9.1041e-9) * t - 3.9064e-7
    a1 = (((-2.0122e-10 * t + 1.0507e-8) * t - 6.4885e-8) * t - 1.2580e-5) * t + 9.4742e-5
    a0 = (((-3.21e-8 * t + 2.006e-6) * t + 7.164e-5) * t - 1.262e-2) * t + 1.389
    a = ((a3 * p + a2) * p + a1) * p + a0
    c3 = (-2.3643e-12 * t + 3.8504e-10) * t - 9.7729e-9
    c2 = (((1.0405e-12 * t - 2.5335e-10) * t + 2.5974e-8) * t - 1.7107e-6) * t + 3.1260e-5
    c1 = (((-6.1185e-10 * t + 1.3621e-7) * t - 8.1788e-6) * t + 6.8982e-4) * t + 0.153563
    c0 = ((((3.1464e-9 * t - 1.47800e-6) * t + 3.3420e-4) * t - 5.80852e-2) * t + 5.03711) * t + 1402.388
    c = ((c3 * p + c2) * p + c1) * p + c0
    df = df.withColumn(svc_out, c + (a + b * F.sqrt(s) + d * s) * s)
    return df.drop("_t68", "_svp", "_r", "_rt", "_s")


def _true_wind_uv(windvel: Column, winddir: Column, sog_knots: Column, cog: Column, heading: Column):
    cog_eff = F.when(cog < 0, heading).otherwise(cog)
    app = F.radians(270.0 - (heading + winddir))
    course = F.radians(90.0 - cog_eff)
    sog_ms = sog_knots * 0.5144444
    tu = windvel * F.cos(app) + sog_ms * F.cos(course)
    tv = windvel * F.sin(app) + sog_ms * F.sin(course)
    return tu, tv


def true_wind_speed(windvel: Column, winddir: Column, sog_knots: Column, cog: Column, heading: Column) -> Column:
    """True wind speed (m/s) from apparent wind + ship nav (COAPS method;
    parity: Calculations.calcTrueWindVelocity, Calculations.java:198-211)."""
    tu, tv = _true_wind_uv(windvel, winddir, sog_knots, cog, heading)
    return F.round(F.sqrt(tu * tu + tv * tv), 5)


def true_wind_dir(windvel: Column, winddir: Column, sog_knots: Column, cog: Column, heading: Column) -> Column:
    """Meteorological true wind direction (deg, [0,360)); −999 when
    undefined (parity: Calculations.calcTrueWindDirection, :289-316)."""
    tu, tv = _true_wind_uv(windvel, winddir, sog_knots, cog, heading)
    raw = 270.0 - F.degrees(F.atan2(tv, tu))
    wrapped = F.round(raw, 1) % 360.0
    wrapped = F.when(wrapped < 0, wrapped + 360.0).otherwise(wrapped)
    return F.when((tu != 0) & (tv != 0), wrapped).otherwise(F.lit(-999.0))
