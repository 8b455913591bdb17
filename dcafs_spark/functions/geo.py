"""GIS column functions (haversine, bearing, NMEA degrees, UTM).

Parity targets: reference `src/util/gis/GisTools.java` (distance/
bearing :117-213, GDC↔UTM :214-352 — standard WGS-84 Snyder transverse
Mercator series) and `src/util/gis/Waypoint.java` geofencing. All pure
column arithmetic — codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EARTH_R_KM = 6371.0088
# WGS-84
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_K0 = 0.9996


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine).

    The haversine term is clamped to 1.0: floating-point error on
    near-antipodal pairs can push it to 1 + few-ulp, where sqrt > 1
    and asin returns NaN instead of ~20015 km."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = F.sin(dp / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) ** 2
    return 2 * _EARTH_R_KM * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing, degrees in [0, 360)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2 - lon1)
    y = F.sin(dl) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    return (F.degrees(F.atan2(y, x)) + 360.0) % 360.0


def nmea_degrees(raw: Column, hemi: Column) -> Column:
    """NMEA ddmm.mmmm (+ hemisphere N/S/E/W) → signed decimal degrees
    (reference GisTools.java:41-96 parsing)."""
    deg = F.floor(raw / 100.0)
    minutes = raw - deg * 100.0
    dec = deg + minutes / 60.0
    return F.when(hemi.isin("S", "W"), -dec).otherwise(dec)


def utm_zone(lon: Column) -> Column:
    # (lon + 180) % 360 wraps lon = 180.0 exactly to zone 1 (valid
    # zones are 1-60; the unwrapped formula yields 61 with a
    # nonexistent 183-degree central meridian)
    return (F.floor(((lon + 180.0) % 360.0) / 6.0) + 1).cast("int")


def utm_from_gdc(lat: Column, lon: Column) -> Column:
    """WGS-84 lat/lon → UTM as struct(easting, northing, zone,
    southern).

    Snyder (USGS PP 1395) series, the same projection the reference
    applies in GisTools.toUTM (GisTools.java:242-299). Multi-output →
    struct column; callers `select(utm.*)` (SURVEY §2.4).

    The ``southern`` flag is part of the output because a UTM
    coordinate without a hemisphere is ambiguous by definition (the
    false-northing offset folds southern latitudes into the northern
    range): without it, :func:`gdc_from_utm` cannot invert the
    projection from the struct alone (round-11 review — the old
    3-field struct forced callers to carry the hemisphere
    out-of-band)."""
    zone = utm_zone(lon)
    lon0 = F.radians((zone.cast("double") - 1) * 6.0 - 180.0 + 3.0)
    phi = F.radians(lat)
    lam = F.radians(lon)

    ep2 = _E2 / (1 - _E2)
    n = _A / F.sqrt(1 - _E2 * F.sin(phi) ** 2)
    t = F.tan(phi) ** 2
    c = ep2 * F.cos(phi) ** 2
    a_ = F.cos(phi) * (lam - lon0)

    m = _A * (
        (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256) * phi
        - (3 * _E2 / 8 + 3 * _E2**2 / 32 + 45 * _E2**3 / 1024) * F.sin(2 * phi)
        + (15 * _E2**2 / 256 + 45 * _E2**3 / 1024) * F.sin(4 * phi)
        - (35 * _E2**3 / 3072) * F.sin(6 * phi)
    )

    easting = (
        _K0 * n * (a_ + (1 - t + c) * a_**3 / 6 + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * a_**5 / 120)
        + 500000.0
    )
    northing = _K0 * (
        m
        + n
        * F.tan(phi)
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * a_**6 / 720
        )
    )
    northing = F.when(lat < 0, northing + 10000000.0).otherwise(northing)
    return F.struct(
        easting.alias("easting"),
        northing.alias("northing"),
        zone.alias("zone"),
        (lat < 0).alias("southern"),
    )


def gdc_from_utm(easting: Column, northing: Column, zone: Column, southern: Column | None = None) -> Column:
    """UTM easting/northing/zone → WGS-84 lat/lon struct (inverse
    Snyder series — the reference's `gdc` op writes both indexes,
    GisTools.java:320-352). Pure column arithmetic; staged through the
    footprint-latitude terms exactly once each."""
    e1 = (1 - F.sqrt(F.lit(1 - _E2))) / (1 + F.sqrt(F.lit(1 - _E2)))
    ep2 = _E2 / (1 - _E2)
    x = easting - 500000.0
    y = northing if southern is None else F.when(southern, northing - 10000000.0).otherwise(northing)
    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    # footprint latitude
    phi1 = (
        mu
        + (e1 * 3 / 2 - 27 * e1**3 / 32) * F.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(4 * mu)
        + (151 * e1**3 / 96) * F.sin(6 * mu)
        + (1097 * e1**4 / 512) * F.sin(8 * mu)
    )
    sin1, cos1, tan1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    c1 = ep2 * cos1**2
    t1 = tan1**2
    n1 = _A / F.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / F.pow(1 - _E2 * sin1**2, 1.5)
    d = x / (n1 * _K0)
    lat = F.degrees(
        phi1
        - (n1 * tan1 / r1)
        * (
            d**2 / 2
            - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ep2) * d**4 / 24
            + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ep2 - 3 * c1**2) * d**6 / 720
        )
    )
    lon0 = (zone.cast("double") - 1) * 6.0 - 180.0 + 3.0
    lon = lon0 + F.degrees(
        (d - (1 + 2 * t1 + c1) * d**3 / 6 + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ep2 + 24 * t1**2) * d**5 / 120)
        / cos1
    )
    return F.struct(lat.alias("lat"), lon.alias("lon"))


def geofence_state(dist_km: Column, radius_km: float) -> Column:
    """INSIDE/OUTSIDE classification for a waypoint circle
    (Waypoint.java:71-105); ENTER/LEAVE transitions come from lag()
    over this column (operators.waypoints).

    A NULL or NaN distance (dropped GPS fix) propagates as NULL: the
    old otherwise-branch mapped it to OUTSIDE, fabricating a spurious
    LEAVE + ENTER pair around one bad record."""
    return (
        F.when(dist_km.isNull() | F.isnan(dist_km), F.lit(None).cast("string"))
        .when(dist_km <= radius_km, F.lit("INSIDE"))
        .otherwise(F.lit("OUTSIDE"))
    )
