"""Function library: expression compilers + domain column functions.

All builders return `pyspark.sql.Column` expressions so the whole
pipeline stays inside Catalyst / whole-stage codegen. Python executes
only at plan-build time, never per row.
"""

from dcafs_spark.functions.compare import compile_compare
from dcafs_spark.functions.mathfab import MathExpr, compile_math
from dcafs_spark.functions.ocean import salinity, sound_velocity, true_wind_dir, true_wind_speed
from dcafs_spark.functions.geo import bearing_deg, haversine_km, utm_from_gdc
from dcafs_spark.functions.checksum import nmea_checksum, nmea_checksum_ok

__all__ = [
    "compile_compare",
    "compile_math",
    "MathExpr",
    "salinity",
    "sound_velocity",
    "true_wind_speed",
    "true_wind_dir",
    "haversine_km",
    "bearing_deg",
    "utm_from_gdc",
    "nmea_checksum",
    "nmea_checksum_ok",
]
