"""Geo-distance kernels over enriched coordinates.

The reference plugin stops at emitting ``latitude``/``longitude``
placeholders (filter_geoip.rb:187-202); the natural downstream question a
log pipeline asks of those columns is "how far from X?" (edge routing,
latency attribution, geo-fencing).  One vectorized haversine kernel, with
the SQL twin spelled from the SAME formula term order so the DuckDB oracle
reproduces the float arithmetic as closely as libm allows -- consumers
must bin/round the distance (see ``q_geo_rings``), never hash raw trig
output, since numpy's SIMD sin/cos and libm may differ in the last ulp.
"""

from __future__ import annotations

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat, lon, ref_lat: float, ref_lon: float):
    """Great-circle distance (km) from each (lat, lon) to a fixed point.

    ``lat``/``lon`` are numpy float64 arrays (degrees).  Formula term
    order matches :func:`sql_haversine_expr` exactly.
    """
    import numpy as np

    dphi = np.radians(lat - ref_lat)
    dlmb = np.radians(lon - ref_lon)
    a = (np.sin(dphi / 2.0) ** 2
         + np.cos(np.radians(ref_lat)) * np.cos(np.radians(lat))
         * np.sin(dlmb / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def sql_haversine_expr(lat_col: str, lon_col: str,
                       ref_lat: float, ref_lon: float) -> str:
    """The DuckDB spelling of :func:`haversine_km`, identical term order."""
    return (
        f"2.0 * {EARTH_RADIUS_KM!r} * asin(sqrt("
        f"pow(sin(radians({lat_col} - ({ref_lat!r})) / 2.0), 2)"
        f" + cos(radians({ref_lat!r})) * cos(radians({lat_col}))"
        f" * pow(sin(radians({lon_col} - ({ref_lon!r})) / 2.0), 2)))"
    )
