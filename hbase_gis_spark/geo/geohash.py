"""Geohash kernel: encode / decode / neighbors / cell bbox.

Implements the public geohash algorithm (Niemeyer 2008): interleave
longitude/latitude bisection bits (lon first) and emit base-32 characters
from the alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.

Reference parity: the reference builds 12-char rowkeys via
``GeoHash.withCharacterPrecision(lat, lon, 12).toBase32()``
(/root/reference/src/main/java/tech/stackable/gis/hbase/Ingest.java:77)
and widens KNN candidate sets with the 8 adjacent cells
(/root/reference/src/main/java/tech/stackable/gis/hbase/KNNQuery.java:84-88).

Neighbors are computed *numerically* (decode center, offset by one cell
width/height, re-encode) rather than with the classic lookup-table
algorithm — same result, fewer table-transcription bugs, and property-
tested against decode/encode round trips.
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_INDEX = {c: i for i, c in enumerate(BASE32)}


def encode(lat: float, lon: float, precision: int = 12) -> str:
    """Base-32 geohash of (lat, lon) at ``precision`` characters."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    chars: list[str] = []
    ch = 0
    bit = 0
    even = True  # geohash starts with a longitude bit
    while len(chars) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2.0
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2.0
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            chars.append(BASE32[ch])
            ch = 0
            bit = 0
    return "".join(chars)


def encode_many(
    lats: np.ndarray, lons: np.ndarray, precision: int = 12
) -> np.ndarray:
    """Vectorized geohash encode over numpy arrays (the pandas-UDF hot path).

    Performs the same bisection as :func:`encode` (bit-identical results),
    but batched: 5 * precision vectorized comparisons instead of a Python
    loop per point. NaN coordinates yield ``None`` (the reference drops
    NaN rows — WithinFilter.java:93-95 — so callers can filter on null).
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    n = lats.shape[0]
    ok = ~(np.isnan(lats) | np.isnan(lons))

    lat_lo = np.full(n, -90.0)
    lat_hi = np.full(n, 90.0)
    lon_lo = np.full(n, -180.0)
    lon_hi = np.full(n, 180.0)

    nbits = 5 * precision
    codes = np.zeros((precision, n), dtype=np.int8)
    even = True
    for b in range(nbits):
        if even:
            mid = (lon_lo + lon_hi) * 0.5
            hit = lons >= mid
            lon_lo = np.where(hit, mid, lon_lo)
            lon_hi = np.where(hit, lon_hi, mid)
        else:
            mid = (lat_lo + lat_hi) * 0.5
            hit = lats >= mid
            lat_lo = np.where(hit, mid, lat_lo)
            lat_hi = np.where(hit, lat_hi, mid)
        even = not even
        codes[b // 5] = (codes[b // 5] << 1) | hit.astype(np.int8)

    b32 = np.frombuffer(BASE32.encode("ascii"), dtype=np.uint8)
    char_mat = b32[codes.astype(np.intp)]  # (precision, n) ascii codes
    out = char_mat.T.tobytes()
    res = np.empty(n, dtype=object)
    step = precision
    for i in range(n):
        res[i] = out[i * step : (i + 1) * step].decode("ascii") if ok[i] else None
    return res


def decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lat_lo, lat_hi, lon_lo, lon_hi) of the cell addressed by ``gh``."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        idx = _B32_INDEX[c]
        for shift in range(4, -1, -1):
            bit = (idx >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2.0
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2.0
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi


def decode(gh: str) -> tuple[float, float]:
    """Center (lat, lon) of the cell."""
    lat_lo, lat_hi, lon_lo, lon_hi = decode_bbox(gh)
    return (lat_lo + lat_hi) / 2.0, (lon_lo + lon_hi) / 2.0


def cell_size(gh: str) -> tuple[float, float]:
    """(lat_height, lon_width) of the cell in degrees."""
    lat_lo, lat_hi, lon_lo, lon_hi = decode_bbox(gh)
    return lat_hi - lat_lo, lon_hi - lon_lo


def neighbor(gh: str, dlat: int, dlon: int) -> str | None:
    """Geohash of the cell ``dlat`` cells north / ``dlon`` cells east.

    Longitude wraps at the antimeridian; stepping past a pole returns
    ``None`` (no such cell).
    """
    lat_lo, lat_hi, lon_lo, lon_hi = decode_bbox(gh)
    h = lat_hi - lat_lo
    w = lon_hi - lon_lo
    lat = (lat_lo + lat_hi) / 2.0 + dlat * h
    lon = (lon_lo + lon_hi) / 2.0 + dlon * w
    if lat >= 90.0 or lat <= -90.0:
        return None
    if lon >= 180.0:
        lon -= 360.0
    elif lon < -180.0:
        lon += 360.0
    return encode(lat, lon, len(gh))


def neighbors(gh: str) -> list[str]:
    """The up-to-8 cells surrounding ``gh`` (N, NE, E, SE, S, SW, W, NW).

    Mirrors ``GeoHash.getAdjacent()`` used at KNNQuery.java:86 and
    WithinQuery.java:93-97 of the reference.
    """
    out = []
    for dlat, dlon in (
        (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)
    ):
        nb = neighbor(gh, dlat, dlon)
        if nb is not None:
            out.append(nb)
    return out


def cell_corners(gh: str) -> list[tuple[float, float]]:
    """The 4 (lon, lat) corners of the cell's bbox.

    Mirrors ``WithinQuery.getCoords`` (WithinQuery.java:47-68).
    """
    lat_lo, lat_hi, lon_lo, lon_hi = decode_bbox(gh)
    return [
        (lon_lo, lat_lo),
        (lon_lo, lat_hi),
        (lon_hi, lat_hi),
        (lon_hi, lat_lo),
    ]
