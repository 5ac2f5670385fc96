"""GeoJSON export of query results.

The reference renders its query outputs as a GeoJSON FeatureCollection
consumed by the Leaflet figures page (figures/index.htm loads
``wifi_4326.geojson``; figures/js/figures.js plots the features).  The
viewer itself is out of scope (SURVEY.md §7 non-goals), but the export
format is part of the result surface a reference user has today, so
the engine provides the same shape for its own result DataFrames.

Driver-side by design: GeoJSON is a human/viewer format for QUERY
RESULTS (within/knn/top-x outputs — bounded rowsets), not a storage
format; bulk geo data stays in geohash-partitioned parquet
(sources/ingest.py).  For a large export, write per-partition JSONL of
the ``feature`` dicts instead.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def results_to_geojson(
    df: DataFrame,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_rows: int = 100_000,
) -> str:
    """Render a result DataFrame as a GeoJSON FeatureCollection string.

    Every column other than the coordinate pair becomes a feature
    property (the id column included, mirroring the reference's
    per-point popups).  Rows are ordered by ``id_col`` so the output
    is deterministic.  Raises if the result exceeds ``max_rows`` —
    this is a driver-side export for bounded query results, and the
    guard turns an accidental full-table export into a loud error
    instead of an OOM.
    """
    rows = df.orderBy(id_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; results_to_geojson is "
            "for bounded query results — write JSONL for bulk exports"
        )
    return rows_to_geojson(rows, id_col=id_col, lon_col=lon_col,
                           lat_col=lat_col, max_rows=max_rows)


def rows_to_geojson(
    rows,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_rows: int = 100_000,
) -> str:
    """Build the FeatureCollection string from ALREADY-COLLECTED rows —
    callers that also print the rows (cli.py cmd_within) collect once
    and share, instead of re-running the query for each consumer
    (ADVICE r3).  Keeps the same ``max_rows`` loud-error contract as
    :func:`results_to_geojson` so the shared-rows path can't silently
    serialize an unbounded export (r4 review finding)."""
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds max_rows={max_rows}; rows_to_geojson is "
            "for bounded query results — write JSONL for bulk exports"
        )
    features = []
    for r in rows:
        d = r.asDict()
        lon, lat = d.pop(lon_col), d.pop(lat_col)
        if lon is None or lat is None:
            # a NULL coordinate would otherwise surface as an opaque
            # TypeError from float(); name the offending row instead
            raise ValueError(
                f"row {d.get(id_col)!r}: NULL {lon_col}/{lat_col} — "
                "GeoJSON point features need both coordinates"
            )
        lon, lat = float(lon), float(lat)
        features.append(
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [lon, lat]},
                "properties": d,
            }
        )
    return json.dumps(
        {"type": "FeatureCollection", "features": features},
        separators=(",", ":"),
        default=str,
    )
