"""GeoParquet sink + source — the lakehouse-native geometry table format
(OGC GeoParquet 1.0: plain parquet, geometry as WKB columns, a ``geo``
key in the file footer's key/value metadata describing encoding, CRS,
bbox and the primary column).

Spark's parquet writer cannot attach custom footer metadata, so the
sink is a DISTRIBUTED pyarrow writer: each partition serializes its own
``part-NNNNN.parquet`` with the ``geo`` footer via ``mapInPandas`` (the
executor-side write pattern — no driver collect, no single-writer
bottleneck; at 100 TB each task streams one file exactly like Spark's
own committer). The job's output is the MANIFEST (file, rows, bbox per
file), which doubles as the spatial file-skipping index — same role the
Iceberg layout's manifests play (``plans/iceberg_layout``).

Readers: any GeoParquet consumer (GeoPandas, DuckDB spatial, BigQuery).
:func:`read_geoparquet` reads the directory back with Spark (footer
metadata is advisory for Spark itself) and :func:`geo_metadata` returns
the parsed ``geo`` JSON from a file footer for verification.

Geometry bytes come from ``functions/wkb`` — canonical little-endian
WKB, byte-pinned by the ``wkb_point_hex`` oracle.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["write_geoparquet", "read_geoparquet", "geo_metadata"]

_VERSION = "1.0.0"


def _geo_meta(geom_col: str, gtypes: list, bbox: list) -> dict:
    return {
        "version": _VERSION,
        "primary_column": geom_col,
        "columns": {
            geom_col: {
                "encoding": "WKB",
                "geometry_types": sorted(gtypes),
                "crs": None,  # per spec: null = OGC:CRS84 (lon/lat)
                "bbox": bbox,
            }
        },
    }


def write_geoparquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geometry",
    lon_col: str = "_lon",
    lat_col: str = "_lat",
    geometry_types: tuple = ("Point",),
) -> DataFrame:
    """Write ``df`` (must carry ``geom_col`` as WKB binary plus helper
    ``lon_col``/``lat_col`` doubles for the bbox stats — dropped from
    the files) as a GeoParquet directory; returns the manifest
    ``(file, n_rows, min_lon, min_lat, max_lon, max_lat)``.

    Each partition writes one footer-stamped file executor-side; the
    manifest is the only data that crosses the shuffle (O(files) rows).
    """
    os.makedirs(path, exist_ok=True)
    data_cols = [c for c in df.columns if c not in (lon_col, lat_col)]
    gtypes = list(geometry_types)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tabs = [pa.Table.from_pandas(b, preserve_index=False)
                for b in batches if len(b)]
        if not tabs:
            return
        tab = pa.concat_tables(tabs)
        lo = tab.column(lon_col).to_numpy()
        la = tab.column(lat_col).to_numpy()
        bbox = [float(lo.min()), float(la.min()),
                float(lo.max()), float(la.max())]
        tab = tab.select(data_cols)
        meta = dict(tab.schema.metadata or {})
        meta[b"geo"] = json.dumps(
            _geo_meta(geom_col, gtypes, bbox)).encode()
        tab = tab.replace_schema_metadata(meta)
        fname = f"part-{pid:05d}.parquet"
        pq.write_table(tab, os.path.join(path, fname))
        yield pd.DataFrame(
            {"file": [fname], "n_rows": [len(tab)],
             "min_lon": [bbox[0]], "min_lat": [bbox[1]],
             "max_lon": [bbox[2]], "max_lat": [bbox[3]]})

    manifest = df.mapInPandas(
        write_part,
        "file string, n_rows long, min_lon double, min_lat double, "
        "max_lon double, max_lat double",
    ).localCheckpoint(eager=True)  # eager: the write IS the job
    return manifest


def read_geoparquet(spark, path: str) -> DataFrame:
    """Directory of GeoParquet files → DataFrame (geometry stays WKB
    binary; decode with ``functions/wkb.wkb_decode_udf`` as needed)."""
    return spark.read.parquet(path)


def geo_metadata(path_or_file: str) -> dict:
    """Parsed ``geo`` footer JSON of one file (or the first part file of
    a directory) — the verification hook for round trips and for
    foreign-reader compatibility checks."""
    import pyarrow.parquet as pq

    p = path_or_file
    if os.path.isdir(p):
        parts = sorted(x for x in os.listdir(p) if x.endswith(".parquet"))
        if not parts:
            raise FileNotFoundError(f"no parquet files under {p}")
        p = os.path.join(p, parts[0])
    meta = pq.read_schema(p).metadata or {}
    if b"geo" not in meta:
        raise ValueError(f"{p} carries no GeoParquet 'geo' footer")
    return json.loads(meta[b"geo"])
