"""Heatmap tile rendering — points in, REAL PNG raster tiles out.

Engine-new: the inverse of `spatial/zonal.py` (raster→vector); this is
vector→raster, the op behind every density-map basemap layer. Fuses the
two graft axes in one operator: geospatial binning feeds the image
codec, and the output column is decodable PNG bytes
(`synth/images.decode_png` round-trips it).

Scale shape (10^12 pings → a few thousand tiles):

- pings collapse map-side to (tile, pixel, count) partials — the FIRST
  shuffle moves at most ``tiles x tile_px^2`` rows, never raw pings;
- rendering shuffles those sparse pixel counts once more, keyed by
  tile, into an Arrow ``applyInPandas`` whose state per group is one
  ``tile_px x tile_px`` array — bounded regardless of input size;
- intensity is integer-exact ``(n * 255) // max_n`` per tile (max-
  normalized), so the whole pixel surface is reproducible bit-for-bit
  by the Spark-free reference in ``pyref.ref_heatmap`` — the PNG bytes
  themselves are oracle-checked, not just the counts.

The tile id is the Morton cell of the pixel grid coordinates shifted
down by log2(tile_px) — consistent with `functions/cells` by
construction (power-of-two rescaling of the same floor grid).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.functions import cells as C


def heatmap_tiles(
    points: DataFrame,
    res: int = 3,
    tile_px: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Render one grayscale PNG per occupied Morton tile at resolution
    ``res``: pixel brightness = per-pixel ping count, max-normalized
    within the tile. Returns ``(tile, n_pts, png)``."""
    shift = (tile_px - 1).bit_length()
    if 1 << shift != tile_px:
        raise ValueError("tile_px must be a power of two")
    pix_res = res + shift
    if pix_res > C.MAX_RES:
        raise ValueError(f"res + log2(tile_px) must be <= {C.MAX_RES}")

    ix = C.lon_ix(F.col(lon_col), pix_res)
    iy = C.lat_iy(F.col(lat_col), pix_res)
    binned = points.select(
        C.cell_from_ixiy(
            F.shiftright(ix, shift), F.shiftright(iy, shift)).alias("tile"),
        ix.bitwiseAND(F.lit(tile_px - 1)).alias("pxl"),
        iy.bitwiseAND(F.lit(tile_px - 1)).alias("pyl"),
    )
    counts = binned.groupBy("tile", "pxl", "pyl").agg(
        F.count("*").alias("n"))

    from osm2geojson_spark.synth.images import encode_png

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iloc[0])
        dense = np.zeros((tile_px, tile_px), dtype=np.int64)
        dense[pdf["pyl"].to_numpy(), pdf["pxl"].to_numpy()] = \
            pdf["n"].to_numpy()
        max_n = int(dense.max())
        gray = ((dense * 255) // max_n).astype(np.uint8)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        return pd.DataFrame(
            [(tile, int(pdf["n"].sum()), encode_png(rgb))],
            columns=["tile", "n_pts", "png"])

    return counts.groupBy("tile").applyInPandas(
        render, schema="tile long, n_pts long, png binary")


def overview_tiles(tiles: DataFrame, tile_px: int = 64) -> DataFrame:
    """Pyramid overview level from RENDERED tiles: each res-r PNG tile
    is decoded, 2×2 block-averaged (integer ``//4`` — deterministic) to
    half size, and placed into its parent's quadrant; missing children
    stay black. → ``(tile, n_children, n_pts, png)`` at res r-1.

    This is the image-space converse of ``tiles.tile_pyramid`` (which
    rolls up COUNTS): basemap serving pipelines build overview zooms
    from already-rendered tiles when the raw points are gone. Quadrant
    = the child cell's low Morton bits (bit0=x, bit1=y — consistent
    with ``cells.cell_from_ixiy`` by construction), parent = cell>>2.
    One groupBy(parent) shuffle of tile blobs; Arrow applyInPandas
    assembles + re-encodes per parent.
    """
    from osm2geojson_spark.synth.images import decode_png, encode_png

    half = tile_px // 2
    children = tiles.select(
        F.shiftright(F.col("tile"), 2).alias("parent"),
        F.col("tile").bitwiseAND(F.lit(1)).alias("qx"),
        F.shiftright(F.col("tile"), 1).bitwiseAND(F.lit(1)).alias("qy"),
        "n_pts", "png",
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        parent = int(pdf["parent"].iloc[0])
        canvas = np.zeros((tile_px, tile_px, 3), dtype=np.uint8)
        for t in pdf.itertuples(index=False):
            px = decode_png(bytes(t.png)).astype(np.uint32)
            # integer 2x2 mean, exact: floor(sum/4)
            ds = ((px[0::2, 0::2] + px[1::2, 0::2]
                   + px[0::2, 1::2] + px[1::2, 1::2]) // 4).astype(np.uint8)
            y0, x0 = int(t.qy) * half, int(t.qx) * half
            canvas[y0:y0 + half, x0:x0 + half] = ds
        return pd.DataFrame(
            [(parent, len(pdf), int(pdf["n_pts"].sum()),
              encode_png(canvas))],
            columns=["tile", "n_children", "n_pts", "png"])

    return children.groupBy("parent").applyInPandas(
        assemble, schema="tile long, n_children int, n_pts long, png binary")
