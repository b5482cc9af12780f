"""G1 — hierarchical spatial cell index (H3/S2-style), from scratch.

A Z-order (Morton) curve over an equirectangular grid: at resolution ``r``
the world is a 2^r x 2^r grid; a cell id interleaves the bits of the x/y
grid coordinates so that (a) ``parent = cell >> 2`` gives the enclosing
cell at r-1 (hierarchical containment like H3/S2 parent ops) and (b) ids
that are numeric neighbors are usually spatial neighbors (locality for
range pruning / partition pruning).

Three synchronized implementations of the SAME arithmetic:

- :func:`cell_expr` — Spark Column expressions (JVM-side, codegen'd; stays
  inside WholeStageCodegen — no Python in the hot path).
- :func:`cell_sql` — the identical expression as an ANSI-SQL string DuckDB
  can run, so every cell-indexed query has a value-exact oracle.
- :func:`encode_np` / :func:`decode_np` / :func:`disk_np` — vectorized
  numpy kernels for the pandas-UDF paths (kNN ring expansion needs
  de-interleave, which is branch-heavy as a column expression).

The reference has no spatial index at all (SURVEY.md §2.4 GRAFT G1); this
is engine-new. Resolutions up to 26 keep ids < 2^53 — safely positive in
signed 64-bit AND exactly representable even if a foreign engine routes
the id through a double (the DuckDB decimal→double trap, CLAUDE.md).
Raised from 15 in round 4: deep-zoom tile renders (MVT/heatmap at
city zoom) need res > 15 for tile-level parallelism at scale; the extra
(16, …) spread stage is bit-for-bit identity for sub-2^16 axes, so every
existing res ≤ 15 id — and every committed oracle — is unchanged.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_RES = 26

# magic-number bit spreading: place the low 32 bits of x at even positions
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


# ---------------------------------------------------------------- Spark side
def _axis_expr(coord: Column, lo: float, span: float, res: int) -> Column:
    """Grid coordinate on one axis: floor((c - lo) / span * 2^res), clamped."""
    n = 1 << res
    raw = F.floor((coord - F.lit(lo)) / F.lit(span) * F.lit(n)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))


def _spread_expr(x: Column) -> Column:
    for shift, mask in _SPREAD:
        x = F.shiftleft(x, shift).bitwiseOR(x).bitwiseAND(F.lit(mask))
    return x


def lon_ix(lon: Column, res: int) -> Column:
    return _axis_expr(lon, -180.0, 360.0, res)


def lat_iy(lat: Column, res: int) -> Column:
    return _axis_expr(lat, -90.0, 180.0, res)


def cell_from_ixiy(ix: Column, iy: Column) -> Column:
    return _spread_expr(ix).bitwiseOR(F.shiftleft(_spread_expr(iy), 1))


def cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """Morton cell id at resolution ``res`` — pure built-in expressions."""
    if not 0 < res <= MAX_RES:
        raise ValueError(f"res must be in 1..{MAX_RES}")
    return cell_from_ixiy(lon_ix(lon, res), lat_iy(lat, res))


def parent_expr(cell: Column, levels: int = 1) -> Column:
    """Enclosing cell ``levels`` resolutions up: drop 2 bits per level."""
    return F.shiftright(cell, 2 * levels)


def quadkey_expr(cell: Column, res: int) -> Column:
    """Bing-Maps quadkey string of a Morton cell: the base-4 digits of
    the id, left-padded to ``res`` chars. Works because this module
    interleaves x at even and y at odd bit positions — exactly Bing's
    digit = x_bit + 2·y_bit — so the quadkey's defining property holds:
    a cell's PREFIX is its ancestor's quadkey (string ops = tree ops,
    the interop key format tile servers and XYZ caches speak).
    Pure built-ins (``conv`` + ``lpad``), WholeStageCodegen."""
    if not 0 < res <= MAX_RES:
        raise ValueError(f"res must be in 1..{MAX_RES}")
    return F.lpad(F.conv(cell.cast("string"), 10, 4), res, "0")


def quadkey_to_cell_expr(qk: Column) -> Column:
    """Inverse: quadkey string → Morton cell id (at the key's length)."""
    return F.conv(qk, 4, 10).cast("long")


def quadkey_sql(cell: str, res: int) -> str:
    """SQL twin of :func:`quadkey_expr` — per-digit generated concat
    (no base-conversion builtin assumed; fully parenthesized integer
    div/mod per the repo's determinism rules)."""
    digits = [f"CAST((({cell}) // {4 ** (res - 1 - i)}) % 4 AS VARCHAR)"
              for i in range(res)]
    return "(" + " || ".join(digits) + ")"


# ---------------------------------------------------------------- SQL twin
def _axis_sql(coord: str, lo: float, span: float, res: int) -> str:
    n = 1 << res
    raw = f"CAST(floor((({coord}) - ({lo})) / {span} * {n}) AS BIGINT)"
    return f"least(greatest({raw}, 0), {n - 1})"


def _spread_sql(x: str) -> str:
    # fully parenthesized: shift/or/and precedence differs across dialects
    for shift, mask in _SPREAD:
        x = f"((((({x}) << {shift}) | ({x}))) & {mask})"
    return x


def cell_sql(lon: str, lat: str, res: int) -> str:
    """The same Morton arithmetic as an ANSI-SQL string (DuckDB oracle)."""
    ix = _axis_sql(lon, -180.0, 360.0, res)
    iy = _axis_sql(lat, -90.0, 180.0, res)
    return f"({_spread_sql(ix)} | ({_spread_sql(iy)} << 1))"


def lon_ix_sql(lon: str, res: int) -> str:
    """SQL twin of :func:`lon_ix` (grid x coordinate)."""
    return _axis_sql(lon, -180.0, 360.0, res)


def lat_iy_sql(lat: str, res: int) -> str:
    """SQL twin of :func:`lat_iy` (grid y coordinate)."""
    return _axis_sql(lat, -90.0, 180.0, res)


def cell_from_ixiy_sql(ix: str, iy: str) -> str:
    """SQL twin of :func:`cell_from_ixiy` (Morton id from grid coords)."""
    return f"({_spread_sql(f'({ix})')} | ({_spread_sql(f'({iy})')} << 1))"


# ---------------------------------------------------------------- numpy side
def _spread_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    for shift, mask in _SPREAD:
        x = (x << shift | x) & mask
    return x


def _compact_np(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread_np: gather even-position bits back together."""
    x = x & 0x5555555555555555
    x = (x | (x >> 1)) & 0x3333333333333333
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFF
    x = (x | (x >> 16)) & 0x00000000FFFFFFFF
    return x


def encode_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    n = 1 << res
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return _spread_np(ix) | (_spread_np(iy) << 1)


def decode_np(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → (ix, iy) grid coordinates."""
    return _compact_np(cell), _compact_np(cell >> 1)


def cell_center_np(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << res
    ix, iy = decode_np(np.asarray(cell, dtype=np.int64), res)
    lon = (ix + 0.5) / n * 360.0 - 180.0
    lat = (iy + 0.5) / n * 180.0 - 90.0
    return lon, lat


def disk_np(cell: np.ndarray, res: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)^2 disk), per input
    cell. Returns shape (len(cell), <= (2k+1)^2) with -1 padding where the
    disk falls off the grid edge. Used by kNN ring expansion (G3)."""
    n = 1 << res
    ix, iy = decode_np(np.asarray(cell, dtype=np.int64), res)
    offs = np.arange(-k, k + 1)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    nx = ix[:, None] + ox.ravel()[None, :]
    ny = iy[:, None] + oy.ravel()[None, :]
    valid = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
    out = np.where(valid, _spread_np(np.clip(nx, 0, n - 1)) | (_spread_np(np.clip(ny, 0, n - 1)) << 1), -1)
    return out


# ------------------------------------------------------- cell-set algebra
def compact_cells(cells, res: int, min_res: int = 0,
                  cell_col: str = "cell"):
    """H3-style ``compact``: replace every complete sibling quad with
    its parent, recursively, yielding the minimal multi-resolution
    covering of the input cell set. Input: cells at resolution ``res``
    (deduped internally). Output: ``(cell, res)`` rows.

    Scale shape: one groupBy + equi-join per level, each on the CURRENT
    level's cells only (shrinking 4x per promoted level); the driver
    loops over at most ``res - min_res`` levels and never sees row
    data. Engine-new (SURVEY §2.4 has no cell-set ops); semantics match
    the public H3 compactCells contract on a quadtree."""
    from functools import reduce

    from pyspark.sql import functions as F

    cur = cells.select(F.col(cell_col).alias("cell")).distinct()
    levels = []
    for lvl in range(res, min_res, -1):
        with_p = cur.withColumn("pcell", F.shiftright("cell", 2))
        quads = with_p.groupBy("pcell").agg(F.count("*").alias("k"))
        joined = with_p.join(quads, "pcell")
        levels.append(
            joined.where(F.col("k") < 4)
            .select("cell", F.lit(lvl).alias("res")))
        cur = (joined.where(F.col("k") == 4)
               .select(F.col("pcell").alias("cell")).distinct())
    levels.append(cur.select("cell", F.lit(min_res).alias("res")))
    return reduce(lambda a, b: a.unionByName(b), levels)


def uncompact_cells(compacted, target_res: int,
                    cell_col: str = "cell", res_col: str = "res"):
    """Inverse of :func:`compact_cells`: expand every (cell, res) row to
    its 4^(target_res - res) descendants at ``target_res``. The child id
    range is contiguous under Morton order (base = cell * 4^k), so the
    fan-out is one broadcast join against a 16-row multiplier table plus
    a JVM ``sequence`` explode — no Python, no skew."""
    from pyspark.sql import functions as F

    spark = compacted.sparkSession
    mult = spark.createDataFrame(
        [(r, 1 << (2 * (target_res - r))) for r in range(target_res + 1)],
        f"{res_col} int, _m long")
    return (
        compacted.withColumn(res_col, F.col(res_col).cast("int"))
        .join(F.broadcast(mult), res_col)
        .select(
            F.explode(F.sequence(
                F.col(cell_col) * F.col("_m"),
                F.col(cell_col) * F.col("_m") + F.col("_m") - 1,
            )).alias(cell_col))
    )


def compact_sql(cells_cte: str, res: int, min_res: int = 0) -> str:
    """SQL twin of :func:`compact_cells` as unrolled per-level CTEs over
    a one-column CTE ``(cell)``; ends in CTE ``compacted(cell, res)``."""
    parts = [f"l{res} AS (SELECT DISTINCT cell FROM {cells_cte})"]
    outs = []
    for lvl in range(res, min_res, -1):
        parts.append(
            f"q{lvl} AS (SELECT (cell >> 2) AS pcell, COUNT(*) AS k "
            f"FROM l{lvl} GROUP BY pcell)")
        outs.append(
            f"SELECT c.cell AS cell, {lvl} AS res FROM l{lvl} c "
            f"JOIN q{lvl} q ON (q.pcell = (c.cell >> 2)) WHERE (q.k < 4)")
        parts.append(
            f"l{lvl - 1} AS (SELECT pcell AS cell FROM q{lvl} "
            f"WHERE (k = 4))")
    outs.append(f"SELECT cell, {min_res} AS res FROM l{min_res}")
    body = "\nUNION ALL\n".join(outs)
    return ",\n".join(parts) + f",\ncompacted AS (\n{body}\n)"
