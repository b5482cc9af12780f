"""G1++ — hexagonal cell index (H3-style), from scratch, exact cross-engine.

The north-star names an "H3/S2 index".  :mod:`s2` is the true S2 curve;
this module is the hexagonal half: a multi-resolution hex binning with the
operations H3 users actually run — encode, cell center, the 6-neighbor
ring, and (H3-faithfully *approximate*) parent containment.

Construction — Voronoi of two offset rectangular lattices
---------------------------------------------------------
A hexagonal lattice is the union of two rectangular lattices offset by
half a cell in both axes (the classic hexbin construction).  Lattice A
has centers ``(2*i*dx, 2*j*dy)`` and lattice B ``((2*i+1)*dx,
(2*j+1)*dy)`` in *doubled micro-degree* coordinates, with ``dy/dx ~
sqrt(3)`` so the Voronoi cells of the union are (near-)regular hexagons
in degree space.  A point is assigned to the nearer of its two candidate
centers by **integer** squared distance:

- coordinates are doubled micro-degrees (int64, non-negative),
- the per-lattice nearest center is a floor-division (exact: the double
  quotient's magnitude is < 1e10 with divisors <= 2e6, so floor(a/b) in
  IEEE double cannot misround — error < 1e-7 of an integer),
- residuals are |r| <= dx (dy), squares < 2^45 — int64 exact,
- ties go to lattice A in BOTH engines (integer compare, deterministic).

Everything is +,-,*,/,floor on bounded integers: bit-identical in Spark
(JVM codegen) and DuckDB (the oracle), no trig, no UDF, no Python in the
hot path.  Hierarchy is H3-style: hex grids do not nest, so ``parent`` =
re-encode of the child's center at the coarser resolution (approximate
containment — exactly H3's own contract).

The reference has no spatial index at all (SURVEY.md §2.4 GRAFT G1);
engine-new, same family as :mod:`cells` (Morton) and :mod:`s2`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# (dx, dy) per resolution, in micro-degrees; dy/dx ~ sqrt(3).  Hex width
# is 2*dx; res r+1 halves res r, so i/j indices stay inside the packing
# budget below at every resolution.
RES_TABLE: list[tuple[int, int]] = [
    (10_000_000, 17_320_508),
    (5_000_000, 8_660_254),
    (2_500_000, 4_330_127),
    (1_250_000, 2_165_064),
    (625_000, 1_082_532),
    (312_500, 541_266),
    (156_250, 270_633),
    (78_125, 135_316),
]
MAX_RES = len(RES_TABLE) - 1

# id layout (all fields non-negative, id < 2^38 — safely positive int64
# in both engines):  cell = ((j * 2^16 + i) * 2 + lattice) * 16 + res
_I_BITS = 16
_PACK_I = 1 << _I_BITS  # 65536


def _check_res(res: int) -> tuple[int, int]:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"hex res must be 0..{MAX_RES}, got {res}")
    return RES_TABLE[res]


# ---------------------------------------------------------------- Spark side
def _floor_div(a: Column, b: int) -> Column:
    # exact for 0 <= a < 2^40, b <= 2^22 (see module docstring)
    return F.floor(a / F.lit(b)).cast("long")


def _xy2(lon: Column, lat: Column) -> tuple[Column, Column]:
    """Doubled micro-degree integer coordinates (non-negative)."""
    x2 = F.round((lon + F.lit(180.0)) * F.lit(2_000_000.0)).cast("long")
    y2 = F.round((lat + F.lit(85.0)) * F.lit(2_000_000.0)).cast("long")
    return x2, y2


def hex_cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """Hex cell id for (lon, lat) degrees at ``res`` — pure column math."""
    dx, dy = _check_res(res)
    x2, y2 = _xy2(lon, lat)
    # lattice A: nearest even multiple of dx / dy
    ia = _floor_div(x2 + F.lit(dx), 2 * dx)
    ja = _floor_div(y2 + F.lit(dy), 2 * dy)
    # lattice B: the odd multiple whose interval contains the point
    ib = _floor_div(x2, 2 * dx)
    jb = _floor_div(y2, 2 * dy)
    ra_x = x2 - ia * F.lit(2 * dx)
    ra_y = y2 - ja * F.lit(2 * dy)
    rb_x = x2 - (ib * F.lit(2) + F.lit(1)) * F.lit(dx)
    rb_y = y2 - (jb * F.lit(2) + F.lit(1)) * F.lit(dy)
    d_a = ra_x * ra_x + ra_y * ra_y
    d_b = rb_x * rb_x + rb_y * rb_y
    use_a = d_a <= d_b
    i = F.when(use_a, ia).otherwise(ib)
    j = F.when(use_a, ja).otherwise(jb)
    lb = F.when(use_a, F.lit(0)).otherwise(F.lit(1))
    return (((j * F.lit(_PACK_I) + i) * F.lit(2) + lb) * F.lit(16)
            + F.lit(res)).alias("hex_cell")


def _unpack_expr(cell: Column) -> tuple[Column, Column, Column, Column]:
    res = cell % F.lit(16)
    rest = _floor_div(cell, 16)
    lb = rest % F.lit(2)
    rest = _floor_div(rest, 2)
    i = rest % F.lit(_PACK_I)
    j = _floor_div(rest, _PACK_I)
    return res, lb, i, j


def _center2_expr(cell: Column, dx: int, dy: int) -> tuple[Column, Column]:
    """Center in doubled micro-degrees (int columns); caller knows res."""
    _, lb, i, j = _unpack_expr(cell)
    return (i * F.lit(2) + lb) * F.lit(dx), (j * F.lit(2) + lb) * F.lit(dy)


def hex_center_expr(cell: Column, res: int) -> tuple[Column, Column]:
    """(center_lon, center_lat) degrees — one exact int->double divide."""
    dx, dy = _check_res(res)
    cx2, cy2 = _center2_expr(cell, dx, dy)
    lon = cx2.cast("double") / F.lit(2_000_000.0) - F.lit(180.0)
    lat = cy2.cast("double") / F.lit(2_000_000.0) - F.lit(85.0)
    return lon, lat


def hex_parent_expr(cell: Column, child_res: int, parent_res: int) -> Column:
    """H3-style approximate parent: re-encode the child's center."""
    if parent_res >= child_res:
        raise ValueError("parent_res must be coarser (smaller) than child_res")
    lon, lat = hex_center_expr(cell, child_res)
    return hex_cell_expr(lon, lat, parent_res)


def hex_neighbors_expr(cell: Column, res: int) -> Column:
    """Array of the 6 adjacent hex cell ids (pure column math).

    Lattice A's neighbors: (i±1, j) in A plus the 4 diagonal B cells
    (i-1..i, j-1..j); symmetric for B (shift +0..+1).  Edge cells near
    the domain boundary may reference out-of-domain ids — harmless for
    join/smoothing use (no data lands there).
    """
    _check_res(res)
    _, lb, i, j = _unpack_expr(cell)

    def pack(lbv: Column, iv: Column, jv: Column) -> Column:
        return (((jv * F.lit(_PACK_I) + iv) * F.lit(2) + lbv) * F.lit(16)
                + F.lit(res))

    other = F.lit(1) - lb
    # diagonal offsets: A (lb=0) uses i-1..i / j-1..j => offset = lb-1+{0,1}
    di0 = lb - F.lit(1)
    dj0 = lb - F.lit(1)
    return F.array(
        pack(lb, i - F.lit(1), j),
        pack(lb, i + F.lit(1), j),
        pack(other, i + di0, j + dj0),
        pack(other, i + di0 + F.lit(1), j + dj0),
        pack(other, i + di0, j + dj0 + F.lit(1)),
        pack(other, i + di0 + F.lit(1), j + dj0 + F.lit(1)),
    )


# ------------------------------------------------------------------ SQL twin
def _sql_floor_div(a: str, b: int) -> str:
    return f"CAST(FLOOR(({a}) / {b}) AS BIGINT)"


def hex_cell_sql(lon_sql: str, lat_sql: str, res: int) -> str:
    """The identical arithmetic as ANSI SQL (DuckDB oracle twin)."""
    dx, dy = _check_res(res)
    x2 = f"CAST(ROUND((({lon_sql}) + 180.0) * 2000000.0) AS BIGINT)"
    y2 = f"CAST(ROUND((({lat_sql}) + 85.0) * 2000000.0) AS BIGINT)"
    ia = _sql_floor_div(f"({x2}) + {dx}", 2 * dx)
    ja = _sql_floor_div(f"({y2}) + {dy}", 2 * dy)
    ib = _sql_floor_div(x2, 2 * dx)
    jb = _sql_floor_div(y2, 2 * dy)
    ra_x = f"(({x2}) - ({ia}) * {2 * dx})"
    ra_y = f"(({y2}) - ({ja}) * {2 * dy})"
    rb_x = f"(({x2}) - (({ib}) * 2 + 1) * {dx})"
    rb_y = f"(({y2}) - (({jb}) * 2 + 1) * {dy})"
    use_a = f"(({ra_x})*({ra_x}) + ({ra_y})*({ra_y})" \
            f" <= ({rb_x})*({rb_x}) + ({rb_y})*({rb_y}))"
    i = f"(CASE WHEN {use_a} THEN ({ia}) ELSE ({ib}) END)"
    j = f"(CASE WHEN {use_a} THEN ({ja}) ELSE ({jb}) END)"
    lb = f"(CASE WHEN {use_a} THEN 0 ELSE 1 END)"
    return f"((({j}) * {_PACK_I} + ({i})) * 2 + ({lb})) * 16 + {res}"


def hex_unpack_sql(cell: str) -> tuple[str, str, str]:
    rest = _sql_floor_div(cell, 16)
    lb = f"(({rest}) % 2)"
    rest2 = _sql_floor_div(rest, 2)
    i = f"(({rest2}) % {_PACK_I})"
    j = _sql_floor_div(rest2, _PACK_I)
    return lb, i, j


def hex_center_sql(cell: str, res: int) -> tuple[str, str]:
    dx, dy = _check_res(res)
    lb, i, j = hex_unpack_sql(cell)
    lon = f"(CAST((({i}) * 2 + ({lb})) * {dx} AS DOUBLE) / 2000000.0 - 180.0)"
    lat = f"(CAST((({j}) * 2 + ({lb})) * {dy} AS DOUBLE) / 2000000.0 - 85.0)"
    return lon, lat


def hex_parent_sql(cell: str, child_res: int, parent_res: int) -> str:
    lon, lat = hex_center_sql(cell, child_res)
    return hex_cell_sql(lon, lat, parent_res)


# -------------------------------------------------------------- numpy kernel
def encode_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized twin of :func:`hex_cell_expr` (tests / Arrow paths)."""
    dx, dy = _check_res(res)
    x2 = np.rint((np.asarray(lon, np.float64) + 180.0) * 2_000_000.0).astype(np.int64)
    y2 = np.rint((np.asarray(lat, np.float64) + 85.0) * 2_000_000.0).astype(np.int64)
    ia = (x2 + dx) // (2 * dx)
    ja = (y2 + dy) // (2 * dy)
    ib = x2 // (2 * dx)
    jb = y2 // (2 * dy)
    d_a = (x2 - ia * 2 * dx) ** 2 + (y2 - ja * 2 * dy) ** 2
    d_b = (x2 - (ib * 2 + 1) * dx) ** 2 + (y2 - (jb * 2 + 1) * dy) ** 2
    use_a = d_a <= d_b
    i = np.where(use_a, ia, ib)
    j = np.where(use_a, ja, jb)
    lb = np.where(use_a, 0, 1).astype(np.int64)
    return ((j * _PACK_I + i) * 2 + lb) * 16 + res


def unpack_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, np.int64)
    res = cell % 16
    rest = cell // 16
    lb = rest % 2
    rest //= 2
    return res, lb, rest % _PACK_I, rest // _PACK_I


def center_np(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    dx, dy = _check_res(res)
    _, lb, i, j = unpack_np(cell)
    lon = ((i * 2 + lb) * dx).astype(np.float64) / 2_000_000.0 - 180.0
    lat = ((j * 2 + lb) * dy).astype(np.float64) / 2_000_000.0 - 85.0
    return lon, lat


def neighbors_np(cell: np.ndarray, res: int) -> np.ndarray:
    """(n, 6) neighbor ids — twin of :func:`hex_neighbors_expr`."""
    _check_res(res)
    _, lb, i, j = unpack_np(np.asarray(cell, np.int64))
    other = 1 - lb
    d0 = lb - 1
    cols = []
    for lbv, iv, jv in [
        (lb, i - 1, j), (lb, i + 1, j),
        (other, i + d0, j + d0), (other, i + d0 + 1, j + d0),
        (other, i + d0, j + d0 + 1), (other, i + d0 + 1, j + d0 + 1),
    ]:
        cols.append(((jv * _PACK_I + iv) * 2 + lbv) * 16 + cell % 16)
    return np.stack(cols, axis=-1)
