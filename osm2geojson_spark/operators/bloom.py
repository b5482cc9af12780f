"""Bloom-filter join pruning + count-min sketch — the two classic
fixed-size hash summaries a distributed engine uses to avoid moving
data (Spark's own runtime row-filter pushdown and every streaming
top-k pipeline).

Both are VALUE-EXACT here (unlike HLL): every bit and every counter is
a deterministic function of ``F.xxhash64`` (seeded), which
``pyref.xxh64`` reproduces bit-for-bit (pinned in
tests/test_hash_parity.py), so the oracle gate can check the filter
words, the hit decisions (including false positives!), and the sketch
counters as plain integers.

Scale shape:
- ``build_bloom``: one pass over the key side — explode k positions,
  OR-fold bits per 64-bit word map-side, collect the BOUNDED word
  array (m/64 rows — metadata, not data).
- ``bloom_probe_expr``: pure codegen (literal word array +
  shift/mask), zero Python, zero shuffle — the probe side is never
  joined, which is the whole point: at 100 TB you drop ~all
  non-matching rows before the real join's shuffle.
- ``cms_counters``: one pass, d·w bounded output; estimates are
  ``min_j counter[j][h_j(x)]`` — never under the true count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom", "bloom_probe_expr", "cms_counters",
           "cms_estimate_expr"]


def _positions(key: Column, k_hashes: int, m_bits: int, seed: int):
    return [F.pmod(F.xxhash64(key, F.lit(seed + j)), F.lit(m_bits))
            for j in range(k_hashes)]


def build_bloom(keys: DataFrame, key_col: str, m_bits: int = 8192,
                k_hashes: int = 5, seed: int = 7) -> list[int]:
    """One-pass Bloom build over the (small) key side → python list of
    m_bits/64 signed 64-bit words. The collect is bounded by m_bits,
    independent of the key count."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(
        F.col(key_col), k_hashes, m_bits, seed))).alias("p")
    bits = (keys.select(pos)
            .select(F.expr("p div 64").alias("w"),
                    # shiftleft() in the python API takes an int, not a
                    # Column — call the SQL function directly
                    F.expr("shiftleft(CAST(1 AS BIGINT),"
                           " CAST(pmod(p, 64) AS INT))").alias("bit"))
            .groupBy("w").agg(F.bit_or("bit").alias("word"))
            .collect())
    words = [0] * (m_bits // 64)
    for r in bits:
        words[r["w"]] = r["word"]
    return words


def bloom_probe_expr(key: Column, words: list[int], k_hashes: int = 5,
                     seed: int = 7) -> Column:
    """Membership test against a built filter — pure codegen (array
    literal + shift/mask), no join, no Python. 1 = maybe-member
    (false positives possible), 0 = definitely absent."""
    m_bits = 64 * len(words)
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    tests = []
    for p in _positions(key, k_hashes, m_bits, seed):
        word = F.element_at(arr, (p.cast("long") / F.lit(64))
                            .cast("int") + 1)
        shifted = F.call_function(
            "shiftrightunsigned", word, F.pmod(p, F.lit(64)).cast("int"))
        tests.append(shifted.bitwiseAND(F.lit(1).cast("long")) == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return F.when(out, F.lit(1)).otherwise(F.lit(0))


def cms_counters(df: DataFrame, key_col: str, w: int = 256,
                 d_rows: int = 4, seed: int = 11) -> DataFrame:
    """Count-min sketch counters: one pass, output bounded by d·w.
    Returns (j, h, cnt) — row j's bucket h holds the count of keys
    with pmod(xxhash64(key, seed+j), w) == h."""
    rows = (df.select(F.col(key_col).alias("k"))
            .select(F.posexplode(F.array(*[
                F.pmod(F.xxhash64(F.col("k"), F.lit(seed + j)), F.lit(w))
                for j in range(d_rows)])).alias("j", "h")))
    return rows.groupBy("j", "h").agg(F.count("*").alias("cnt"))


def cms_estimate_expr(key: Column, counters: dict, w: int = 256,
                      d_rows: int = 4, seed: int = 11) -> Column:
    """Point estimate min_j counter[j][h_j(key)] from a collected
    {(j, h): cnt} dict (bounded d·w driver rows) — pure codegen lookup
    via per-row literal arrays."""
    arrs = []
    for j in range(d_rows):
        row = [counters.get((j, h), 0) for h in range(w)]
        arrs.append(F.array(*[F.lit(c).cast("long") for c in row]))
    ests = [F.element_at(
        arrs[j],
        F.pmod(F.xxhash64(key, F.lit(seed + j)), F.lit(w)).cast("int") + 1)
        for j in range(d_rows)]
    return F.least(*ests)
