"""Z-order (Morton) multi-column clustering — the table-format layout
answer to "my queries filter on TWO columns and a sort can only serve
one". A linear sort on ts gives each file a tight ts envelope but lets every
file span the whole user_id range: a (user_id, ts) box prunes on ts only.
Interleaving the bits of both columns (after scaling each to 8 bits over
its min/max span) makes range-partitioning on the Z value tile the 2-D
space, so every file's envelope is tight on BOTH columns and a 2-D box
consults down to the tiles it overlaps — the Delta/Iceberg OPTIMIZE
ZORDER BY layout, built from plain DataFrame ops (no UDF: the bit
interleave is 16 shift-and-mask expressions inside whole-stage codegen).

At 100 TB this is a one-time (or compaction-cadence) rewrite clustering
each partition's files; the skipping index consumes it unchanged — same
min/max manifests, same consult — the LAYOUT is what improves, which is
exactly how lakehouse Z-ordering ships in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits per dimension (2 dims x 8 bits = 16-bit Z values: 256x256 tiles —
#: plenty of resolution for hundreds-to-thousands of files per partition)
Z_BITS = 8


def _scale_to_bits(c: F.Column, lo: int, hi: int, bits: int = Z_BITS) -> F.Column:
    """Scale a long column with known [lo, hi] bounds to [0, 2^bits):
    exact long arithmetic (no double rounding at the boundaries), clamped
    so hi itself lands in the top bucket."""
    span = max(int(hi) - int(lo) + 1, 1)
    # `div` is Spark's integral (long) division — `/` would round-trip
    # through double and values near a bucket boundary could round into
    # the adjacent bucket once (c - lo) * 2^bits exceeds 2^53
    return F.least(
        F.lit((1 << bits) - 1),
        F.call_function(
            "div",
            (c.cast("long") - F.lit(int(lo))) * F.lit(1 << bits),
            F.lit(span),
        ),
    )


def zorder_value(a: F.Column, b: F.Column, bits: int = Z_BITS) -> F.Column:
    """Interleave two ``bits``-wide non-negative ints into their Morton
    code (a's bit i at position 2i+1, b's at 2i). Disjoint bit positions
    make the OR a plain sum — a codegen-friendly expression tree."""
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bounds: tuple[int, int, int, int],
    n_files: int,
) -> DataFrame:
    """``df`` range-partitioned into ``n_files`` splits by the Morton
    code of (col_a, col_b) — both must already be LONG-valued columns
    (cast timestamps to epoch micros first). ``bounds`` =
    (a_lo, a_hi, b_lo, b_hi), computed once by the caller (one tiny agg)
    so the scaling is a pure expression. Rows inside each split are
    sorted by the Z value too, tightening page-level stats the same way
    the file envelopes tighten."""
    a_lo, a_hi, b_lo, b_hi = bounds
    z = zorder_value(
        _scale_to_bits(F.col(col_a), a_lo, a_hi),
        _scale_to_bits(F.col(col_b), b_lo, b_hi),
    )
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
