"""Z-order (Morton) clustering for multi-dimensional data skipping.

The reference's output language is 1-D partition transforms
(bucket/truncate/day — src/iceberg_utils.py); a 1-D sort clusters one
column and destroys locality on every other. Z-ordering interleaves the
bits of several quantized columns so a range predicate on ANY of them
maps to contiguous z-ranges — parquet min/max footer stats then prune
files for multi-dimensional workloads, the same layout trick
Delta/Iceberg expose as OPTIMIZE ZORDER BY.

Everything here is pure Column bit arithmetic (whole-stage codegen, no
UDFs), and every formula has a string twin so the DuckDB oracle can
replay it bit-for-bit.

At 100 TB: zorder_write is one range-repartition shuffle on the z-value
(sampling-based balanced ranges) + an in-partition sort — the standard
sort-based rewrite cost, paid once at layout time; every subsequent scan
with selective predicates on the z-dimensions reads a fraction of files.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a value into an integer cell coordinate in [0, 2**bits)
    (floor-scaled, edge-clamped) — double IEEE arithmetic, bit-identical
    to quantize_sql."""
    n = 1 << bits
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(n - 1)
    )


def quantize_sql(expr: str, lo: float, hi: float, bits: int) -> str:
    n = 1 << bits
    return (
        f"LEAST(GREATEST(CAST(FLOOR((CAST({expr} AS DOUBLE) - {lo})"
        f" / {hi - lo} * {n}) AS BIGINT), 0), {n - 1})"
    )


def interleave2(x: Column, y: Column, bits: int) -> Column:
    """Morton z-value of two `bits`-bit cell coordinates: bit b of x goes
    to position 2b, bit b of y to 2b+1. Disjoint positions, so the OR is
    a plain sum — which keeps the SQL twin trivial."""
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return reduce(lambda a, c: a + c, terms)


def interleave2_sql(xe: str, ye: str, bits: int) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({xe} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ye} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def zvalue2(
    x: Column, xlo: float, xhi: float, y: Column, ylo: float, yhi: float, bits: int
) -> Column:
    return interleave2(
        quantize(x, xlo, xhi, bits), quantize(y, ylo, yhi, bits), bits
    )


def zorder_write(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int,
) -> None:
    """Rewrite a dataset clustered by z-value: range-repartition on z
    (balanced via Spark's range sampling) + sort within partitions, one
    output file per partition. Footer min/max stats on the original
    columns then become tight per file in every z-dimension."""
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(n_overlapping, n_total) parquet files whose [min, max] footer
    range for `col` intersects [lo, hi] — the file-skipping decision a
    scan makes, evaluated from the footers alone (local-FS analog of the
    cluster-side manifest/footers prune)."""
    import os

    import pyarrow.parquet as pq

    total = 0
    hit = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.read_metadata(os.path.join(root, f))
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            idx = names[col]
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    fmin = None
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            if fmin is None or (fmax >= lo and fmin <= hi):
                hit += 1
    return hit, total
