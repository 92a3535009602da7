"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for file/row-group skipping.

At 100 TB, sorting the fact table by ONE column gives parquet min/max
stats that prune scans on that column only; a predicate on any other
column reads every file. Z-ORDERING interleaves the bits of several
columns into one sort key, so files cover small HYPER-RECTANGLES of the
key space — min/max footer stats then prune on EVERY z-ordered column
(Delta Lake's `OPTIMIZE ZORDER BY`, here re-expressed as plain
DataFrame ops over plain parquet: normalize → interleave bits →
`repartitionByRange` + `sortWithinPartitions` → write).

What this buys, concretely (pinned in tests/test_zorder.py with a
pyarrow footer-stats audit): events laid out by time alone serve
``user_id = k`` probes from EVERY file; z-ordered by (ts, user_id) the
same probe overlaps a small fraction of files — and time-range queries
still prune well, because the curve preserves locality in both
dimensions. The skipping mechanism is the standard engine pushdown
(row-group stats), no custom reader needed.

Scale notes:
- the only shuffle is the `repartitionByRange` (a sample pass + one
  exchange) — identical cost to any global sort-write;
- normalization bounds come from a tiny min/max aggregate; at scale,
  reuse table statistics instead of the extra pass;
- bit budget: ``bits_per_col × n_cols ≤ 62`` (int64 sort key). 21 bits
  × 2 cols (default) ≈ 2M distinct cells per dimension — far finer
  than file granularity, so no precision is lost at any realistic
  file count;
- all arithmetic is exact int64 (`div`, `&`, `*` on bigints inside
  whole-stage codegen — no doubles, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue_expr", "zorder_write", "overlapping_fraction"]


def _normalize_expr(col: str, mn: int, mx: int, bits: int) -> str:
    """Min-max scale a long-castable column onto [0, 2^bits) — exact
    integer arithmetic; intermediates stay < 2^63 for any span < 2^41
    at the default 21 bits (cap `bits` for wider spans)."""
    span = mx - mn + 1
    return (
        f"(((CAST({col} AS BIGINT) - {mn}) * {(1 << bits) - 1}) div {span})"
    )


def zvalue_expr(norm_cols: list[str], bits: int) -> str:
    """Interleave the low ``bits`` bits of the (already-normalized,
    projected) columns into one Morton key: bit b of column c lands at
    position b·n + c. Pure shift/mask expression — whole-stage codegen,
    no UDF. Disjoint target bits ⇒ `+` is exact (no carries)."""
    n = len(norm_cols)
    if n * bits > 62:
        raise ValueError(f"bit budget exceeded: {n} cols × {bits} bits > 62")
    terms = []
    for c_idx, col in enumerate(norm_cols):
        for b in range(bits):
            # (col & 2^b) carries factor 2^b; shift by the remaining
            # (b·(n-1) + c_idx) to land at 2^(b·n + c_idx)
            terms.append(f"(({col} & {1 << b}) * {1 << (b * (n - 1) + c_idx)})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 21,
) -> None:
    """Write ``df`` as plain parquet z-ordered by ``cols`` (numeric /
    long-castable): normalize each column to [0, 2^bits) from its
    (tiny) min/max aggregate, interleave into the Morton key,
    range-partition into ``n_files`` contiguous curve segments, sort
    inside each. Readers need nothing special — parquet footer min/max
    stats do the skipping."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("long")).alias(f"mx_{c}") for c in cols],
    ).first()
    # an empty frame or an all-NULL z column yields None bounds, which
    # would interpolate into the normalize SQL as the literal `None`
    # and die with an opaque parse error — refuse clearly instead
    bad = [c for c in cols if bounds[f"mn_{c}"] is None or bounds[f"mx_{c}"] is None]
    if bad:
        raise ValueError(
            f"zorder_write: no non-NULL values to bound for column(s) "
            f"{bad} (empty input or all-NULL z column)"
        )
    staged = df
    norm_names = []
    for c in cols:
        name = f"_zn_{c}"
        staged = staged.withColumn(
            name,
            F.expr(_normalize_expr(c, bounds[f"mn_{c}"], bounds[f"mx_{c}"], bits)),
        )
        norm_names.append(name)
    (
        staged.withColumn("_z", F.expr(zvalue_expr(norm_names, bits)))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *norm_names)
        .write.mode("overwrite")
        .parquet(path)
    )


def overlapping_fraction(path: str, col: str, lo, hi) -> float:
    """Layout audit (not a query path): fraction of parquet files whose
    footer [min, max] for ``col`` overlaps [lo, hi] — exactly the files
    an engine's stats-based skipping must read. Uses pyarrow footers
    only; no data pages are touched."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        idx = None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            if idx is None:
                idx = next(
                    i
                    for i in range(row_group.num_columns)
                    if row_group.column(i).path_in_schema == col
                )
            st = row_group.column(idx).statistics
            if st is None or not st.has_min_max:
                fmin, fmax = None, None
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None:
            hit += 1  # no stats → engine must read it
        elif not (fmax < lo or fmin > hi):
            hit += 1
    return hit / len(files)
