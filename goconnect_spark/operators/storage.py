"""Storage-layout maintenance: the compaction pass every long-lived
100 TB table needs.

Streaming ingests (and over-parallel batch writes) leave thousands of
small parquet files; scans then pay per-file open/footer costs and
schedulers pay per-split overhead. `compact_parquet` rewrites a
directory into files sized for the scanner (default 128 MB, matching
spark.sql.files.maxPartitionBytes in session.py), optionally
range-sorting rows so parquet min/max zone maps prune selective
predicates after the rewrite.

Sizing uses the ACTUAL compressed byte size of the input files (not a
row-count heuristic): compression ratios vary 10x across columns and
corpora, and the existing files already reflect the true ratio.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _input_bytes(df: DataFrame) -> Optional[int]:
    """Total compressed bytes of the scan's input files, when they are
    locally stat-able (file: URIs). Returns None for remote schemes —
    callers fall back to an explicit n_files."""
    total = 0
    for uri in df.inputFiles():
        p = urlparse(uri)
        if p.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(p.path)
        except OSError:
            return None
    return total


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: Optional[Sequence[str]] = None,
    n_files: Optional[int] = None,
) -> int:
    """Rewrite `in_dir`'s parquet into ~target-sized files at
    `out_dir`; returns the file count written.

    With `sort_by`, rows are range-partitioned and sorted within each
    file on those columns, so post-compaction scans with predicates on
    them prune whole files via parquet min/max statistics — the poor
    man's clustering index, and the right default for an event table
    keyed by time. Without it, a plain repartition balances bytes.

    `repartitionByRange` samples the sort key to build balanced range
    bounds — one extra pass over the data, the standard price of a
    sorted rewrite.

    `out_dir` must differ from `in_dir`: the overwrite mode deletes
    the target before the (lazy) read of the same path executes, so an
    in-place call would destroy the source. Compact to a sibling dir
    and swap atomically at the catalog/metastore layer.
    """
    if os.path.abspath(out_dir) == os.path.abspath(in_dir):
        raise ValueError(
            "compact_parquet: out_dir must differ from in_dir — "
            "mode('overwrite') deletes the target before the lazy read "
            "of the same path runs, destroying the source data. "
            "Write to a sibling directory and swap."
        )
    df = spark.read.parquet(in_dir)
    if n_files is None:
        total = _input_bytes(df)
        if total is None:
            raise ValueError(
                "input bytes not stat-able for remote storage; pass n_files="
            )
        n_files = max(1, math.ceil(total / target_file_bytes))
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_dir)
    written = spark.read.parquet(out_dir)
    return len([u for u in written.inputFiles()])


def merge_aggregate(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Incremental maintenance of a keyed sum/count aggregate: merge a
    small delta batch's PARTIAL aggregate into the existing
    materialized aggregate instead of re-scanning the full fact table
    — the pattern that turns an O(100 TB) nightly rebuild into an
    O(delta) upsert. Works for any commutative-monoid measures (sums,
    counts; min/max merge the same way); averages must be stored as
    (sum, count) pairs and divided at read time.

    Both inputs must already be aggregates at the same key grain; the
    merge is a full-outer union-style groupBy so keys present in only
    one side pass through. One shuffle on the keys, delta-sized when
    the planner broadcasts the delta side.
    """
    import pyspark.sql.functions as F

    keys = list(keys)
    cols = list(sum_cols)
    u = base.select(*keys, *cols).unionByName(delta.select(*keys, *cols))
    return u.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in cols]
    )


def zorder_sql(exprs: Sequence[str], bits: int = 8) -> str:
    """Shared-dialect SQL for the Morton (Z-order) key of the given
    already-scaled integer expressions: bit i of expression j lands at
    interleaved position i*len(exprs)+j. Inputs must be non-negative
    BIGINTs < 2**bits; the mask enforces the width so a caller bug
    wraps instead of scrambling high bits.

    Emitted as plain `>> << &` arithmetic so the IDENTICAL string runs
    in Spark SQL and DuckDB — the query catalog's oracle pairs share
    it, which is the cross-engine proof that the interleave is exact.
    The expression is a constant-folded sum of bits*len(exprs) terms:
    whole-stage codegen compiles it to straight-line long arithmetic,
    no UDF.
    """
    d = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        masked = f"(CAST(({e}) AS BIGINT) & {(1 << bits) - 1})"
        for i in range(bits):
            terms.append(f"((({masked} >> {i}) & 1) << {i * d + j})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    n_files: Optional[int] = None,
) -> DataFrame:
    """Multi-dimensionally cluster `df` by the Z-order of `cols` —
    the OPTIMIZE ZORDER of lakehouse table formats, built from Spark
    primitives: one aggregation computes each column's min/max (a
    1-row broadcast), each value is scaled to a 2**bits-cell grid
    with exact integer arithmetic, the Morton key interleaves the
    grid coordinates, and a range repartition + in-partition sort on
    that key places rows so every output file covers a small
    HYPER-RECTANGLE of the key space instead of a thin full-width
    slab. Parquet min/max footer stats on ALL of `cols` then prune
    multi-dimensional predicates — a sort on one column can only ever
    prune that column.

    Scale: the bounds pass is a map-side min/max aggregate; the range
    partitioner samples the z key (the standard sorted-write price);
    nothing is driver-sized. Skewed dimensions degrade the grid (many
    rows per cell) but never correctness; pass a larger `bits` for
    high-cardinality keys.
    """
    import pyspark.sql.functions as F

    cols = list(cols)
    bounds = df.agg(
        *[F.min(c).cast("bigint").alias(f"__min_{c}") for c in cols],
        *[F.max(c).cast("bigint").alias(f"__max_{c}") for c in cols],
    )
    scaled_exprs = [
        f"(CAST({c} AS BIGINT) - __min_{c}) * {1 << bits}"
        f" DIV (__max_{c} - __min_{c} + 1)"
        for c in cols
    ]
    with_z = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", F.expr(zorder_sql(scaled_exprs, bits)))
        .drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
    if n_files:
        ranged = with_z.repartitionByRange(n_files, "__z")
    else:
        ranged = with_z.repartitionByRange("__z")
    return ranged.sortWithinPartitions("__z").drop("__z")


def merge_join_view(
    base_a: DataFrame,
    base_b: DataFrame,
    delta_a: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incremental maintenance of an inner-join view: the NEW rows the
    view gains when append-only deltas arrive on both sides,

        delta(A join B) = dA join B  UNION ALL  A join dB
                          UNION ALL  dA join dB

    (A, B are the PRE-delta snapshots). Appending the returned rows to
    the materialized view equals re-joining the updated tables — the
    identity that turns an O(100 TB) view rebuild into O(delta) work:
    each term joins a delta-sized side, so the planner broadcasts the
    delta and the big snapshots are only probed, never re-joined
    against each other. Append-only deltas only (updates/deletes need
    retraction rows, a different contract).
    """
    on = list(on)
    da_b = delta_a.join(base_b, on)
    a_db = base_a.join(delta_b, on)
    da_db = delta_a.join(delta_b, on)
    return da_b.unionByName(a_db).unionByName(da_db)


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
) -> None:
    """Persist `df` hash-bucketed (and optionally sorted) by the join
    keys — the storage-level lever that removes the shuffle from
    every subsequent equi-join or aggregation on those keys: two
    tables bucketed the same way join bucket-to-bucket with NO
    Exchange, which at 100 TB is the difference between an in-place
    merge and re-shuffling the fact table on every query. Spark's
    bucketing needs the metastore (saveAsTable, not save), matching
    bucket counts on both sides, and sorted buckets to skip the
    per-task sort as well. The co-location guarantee is asserted by
    tests/test_bucketed_join.py on the physical plan.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
