"""Join strategies for skewed and co-located workloads.

`salted_join` implements the classic skew-mitigation: the skewed
(large) side gets a random-ish salt in [0, n_salts); the small side is
exploded n_salts times; the join key becomes (key, salt), spreading a
hot key over n_salts reducers. AQE's skew-join split handles moderate
skew automatically — salting is for the pathological keys AQE can't
split (e.g. a single key bigger than an executor).

The salt is derived from a hash of stable row content when available
(deterministic) or spark_partition_id/monotonic id otherwise — it
only needs to spread rows, not to be reproducible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Optional[str] = None,
) -> DataFrame:
    """Join `large` (skewed) with `small`, spreading each join key over
    n_salts partitions.

    salt_source: column of `large` to derive the salt from (any
    roughly-uniform column, e.g. a row id). Defaults to a hash of all
    large-side columns.
    """
    on = list(on)
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        # right/full would emit unmatched small-side rows once per salt
        # replica (the small side is exploded n_salts times) — duplicates.
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, not {how!r}: "
            "the small side is replicated n_salts times, so right/full "
            "outer would duplicate unmatched small-side rows"
        )
    if salt_source is not None:
        salt = F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    else:
        salt = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    salted_large = large.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_small = small.withColumn("__salt", salts)
    out = salted_large.join(salted_small, on + ["__salt"], how)
    return out.drop("__salt")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    extra_on: Sequence[str] = (),
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Point-in-interval (range) join without a nested-loop plan.

    Spark has no native range-join operator: `p.ts BETWEEN i.start AND
    i.end` with no equi key compiles to BroadcastNestedLoopJoin or
    CartesianProduct — an all-pairs scan that dies at scale. This is
    the standard binning rewrite (the same trick behind range-join
    optimizers in other engines): quantize the number line into
    `bin_width`-sized bins, give each point its single bin, explode
    each interval to every bin it covers, equi-join on the bin (plus
    any `extra_on` keys), and keep the exact BETWEEN as a residual
    predicate. Each (point, interval) pair meets in exactly one bin —
    the point's — so the rewrite is duplicate-free by construction.

    Candidate volume per interval is ceil(len/bin_width)+1 bins times
    the points per bin, so pick bin_width near the typical interval
    length. A safety expression refuses intervals covering more than
    `max_bins_per_interval` bins (a degenerate interval would
    otherwise explode the build side silently).

    Columns must be integral (e.g. unix_micros for timestamps).
    Interval ends are inclusive: [start, end]. Inner join only —
    outer variants would need the residual predicate inside the join
    condition, which re-introduces the nested loop.

    Reference parity: goconnect joins streams only on keys
    (SURVEY.md §2.6); the range join is part of the beyond-reference
    training-data surface (windowed context lookups, span overlap).
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    bw = F.lit(int(bin_width))
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bw))
    n_bins = F.floor(F.col(end_col) / bw) - F.floor(F.col(start_col) / bw) + 1
    guard = F.assert_true(
        n_bins <= F.lit(int(max_bins_per_interval)),
        F.concat(
            F.lit("interval_join: interval covers too many bins ("),
            n_bins.cast("string"),
            F.lit(f" > {max_bins_per_interval}); raise bin_width"),
        ),
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bw),
                F.floor((F.col(end_col) + F.when(guard.isNull(), 0)) / bw),
            )
        ),
    )
    joined = p.join(iv, ["__bin", *extra_on], "inner").where(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join: each left row picks up
    `value_cols` from the LATEST right row with the same keys and
    right_time <= left_time (pandas merge_asof semantics,
    allow_exact_matches) — point-in-time feature lookups, price
    snapshots, config-at-event-time.

    Implemented as the union-tag + running-last window, NOT a join:
    both sides union on the key columns, sort within each key by
    (time, side) — right rows sort before left at equal timestamps,
    making the match inclusive — and `last(ignorenulls)` over an
    unbounded-preceding frame carries the most recent right payload
    forward onto every left row.

    Scale: ONE shuffle on the key columns and zero join explosion —
    the naive formulation (equi-join on keys + max-time dedup) ships
    |left| x |right-per-key| intermediate rows; this ships
    |left| + |right|. The frame is running-last, so window state is
    O(1) per row. The right payload is carried as ONE struct of all
    `value_cols`, so the carried values always come from the SAME
    right row even when some of its columns are NULL (pandas
    merge_asof whole-row semantics — a per-column last() would mix
    rows). Ties among right rows at identical (key, time) are
    resolved by the window order's final tiebreak on the payload
    struct; give right rows unique timestamps per key when the
    distinction matters.
    """
    from pyspark.sql.types import StructField, StructType

    on = list(on)
    value_cols = list(value_cols)
    lcols = [c for c in left.columns]
    rtyped = {f.name: f.dataType for f in right.schema.fields}
    ltyped = {f.name: f.dataType for f in left.schema.fields}
    payload_t = StructType([StructField(c, rtyped[c]) for c in value_cols])
    l2 = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_t).alias("__r"),
    )
    r2 = right.select(
        *[F.col(k) for k in on],
        *[F.lit(None).cast(ltyped[c]).alias(c) for c in lcols if c not in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__v")
    )
    return carried.where(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__v.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def fuzzy_self_join_lev1(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Edit-distance-1 self-match via SymSpell-style DELETION
    NEIGHBORHOOD blocking — the scalable fuzzy join: two strings
    within Levenshtein distance 1 always share a key in the set
    {s} ∪ {s minus one character}, so generating |s|+1 deletion
    variants per row (an in-row explode) turns the fuzzy predicate
    into an EQUI-join on the variant key. Candidates are then
    verified with the exact levenshtein() <= 1 — the same
    generate-candidates-cheaply / verify-exactly structure as the
    MinHash and prefix-filter dedup families, and the reason this
    scales where a pairwise UDF crossjoin (O(n^2) distances) cannot.

    Returns distinct (id_a, id_b, text_a, text_b, dist) pairs with
    id_a < id_b. Cost: one explode (avg |s|+1 rows per input), one
    equi-join shuffle on the variant key, exact verify on the
    candidate set only. Hot keys (very common variants) are the skew
    to watch at 100 TB — cap or salt the variant key if a corpus has
    pathological near-identical mass.

    Shuffle-payload design: the variant stage and the candidate
    dedup carry ONLY (id, key) — the text columns are re-attached
    by an id equi-join against the |input|-sized name table after
    the pair set is deduped to two ints per row (a ~2x wall win at
    sf0.1, and at 100 TB the difference between shuffling the
    corpus |s|+1 times and shuffling it once). Catalyst picks
    broadcast for the re-attach when the input's stats allow;
    no hint, so huge inputs degrade to a shuffle join instead of
    OOMing the driver.

    Candidate generation is ONE aggregation, not a self-join (r14,
    guide §2.1/§3.5): collect_set per variant key shuffles the
    (id, key) stream once and drops the singleton keys — the vast
    majority — BEFORE any pair exists; the id-pair expansion is an
    in-row slice over the sorted id set (id_a < id_b by
    construction). The old variant-key equi-join shuffled the same
    stream twice and emitted every cross-pair through the join
    before filtering; output is identical because collect_set also
    dedups the (id, key) duplicates that same-variant deletions
    produce (e.g. "aab" -> "ab" twice), which .distinct() used to
    absorb. Hot variant keys stay the skew to watch — the in-row
    expansion bounds them to one |ids| array per key instead of
    |ids|^2 join rows.
    """
    var = F.explode(
        F.expr(
            f"array_union(array({text_col}), transform(sequence(1, length({text_col})),"
            f" i -> concat(substr({text_col}, 1, i - 1), substr({text_col}, i + 1))))"
        )
    )
    # r14 (guide §2.3 narrower types): the variant key crosses the
    # blocking shuffle as its xxhash64 IMAGE, not the string — the
    # (id, key) stream drops from ~24 to 16 bytes/row and the
    # collect_set aggregation hashes/sorts bigints. Correctness is
    # unchanged BY THE VERIFY STEP: every true lev<=1 pair still
    # shares a real variant (hashing is a function, completeness
    # kept), and a 64-bit collision can only ADD a candidate that the
    # exact levenshtein(text_a, text_b) <= 1 filter (plus the pair
    # distinct) already absorbs. Measured 9.0 -> 5.0 s cold /
    # 3.5 -> 2.4 s second pass / neutral fully warm at sf0.1,
    # identical output.
    keyed = df.select(F.col(id_col).alias("__id"), var.alias("__v")).select(
        "__id", F.xxhash64("__v").alias("__k")
    )
    cand = (
        keyed.groupBy("__k")
        .agg(F.sort_array(F.collect_set("__id")).alias("__ids"))
        .where(F.size("__ids") > 1)
        .select(F.posexplode("__ids").alias("__i", "id_a"), "__ids")
        .select(
            "id_a",
            F.explode(F.expr("slice(__ids, __i + 2, size(__ids))")).alias("id_b"),
        )
        .distinct()
    )
    names_a = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a")
    )
    names_b = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b")
    )
    return (
        cand.join(names_a, "id_a")
        .join(names_b, "id_b")
        .select("id_a", "id_b", "text_a", "text_b")
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .where(F.col("dist") <= 1)
    )
