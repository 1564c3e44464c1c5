"""Sketch algebra + Bloom-pruned joins — the distributed-systems
side of the approximate-query family (extends events_series'-era KMV and
CMS with mergeable-register sketches and set operations).

Three oracle-gated queries:

- events_distinct_hll: a REAL HyperLogLog (p=10, 1024 registers) done
  portably: md5 -> 60-bit hash, bucket = top 10 bits, rho = leading
  zeros of the remaining 50 bits + 1, harmonic mean of 2^-rho. Every
  step is integer arithmetic (the harmonic denominator is
  sum(2^(51-rho)) as a BIGINT — summing doubles 2^-rho directly would
  need 61 mantissa bits and become order-dependent), so the DuckDB
  oracle hash-matches bit-for-bit. The alpha_m * m^2 * 2^51 scale
  factor is ONE Python-computed double literal: DuckDB parses bare
  decimal literals as DECIMAL, so an inline `0.7213/(1+1.079/1024)`
  expression diverges from Spark's double arithmetic (measured: last
  3 digits differ).
- user_overlap_kmv: KMV sketch SET OPERATIONS (the theta-sketch
  trick): per event_type, the k=32 minimum user-id hashes; for every
  type pair, the union sketch is the k smallest of A ∪ B, the overlap
  count c = |union sketch ∩ A ∩ B| estimates Jaccard as c/k, and
  intersection = jaccard * union_estimate. Exact values computed
  alongside. k is a power of two so c/k is an exact double.
- bloom_prune_join: an EXPLICIT portable Bloom filter (8192 bits,
  k=4 md5-derived positions, words built with bit_or) over a
  selective order-key set, used to prune lineitem BEFORE the exact
  join — the classic pre-shuffle pruning move for a 100 TB fact
  against a small key set. Output is the diagnostic a pipeline
  operator would emit: candidate rows, true matches, false
  positives, and the exact revenue (bit-identical because the FP
  rows are removed by the exact join before aggregation).

Reference parity: the reference engine's aggregation surface is
exact folds (fold.go, SURVEY.md §2.3); the sketch family is part of
the beyond-reference LLM/analytics layer the task brief mandates.

Scale notes (100 TB):
- HLL needs NO distinct: max(rho) per bucket is idempotent, so the
  plan is a map-side partial max into a 1024-row exchange — the
  cheapest possible distinct-count at any scale (KMV's distinct()
  shuffles the full key set). This is exactly why production engines
  ship HLL; the register layout here is mergeable across partitions/
  days by the same max.
- KMV set ops: one data-sized distinct builds the per-key sketches;
  everything after (pairing, union, overlap) runs on k*|types| rows.
  The sketches are localCheckpointed — they are referenced four
  times and would otherwise re-run the distinct per reference.
- Bloom: the filter is 128 words = 1 KB regardless of key count —
  it broadcasts as an array literal to every task; lineitem is
  scanned ONCE (candidate test + exact-match mark + aggregate in a
  single pass, no second scan for the diagnostics). The false-
  positive column is the operator's self-monitoring: at 10x the key
  count the 8192-bit filter saturates (kn/m ~ 1.3) and the FP share
  visibly climbs — the signal to re-size m with n.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from goconnect_spark.tables import load

_PRICE = "decimal(12,2)"
_RATE = "decimal(6,4)"

# --------------------------------------------------------------------
# HyperLogLog, p=10.
# --------------------------------------------------------------------
_HLL_M = 1024  # 2^10 registers
_W_MASK = (1 << 50) - 1  # low 50 bits of the 60-bit hash
# alpha_m * m^2 * 2^51  (raw HLL estimator scale; one literal, see
# module docstring for why this must not be inline arithmetic)
_HLL_SCALE = repr(0.7213 / (1 + 1.079 / _HLL_M) * 2.0**71)

# Small-range (linear counting) correction table: when V = zero
# registers > 0, the unbiased estimate is m*ln(m/V) — but ln() is on
# the oracle-pair banned list (libm vs Math.log differ in the last
# ulp). V only takes 1025 values, so the whole correction is a
# PYTHON-computed literal array consumed verbatim by BOTH engines
# (repr doubles round-trip bit-exactly through any IEEE parser);
# element_at/list-index by V is the only runtime work. Index i holds
# the value for V = i (V=0 -> harmonic path, slot unused).
import math as _math

_HLL_LC = [0.0] + [_HLL_M * _math.log(_HLL_M / v) for v in range(1, _HLL_M + 1)]
_HLL_LC_SPARK = "array({})".format(", ".join(repr(x) for x in _HLL_LC))
_HLL_LC_DUCK = "[{}]".format(", ".join(repr(x) for x in _HLL_LC))

# k for the folded-in KMV estimate (the former events_distinct_kmv,
# events_series.py r1-r10; 128 kept so the certified estimate is
# unchanged)
_KMV_FOLD_K = 128
_TWO_60 = 1 << 60


def events_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-count over event_id with the exact count alongside
    — and, since round 13, the KMV (k-minimum-values, k=128) estimate
    of the SAME stream from the SAME 60-bit hash derivation: the
    former standalone `events_distinct_kmv` folded in (catalog-density
    discipline, like the r12 distinct_users_by_type fold) with both
    operator certificates intact — the HLL register algebra gates
    zero_registers/harmonic_denom/hll_estimate, the KMV order
    statistics gate kmv_k/kmv_kth_min/kmv_estimate.

    rho is derived from the bit length of the 50-bit remainder via
    the binary string length (conv base-2 in Spark, bin() in DuckDB)
    — no log2 on doubles, whose rounding is not cross-engine-stable.
    The KMV estimate divides (k-1)*2^60 — exact as a double — by the
    kth minimum hash, both bit-identical across engines.
    """
    ev = load(spark, "events", sf_dir)
    hv = ev.selectExpr(
        "cast(conv(substr(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint) as hv"
    )
    reg = (
        hv.selectExpr("shiftright(hv, 50) as bucket", f"hv & {_W_MASK} as w")
        .selectExpr(
            "bucket",
            "case when w = 0 then 51 else 51 - length(conv(w, 10, 2)) end as rho",
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    full = (
        spark.range(_HLL_M)
        .select(F.col("id").alias("bucket"))
        .join(reg, "bucket", "left")
        .selectExpr("cast(coalesce(rho, 0) as int) as rho")
    )
    agg = full.agg(
        F.expr("sum(shiftleft(cast(1 as bigint), 51 - rho))").alias("harmonic_denom"),
        F.expr("cast(sum(case when rho = 0 then 1 else 0 end) as bigint)").alias(
            "zero_registers"
        ),
    )
    kmin = hv.distinct().orderBy("hv").limit(_KMV_FOLD_K)
    kagg = kmin.agg(
        F.count("*").alias("kmv_k"), F.max("hv").alias("kmv_kth_min"))
    exact = ev.agg(F.countDistinct("event_id").alias("exact_distinct"))
    return (
        agg.crossJoin(F.broadcast(kagg))
        .crossJoin(F.broadcast(exact))
        .selectExpr(
            f"cast({_HLL_M} as bigint) as m",
            "zero_registers",
            "harmonic_denom",
            "case when zero_registers > 0 then"
            f" element_at({_HLL_LC_SPARK}, cast(zero_registers as int) + 1)"
            f" else cast({_HLL_SCALE} as double)"
            " / cast(harmonic_denom as double) end as hll_estimate",
            "kmv_k",
            "kmv_kth_min",
            f"cast(kmv_k - 1 as double) * {_TWO_60}.0"
            " / cast(kmv_kth_min as double) as kmv_estimate",
            "exact_distinct",
        )
    )


_HLL_SQL = f"""
WITH hv AS (
  SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
rw AS (SELECT hv >> 50 AS bucket, hv & {_W_MASK} AS w FROM hv),
rho AS (
  SELECT bucket,
         MAX(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END) AS rho
  FROM rw GROUP BY bucket
),
regs AS (
  SELECT COALESCE(rho.rho, 0) AS rho
  FROM range({_HLL_M}) r LEFT JOIN rho ON rho.bucket = r.range
),
agg AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << (51 - rho)) AS BIGINT) AS harmonic_denom,
         CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_registers
  FROM regs
),
kdist AS (SELECT DISTINCT hv FROM hv),
kmin AS (SELECT hv FROM kdist ORDER BY hv LIMIT {_KMV_FOLD_K}),
kagg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kmv_k, MAX(hv) AS kmv_kth_min FROM kmin
),
ex AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_distinct FROM events)
SELECT CAST({_HLL_M} AS BIGINT) AS m, zero_registers, harmonic_denom,
       CASE WHEN zero_registers > 0 THEN
              ({_HLL_LC_DUCK})[CAST(zero_registers AS INT) + 1]
            ELSE CAST({_HLL_SCALE} AS DOUBLE) / CAST(harmonic_denom AS DOUBLE)
       END AS hll_estimate,
       kmv_k, kmv_kth_min,
       CAST(kmv_k - 1 AS DOUBLE) * {_TWO_60}.0
         / CAST(kmv_kth_min AS DOUBLE) AS kmv_estimate,
       exact_distinct
FROM agg, kagg, ex
"""


# --------------------------------------------------------------------
# KMV set operations across event types.
# --------------------------------------------------------------------
_KMV_PAIR_K = 32  # power of two: overlap/k is an exact double


def user_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types, estimated from
    per-type KMV sketches (union via k-smallest of the merged
    sketches, intersection via the theta-sketch overlap rule), with
    exact values alongside.

    Identity is the 60-bit md5 of user_id, so the same user hashes
    identically in every type's sketch — the property sketch set
    algebra depends on.
    """
    ev = load(spark, "events", sf_dir)
    # (type, user-hash) distinct is the only data-sized shuffle; it is
    # |users| x |types| rows after distinct (bounded, tiny) and has
    # FIVE downstream consumers (sketch build, sizes, exact-intersect
    # self-join x2) — checkpoint the distinct, not just the sketch
    base = (
        ev.selectExpr(
            "event_type",
            "cast(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint) as hv",
        )
        .distinct()
        .localCheckpoint()
    )
    wt = Window.partitionBy("event_type").orderBy("hv")
    sk = (
        base.withColumn("rn", F.row_number().over(wt))
        .where(F.col("rn") <= _KMV_PAIR_K)
        .select("event_type", "hv")
        .localCheckpoint()
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
    )
    merged = (
        pairs.join(
            sk,
            (sk["event_type"] == F.col("ta")) | (sk["event_type"] == F.col("tb")),
        )
        .select("ta", "tb", "hv")
        .distinct()
    )
    wu = Window.partitionBy("ta", "tb").orderBy("hv")
    uk = merged.withColumn("rn", F.row_number().over(wu)).where(
        F.col("rn") <= _KMV_PAIR_K
    )
    ina = sk.select(F.col("event_type").alias("ta"), "hv").withColumn("ia", F.lit(1))
    inb = sk.select(F.col("event_type").alias("tb"), "hv").withColumn("ib", F.lit(1))
    est = (
        uk.join(ina, ["ta", "hv"], "left")
        .join(inb, ["tb", "hv"], "left")
        .groupBy("ta", "tb")
        .agg(
            F.max("hv").alias("kth_min"),
            F.sum(
                F.when((F.col("ia") == 1) & (F.col("ib") == 1), 1).otherwise(0)
            ).alias("kmv_overlap"),
        )
    )
    # exact values from the same distinct (type, hv) base
    sizes = base.groupBy("event_type").agg(F.count("*").alias("n"))
    inter = (
        base.alias("x")
        .join(
            base.alias("y"),
            (F.col("x.hv") == F.col("y.hv"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("ta"), F.col("y.event_type").alias("tb")
        )
        .agg(F.count("*").alias("exact_intersect"))
    )
    na = sizes.select(F.col("event_type").alias("ta"), F.col("n").alias("na"))
    nb = sizes.select(F.col("event_type").alias("tb"), F.col("n").alias("nb"))
    return (
        est.join(inter, ["ta", "tb"])
        .join(F.broadcast(na), "ta")
        .join(F.broadcast(nb), "tb")
        .selectExpr(
            "ta",
            "tb",
            f"cast({_KMV_PAIR_K} as bigint) as kmv_k",
            "cast(kmv_overlap as bigint) as kmv_overlap",
            f"cast({_KMV_PAIR_K - 1} as double) * cast({_TWO_60} as double)"
            " / cast(kth_min as double) as union_est",
            f"cast(kmv_overlap as double) / {_KMV_PAIR_K}.0 as jaccard_est",
            f"(cast(kmv_overlap as double) / {_KMV_PAIR_K}.0)"
            f" * (cast({_KMV_PAIR_K - 1} as double) * cast({_TWO_60} as double)"
            " / cast(kth_min as double)) as intersect_est",
            "cast(na + nb - exact_intersect as bigint) as exact_union",
            "cast(exact_intersect as bigint) as exact_intersect",
            "cast(exact_intersect as double) / cast(na + nb - exact_intersect as double)"
            " as exact_jaccard",
        )
        .orderBy("ta", "tb")
    )


_OVERLAP_SQL = f"""
WITH base AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
sk AS (
  SELECT event_type, hv FROM (
    SELECT event_type, hv,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM base
  ) WHERE rn <= {_KMV_PAIR_K}
),
types AS (SELECT DISTINCT event_type FROM sk),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
),
merged AS (
  SELECT DISTINCT p.ta, p.tb, s.hv
  FROM pairs p JOIN sk s ON s.event_type = p.ta OR s.event_type = p.tb
),
uk AS (
  SELECT ta, tb, hv FROM (
    SELECT ta, tb, hv,
           ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
    FROM merged
  ) WHERE rn <= {_KMV_PAIR_K}
),
est AS (
  SELECT u.ta, u.tb, MAX(u.hv) AS kth_min,
         CAST(SUM(CASE WHEN a.hv IS NOT NULL AND b.hv IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS kmv_overlap
  FROM uk u
  LEFT JOIN sk a ON a.event_type = u.ta AND a.hv = u.hv
  LEFT JOIN sk b ON b.event_type = u.tb AND b.hv = u.hv
  GROUP BY u.ta, u.tb
),
sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY event_type),
inter AS (
  SELECT x.event_type AS ta, y.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS exact_intersect
  FROM base x JOIN base y
    ON x.hv = y.hv AND x.event_type < y.event_type
  GROUP BY x.event_type, y.event_type
)
SELECT e.ta, e.tb,
       CAST({_KMV_PAIR_K} AS BIGINT) AS kmv_k,
       e.kmv_overlap,
       CAST({_KMV_PAIR_K - 1} AS DOUBLE) * CAST({_TWO_60} AS DOUBLE)
         / CAST(e.kth_min AS DOUBLE) AS union_est,
       CAST(e.kmv_overlap AS DOUBLE) / CAST({_KMV_PAIR_K} AS DOUBLE) AS jaccard_est,
       (CAST(e.kmv_overlap AS DOUBLE) / CAST({_KMV_PAIR_K} AS DOUBLE))
         * (CAST({_KMV_PAIR_K - 1} AS DOUBLE) * CAST({_TWO_60} AS DOUBLE)
            / CAST(e.kth_min AS DOUBLE)) AS intersect_est,
       CAST(na.n + nb.n - i.exact_intersect AS BIGINT) AS exact_union,
       i.exact_intersect,
       CAST(i.exact_intersect AS DOUBLE)
         / CAST(na.n + nb.n - i.exact_intersect AS DOUBLE) AS exact_jaccard
FROM est e
JOIN inter i ON i.ta = e.ta AND i.tb = e.tb
JOIN sizes na ON na.event_type = e.ta
JOIN sizes nb ON nb.event_type = e.tb
ORDER BY e.ta, e.tb
"""


# --------------------------------------------------------------------
# Bloom-pruned join.
# --------------------------------------------------------------------
_BLOOM_BITS = 8192  # 13-bit positions
_BLOOM_MASK = _BLOOM_BITS - 1
_BLOOM_K = 4  # disjoint 13-bit slices of one 60-bit md5-derived hash
_MIN_LONG = -(1 << 63)


def _positions(hv_col: str) -> list[str]:
    """k 13-bit positions sliced from one 60-bit hash integer — one
    string->int parse per key, then pure integer shifts (4 separate
    conv(substr(..)) calls measured ~25% slower on the probe side)."""
    return [
        f"shiftright({hv_col}, {13 * i}) & {_BLOOM_MASK}" for i in range(_BLOOM_K)
    ]


def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 8192-bit Bloom filter over recent-urgent order keys,
    prune lineitem with it in-row (the filter rides along as a
    128-word broadcast array), then run the exact join and report
    the pruning diagnostics + exact revenue in one pass."""
    orders = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    keys = orders.where(
        "o_orderpriority = '1-URGENT' AND o_orderdate >= timestamp'2001-01-01'"
    ).select("o_orderkey")

    posed = keys.selectExpr(
        "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 15), 16, 10) as bigint) as hv"
    ).select(
        F.explode(F.array(*[F.expr(p) for p in _positions("hv")])).alias("p")
    )
    words = (
        posed.selectExpr(
            "cast(shiftright(p, 6) as bigint) as word",
            "shiftleft(cast(1 as bigint), cast(p & 63 as int)) as bv",
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bv)").alias("w"), F.count(F.lit(1)).alias("npos"))
    )
    # one aggregation finishes the whole build (r14): the occupied
    # words fold into a map, the dense 128-word array is a transform
    # over sequence(0,127) with empty words defaulting to 0 — no
    # range() scan, no left join, no sort_array. n_keys rides along:
    # posed is exactly _BLOOM_K rows per (unique) urgent order key,
    # so sum(npos) div _BLOOM_K is the key count and the separate
    # orders re-scan + second 1-row nested-loop join disappear.
    bloom = words.agg(
        F.expr("map_from_entries(collect_list(struct(word, w)))").alias("wm"),
        F.expr(f"sum(npos) div {_BLOOM_K}").alias("n_keys"),
    ).select(
        F.expr(
            "transform(sequence(0, %d), i -> "
            "coalesce(wm[cast(i as bigint)], cast(0 as bigint)))"
            % (_BLOOM_BITS // 64 - 1)
        ).alias("bw"),
        "n_keys",
    )
    # one lineitem pass: in-row bloom test, broadcast exact-match mark,
    # single aggregation for all diagnostics
    lp = li.selectExpr(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        "cast(conv(substr(md5(cast(l_orderkey as string)), 1, 15), 16, 10) as bigint) as hv",
    ).crossJoin(F.broadcast(bloom))
    tests = [
        f"(element_at(bw, cast(shiftright({p}, 6) as int) + 1)"
        f" & shiftleft(cast(1 as bigint), cast(({p}) & 63 as int))) != 0"
        for p in _positions("hv")
    ]
    # empty-candidate guard (r15, VERDICT r14 item 7): n_keys used to
    # ride only CANDIDATE rows, so "keys exist but no lineitem passes
    # the bloom" (unreachable on data where every key order has
    # lineitems — the bloom has no false negatives — but a latent
    # identity assumption) would have read n_keys = 0 where the oracle
    # counts the keys. The aggregate now runs over ALL lineitem rows
    # (n_keys is a constant column on every row via the broadcast
    # bloom) with the bloom test as a conditional marker; only
    # candidate rows carry a non-null join key, so non-candidates skip
    # the hash probe and the joined/aggregated values are unchanged.
    # Remaining assumption (stated): lineitem itself is non-empty.
    is_cand = F.expr(" AND ".join(f"({t})" for t in tests))
    # kmark is orders-proportional (the urgent-order key set) — no
    # forced broadcast (r15, VERDICT r14 item 3): the filtered-scan
    # estimate keeps it broadcast at sf0.1; at 100 TB stats/AQE decide
    kmark = keys.withColumn("mk", F.lit(1))
    lpm = lp.withColumn("__cand", is_cand).withColumn(
        "__jk", F.when(F.col("__cand"), F.col("l_orderkey"))
    )
    agg = (
        lpm.join(kmark, lpm["__jk"] == kmark["o_orderkey"], "left")
        .agg(
            # n_keys is a constant column riding the broadcast bloom
            # row; max() re-extracts the scalar so the old second
            # nested-loop join is gone
            F.max("n_keys").alias("n_keys"),
            F.sum(F.when(F.col("__cand"), 1).otherwise(0)).alias(
                "bloom_candidates"
            ),
            F.sum(F.when(F.col("mk") == 1, 1).otherwise(0)).alias("tm"),
            F.sum(
                F.when(
                    F.col("mk") == 1,
                    F.col("l_extendedprice").cast(_PRICE)
                    * (F.lit(1).cast(_RATE) - F.col("l_discount").cast(_RATE)),
                )
            ).alias("rev"),
        )
    )
    return agg.selectExpr(
        # coalesce covers the empty-LINEITEM degenerate only; the
        # empty-candidate case now reads n_keys off non-candidate rows
        "cast(coalesce(n_keys, 0) as bigint) as n_keys",
        "cast(bloom_candidates as bigint) as bloom_candidates",
        "cast(tm as bigint) as true_matches",
        "cast(bloom_candidates - tm as bigint) as false_positives",
        "cast(cast(rev as string) as double) as matched_revenue",
    )


def _sql_positions(hv_col: str) -> list[str]:
    return [
        f"(({hv_col} >> {13 * i}) & {_BLOOM_MASK})" for i in range(_BLOOM_K)
    ]


def _sql_bit(p: str) -> str:
    """Word value with bit (p & 63) set — DuckDB's << overflows at 63,
    so bit 63 is the min-bigint literal."""
    return (
        f"CASE WHEN ({p} & 63) = 63 THEN CAST({_MIN_LONG} AS BIGINT)"
        f" ELSE CAST(1 AS BIGINT) << CAST({p} & 63 AS INT) END"
    )


def _bloom_sql() -> str:
    key_pos = _sql_positions("hv")
    probe = _sql_positions("hv")
    cand_tests = " AND ".join(
        f"((COALESCE(b{i}.w, 0) & {_sql_bit(p)}) != 0)" for i, p in enumerate(probe)
    )
    cand_joins = "\n  ".join(
        f"LEFT JOIN bw b{i} ON b{i}.word = ({p} >> 6)" for i, p in enumerate(probe)
    )
    pos_union = " UNION ALL ".join(
        f"SELECT {p} AS p FROM keyed" for p in key_pos
    )
    return f"""
WITH sel AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '2001-01-01'
),
keyed AS (
  SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM sel
),
pos AS ({pos_union}),
bw AS (
  SELECT (p >> 6) AS word, bit_or({_sql_bit('p')}) AS w
  FROM pos GROUP BY (p >> 6)
),
lp AS (
  SELECT l_orderkey, l_extendedprice, l_discount,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM lineitem
),
cand AS (
  SELECT lp.l_orderkey, lp.l_extendedprice, lp.l_discount
  FROM lp
  {cand_joins}
  WHERE {cand_tests}
),
marked AS (
  SELECT c.*, s.o_orderkey AS mk
  FROM cand c LEFT JOIN sel s ON s.o_orderkey = c.l_orderkey
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS bloom_candidates,
         CAST(SUM(CASE WHEN mk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tm,
         SUM(CASE WHEN mk IS NOT NULL THEN
             CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
           END) AS rev
  FROM marked
),
nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM sel)
SELECT n_keys, bloom_candidates, tm AS true_matches,
       CAST(bloom_candidates - tm AS BIGINT) AS false_positives,
       CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS matched_revenue
FROM agg, nk
"""


QUERIES = {
    "events_distinct_hll": events_distinct_hll,
    "user_overlap_kmv": user_overlap_kmv,
    "bloom_prune_join": bloom_prune_join,
}

ORACLE = {
    "events_distinct_hll": _HLL_SQL,
    "user_overlap_kmv": _OVERLAP_SQL,
    "bloom_prune_join": _bloom_sql(),
}


# ---- moved from analytics5.py in the round-6 re-org (verbatim) ----
_CMS_D = 4  # hash rows

_CMS_W = 256  # buckets per row

















def word_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over the corpus word
    stream, probed for the top-20 exact heavy hitters (estimate >=
    exact always; collisions show as overshoot).

    Portable construction (same md5-derived hash family in Spark and
    DuckDB): for each token and each row j in 0..3, bucket =
    md5(j ':' token)[:15 hex] as int mod 256; the sketch is the
    (j, bucket) -> count table (<= 1024 cells). The point estimate for
    a key is min over its 4 cells.

    Scale shape: one shuffle total — the token stream collapses to
    the vocab-sized exact-count table (map-side partial agg), and the
    sketch cells are summed from THAT table, so the 4 md5 hashes run
    per distinct word, not per occurrence (cell values are identical:
    a cell holds the sum of counts of the words hashing into it).
    Probes join the tiny cell table via broadcast. In a pure-sketch
    deployment (no exact table, e.g. streaming) the per-occurrence
    build still collapses map-side into <= 1024 cells per partition —
    the CMS property this query demonstrates.
    """
    from goconnect_spark.queries.corpus import doc_token_arrays

    tok = doc_token_arrays(spark, sf_dir).select(
        F.explode("toks").alias("tok")
    )
    js = F.array([F.lit(j) for j in range(_CMS_D)])
    bucket = F.expr(
        f"cast(conv(substr(md5(concat(cast(j as string), ':', tok)), 1, 15), 16, 10) as bigint) % {_CMS_W}"
    )
    exact = tok.groupBy("tok").agg(F.count("*").alias("exact_count"))
    cells = (
        exact.select("tok", "exact_count", F.explode(js).alias("j"))
        .select("j", bucket.alias("b"), "exact_count")
        .groupBy("j", "b")
        .agg(F.sum("exact_count").cast("long").alias("cnt"))
    )
    top = exact.orderBy(F.desc("exact_count"), "tok").limit(20)
    probes = top.select("tok", "exact_count", F.explode(js).alias("j")).withColumn(
        "b", bucket
    )
    return (
        probes.join(F.broadcast(cells), ["j", "b"])
        .groupBy(F.col("tok").alias("word"), "exact_count")
        .agg(F.min("cnt").alias("cms_count"))
    )



_CMS_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cells AS (
  SELECT j,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % {_CMS_W} AS b,
         COUNT(*) AS cnt
  FROM tok, unnest([0, 1, 2, 3]) AS t(j)
  GROUP BY 1, 2
),
exact AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count FROM tok GROUP BY tok
),
top AS (
  SELECT * FROM exact ORDER BY exact_count DESC, tok LIMIT 20
),
probes AS (
  SELECT tok, exact_count, j,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % {_CMS_W} AS b
  FROM top, unnest([0, 1, 2, 3]) AS t(j)
)
SELECT p.tok AS word, p.exact_count, CAST(MIN(c.cnt) AS BIGINT) AS cms_count
FROM probes p JOIN cells c ON p.j = c.j AND p.b = c.b
GROUP BY p.tok, p.exact_count
"""


QUERIES["word_freq_cms"] = word_freq_cms
ORACLE["word_freq_cms"] = _CMS_SQL


# --------------------------------------------------------------------
# Sliding-window HLL MERGE: distinct users over a trailing 7-day
# window, per day — the op that makes sketches worth carrying at
# 100 TB. An exact sliding distinct re-touches every window's raw
# rows (7x read amplification, unbounded state); the sketch version
# reduces each day ONCE to its 1024 max-rho registers (a few KB),
# then every window is a register-wise MAX of 7 daily sketches —
# partial state is reused across overlapping windows, which is the
# mergeability property that register-max gives and exact distinct
# fundamentally lacks. Zero registers are counted by difference
# (m - buckets present), so no dense m-row join per window. Same
# md5/conv bit arithmetic as events_distinct_hll above — identical
# integers in both engines; the estimate divides identical operands.
# --------------------------------------------------------------------
def hll_sliding_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    daily = (
        ev.selectExpr(
            "cast(ts as date) as day",
            "cast(conv(substr(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint) as hv",
        )
        .selectExpr("day", "shiftright(hv, 50) as bucket", f"hv & {_W_MASK} as w")
        .selectExpr(
            "day",
            "bucket",
            "case when w = 0 then 51 else 51 - length(conv(w, 10, 2)) end as rho",
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    days = ev.select(F.to_date("ts").alias("window_day")).distinct()
    contrib = (
        daily.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .withColumn("window_day", F.expr("date_add(day, off)"))
        .join(days, "window_day", "left_semi")
    )
    wregs = contrib.groupBy("window_day", "bucket").agg(F.max("rho").alias("rho"))
    return (
        wregs.groupBy("window_day")
        .agg(
            F.expr("cast(count(*) as bigint) as present"),
            F.expr("sum(shiftleft(cast(1 as bigint), 51 - rho)) as present_denom"),
        )
        .selectExpr(
            "window_day",
            f"cast({_HLL_M} as bigint) - present as zero_registers",
            f"present_denom + ({_HLL_M} - present)"
            " * shiftleft(cast(1 as bigint), 51) as harmonic_denom",
        )
        .selectExpr(
            "window_day",
            "zero_registers",
            "harmonic_denom",
            # small-range correction: linear counting from the shared
            # literal table whenever any register is empty
            "case when zero_registers > 0 then"
            f" element_at({_HLL_LC_SPARK}, cast(zero_registers as int) + 1)"
            f" else cast({_HLL_SCALE} as double)"
            " / cast(harmonic_denom as double) end as estimate_users",
        )
        .orderBy("window_day")
    )


_HLL_SLIDING_SQL = f"""
WITH daily AS (
  SELECT day, bucket,
         MAX(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END) AS rho
  FROM (
    SELECT CAST(ts AS DATE) AS day, hv >> 50 AS bucket, hv & {_W_MASK} AS w
    FROM (SELECT ts, ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
          FROM events)
  ) GROUP BY day, bucket
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS window_day FROM events),
contrib AS (
  SELECT d.day + CAST(o.range AS INTEGER) AS window_day, d.bucket, d.rho
  FROM daily d CROSS JOIN range(7) o
  WHERE d.day + CAST(o.range AS INTEGER) IN (SELECT window_day FROM days)
),
wregs AS (
  SELECT window_day, bucket, MAX(rho) AS rho FROM contrib GROUP BY 1, 2
),
wagg AS (
  SELECT window_day,
         CAST(COUNT(*) AS BIGINT) AS present,
         CAST(SUM(CAST(1 AS BIGINT) << (51 - rho)) AS BIGINT) AS present_denom
  FROM wregs GROUP BY 1
)
SELECT window_day,
       {_HLL_M} - present AS zero_registers,
       present_denom + ({_HLL_M} - present) * (CAST(1 AS BIGINT) << 51)
         AS harmonic_denom,
       CASE WHEN {_HLL_M} - present > 0 THEN
              ({_HLL_LC_DUCK})[CAST({_HLL_M} - present AS INT) + 1]
            ELSE CAST({_HLL_SCALE} AS DOUBLE)
              / CAST(present_denom + ({_HLL_M} - present) * (CAST(1 AS BIGINT) << 51)
                     AS DOUBLE) END AS estimate_users
FROM wagg
ORDER BY window_day
"""


# hll_sliding_7d_users retired as a standalone catalog entry in round
# 13: hll_sliding_calibration (below) was already a strict superset
# plan and now also exposes its zero_registers/harmonic_denom
# internals — the function stays as the shared register-merge builder.


# --------------------------------------------------------------------
# Sliding-HLL calibration: the register-merge estimate above, joined
# against the EXACT 7-day distinct per window — computed the brute
# way (every event joined to each of the <=7 window days it falls in:
# the 7x read amplification the sketch exists to avoid). Running both
# on a sample is how a pipeline certifies its sketch error budget
# before trusting the cheap path at 100 TB; the window-day grid is
# calendar-bounded, so the range pairing is a broadcast against a
# dim, never a data-sized blow-up. rel_err divides two identically-
# derived numbers, so the verdict is bit-stable across engines.
# --------------------------------------------------------------------
def hll_sliding_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Since round 13 this query also carries the register internals
    (zero_registers, harmonic_denom) that the standalone
    hll_sliding_7d_users used to certify — that query folded in here
    (it was already a strict sub-plan: calibration calls it), holding
    catalog density while media_mp4_sample_ranges joins. Both
    certificates survive: the register-merge algebra gates the two
    internals columns, the sketch-error contract gates
    estimate_users/exact_users/rel_err."""
    ev = load(spark, "events", sf_dir)
    est = hll_sliding_7d_users(spark, sf_dir).select(
        "window_day", "zero_registers", "harmonic_denom", "estimate_users")
    days = ev.select(F.to_date("ts").alias("window_day")).distinct()
    exact = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .join(
            F.broadcast(days),
            F.expr("day <= window_day AND day >= date_add(window_day, -6)"),
        )
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    return (
        est.join(exact, "window_day")
        .select(
            "window_day",
            "zero_registers",
            "harmonic_denom",
            "exact_users",
            "estimate_users",
            (
                (F.col("estimate_users") - F.col("exact_users").cast("double"))
                / F.col("exact_users").cast("double")
            ).alias("rel_err"),
        )
        .orderBy("window_day")
    )


_HLL_CALIB_SQL = f"""
WITH est AS ({_HLL_SLIDING_SQL.replace(';', '')}),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS window_day FROM events),
exact AS (
  SELECT d.window_day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_users
  FROM (SELECT CAST(ts AS DATE) AS day, user_id FROM events) e
  JOIN days d ON e.day <= d.window_day AND e.day >= d.window_day - 6
  GROUP BY 1
)
SELECT est.window_day, est.zero_registers, est.harmonic_denom,
       exact.exact_users, est.estimate_users,
       (est.estimate_users - CAST(exact.exact_users AS DOUBLE))
         / CAST(exact.exact_users AS DOUBLE) AS rel_err
FROM est JOIN exact ON exact.window_day = est.window_day
ORDER BY est.window_day
"""


QUERIES["hll_sliding_calibration"] = hll_sliding_calibration
ORACLE["hll_sliding_calibration"] = _HLL_CALIB_SQL


# --------------------------------------------------------------------
# Mergeable quantile summary certificate (round 14): the distributed-
# percentile primitive (operators/quantiles.py — the deterministic
# weighted stride-sample member of the GK/KLL family). Per
# (event_type, event_id % 8) block the sketch keeps <= k=32 weighted
# points; blocks merge by value-sorted running weight, and quantile q
# reads off at integer target ceil(n*q). Unlike t-digest/KLL the
# summary is a pure function of the value multiset (id-tiebroken), so
# the DuckDB oracle re-implements BOTH levels independently and the
# hash gates the real algorithm on real data — no exact-regime plant
# needed. exact_p50/p90 (explicit rank windows, no builtin
# percentile-definition risk) ride along so the certificate also
# exposes the summary's actual rank error. Scale: one shuffle to
# (key, block), k*blocks rows per key into the merge — the shape
# that replaces a full sort at 100 TB.
# --------------------------------------------------------------------
def quantile_summary_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goconnect_spark.operators.quantiles import stride_quantiles

    ev = load(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    ).withColumn("blk", F.col("event_id") % 8)
    est = stride_quantiles(
        ev, ["event_type"], "value", "event_id", "blk", 32,
        [("est_p50", 1, 2), ("est_p90", 9, 10), ("est_p99", 99, 100)],
    )
    clean = ev.where(F.col("value").isNotNull() & ~F.isnan("value"))
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = clean.select(
        "event_type",
        F.col("value").alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("cnt"),
    )
    exact = ranked.groupBy("event_type").agg(
        F.min(
            F.when(F.col("rn") >= F.expr("(cnt + 1) DIV 2"), F.col("v"))
        ).alias("exact_p50"),
        F.min(
            F.when(F.col("rn") >= F.expr("(cnt * 9 + 9) DIV 10"), F.col("v"))
        ).alias("exact_p90"),
    )
    return est.join(exact, "event_type").orderBy("event_type")


_QSUMMARY_SQL = """
WITH clean AS (
  SELECT event_type, event_id, value AS v, event_id % 8 AS blk
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), ranked AS (
  SELECT event_type, blk, v, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, blk
                            ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, blk) AS cnt
  FROM clean
), pts AS (
  SELECT event_type, blk, v,
         LEAST((cnt + 31) // 32, cnt - rn + 1) AS w
  FROM ranked WHERE (rn - 1) % ((cnt + 31) // 32) = 0
), cum AS (
  SELECT event_type, v,
         SUM(w) OVER (PARTITION BY event_type ORDER BY v, blk
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS n
  FROM pts
), est AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN cw >= (n + 1) // 2 THEN v END) AS est_p50,
         MIN(CASE WHEN cw >= (n * 9 + 9) // 10 THEN v END) AS est_p90,
         MIN(CASE WHEN cw >= (n * 99 + 99) // 100 THEN v END) AS est_p99
  FROM cum GROUP BY event_type
), rk2 AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM clean
), exact AS (
  SELECT event_type,
         MIN(CASE WHEN rn >= (cnt + 1) // 2 THEN v END) AS exact_p50,
         MIN(CASE WHEN rn >= (cnt * 9 + 9) // 10 THEN v END) AS exact_p90
  FROM rk2 GROUP BY event_type
)
SELECT est.event_type, est.n, est.est_p50, est.est_p90, est.est_p99,
       exact.exact_p50, exact.exact_p90
FROM est JOIN exact ON exact.event_type = est.event_type
ORDER BY est.event_type
"""


QUERIES["quantile_summary_merge"] = quantile_summary_merge
ORACLE["quantile_summary_merge"] = _QSUMMARY_SQL


# --------------------------------------------------------------------
# STREAMING quantile-summary maintenance certificate (round 14): the
# compaction path (operators/quantiles.compact_summary) that turns
# the stride summary into an O(k)-state streaming sketch, driven
# through 4 real micro-batches and replayed step-for-step by the
# oracle. Batch composition is pinned by construction (batch b =
# event_id % 4 = b, four single-file writes with strictly increasing
# mtimes drained maxFilesPerTrigger=1) and ASSERTED at runtime
# inside foreachBatch — a misordered drain raises instead of
# producing a plausible wrong answer, because sequential compaction
# is deliberately order-dependent (that is what makes hash-gating it
# meaningful). DuckDB replays the exact recursion S_b =
# compact(S_{b-1} ∪ build(B_b)) as chained CTEs — same collapse-by-
# value, same ceil(W/k) stride survival rule, same last-point
# preservation, same gap re-weighting — so any defect in the
# compactor (a dropped point, a wrong survivor weight, a boundary
# off-by-one) breaks the hash. Exact p50 over the whole table rides
# along as the error witness. Scale: state is <= k+1 points per key
# regardless of stream length — the percentile-monitoring state a
# 100 TB stream can actually afford.
# --------------------------------------------------------------------
_QSTREAM_K = 32


def streaming_quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile
    import time as _time
    import uuid

    from goconnect_spark.operators.quantiles import (
        block_summaries,
        compact_summary,
        merge_quantiles,
    )
    from goconnect_spark.streaming.run import scoped_shuffle_partitions

    ev = load(spark, "events", sf_dir).select(
        "event_id", "event_type", F.col("value").cast("double").alias("v")
    )
    work = tempfile.mkdtemp(prefix=f"qstream_{uuid.uuid4().hex[:8]}_")
    state = {"pts": None, "next": 0}
    try:
        os.makedirs(f"{work}/in")
        now = _time.time()
        # ONE staging job instead of four (r14, guide §1.2 "don't
        # compute things you throw away"): the old loop ran four
        # full scan+filter+write jobs over events; a single
        # partitionBy("__b") write from one task produces the same
        # four single-file batch inputs (rows per file identical —
        # the certificate pins composition by event_id % 4, not row
        # order). Drain order is still forced by the utime ladder.
        (
            ev.withColumn("__b", F.col("event_id") % 4)
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("__b")
            .parquet(f"{work}/stage")
        )
        for b in range(4):
            part = glob.glob(f"{work}/stage/__b={b}/part-*.parquet")[0]
            dst = f"{work}/in/b{b}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (now + 10 * b, now + 10 * b))

        def step(bdf: DataFrame, batch_id: int) -> None:
            b = state["next"]
            # composition assert FUSED into the summaries job (r14,
            # guide §1.2): the old standalone where().count() cost one
            # full batch-scan job per trigger; the guard column raises
            # from inside the same job that builds the block summaries
            # (CASE branches evaluate lazily, so conforming rows never
            # touch raise_error). Same raise-on-violation semantics: a
            # misordered drain kills the query before the state merge
            # lands, and the oracle replay stays invalid-proof.
            guarded = bdf.withColumn(
                "v",
                F.when(
                    F.col("event_id") % 4 != b,
                    F.raise_error(
                        F.concat(
                            F.lit(f"batch {batch_id} is not file {b}: foreign event_id "),
                            F.col("event_id").cast("string"),
                            F.lit(" (drain order broke; the oracle replay would be invalid)"),
                        )
                    ).cast("double"),
                ).otherwise(F.col("v")),
            )
            pts = block_summaries(
                guarded.withColumn("blk", F.col("event_id") % 8),
                ["event_type"], "v", "event_id", "blk", _QSTREAM_K,
            )
            allpts = pts if state["pts"] is None else state["pts"].unionByName(pts)
            state["pts"] = compact_summary(
                allpts, ["event_type"], _QSTREAM_K
            ).localCheckpoint()
            state["next"] = b + 1

        with scoped_shuffle_partitions(spark, 8):
            q = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{work}/in")
                .writeStream.foreachBatch(step)
                .option("checkpointLocation", f"{work}/chk")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    est = merge_quantiles(
        state["pts"], ["event_type"],
        [("est_p50", 1, 2), ("est_p90", 9, 10), ("est_p99", 99, 100)],
    )
    clean = ev.where(F.col("v").isNotNull() & ~F.isnan("v"))
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    exact = (
        clean.select(
            "event_type", "v",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("cnt"),
        )
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.col("rn") >= F.expr("(cnt + 1) DIV 2"), F.col("v"))
            ).alias("exact_p50")
        )
    )
    return est.join(exact, "event_type").orderBy("event_type")


def _qstream_sql() -> str:
    k = _QSTREAM_K
    parts = [f"""
clean AS (
  SELECT event_type, event_id, value AS v,
         event_id % 4 AS b, event_id % 8 AS blk
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
)"""]
    prev = None
    for b in range(4):
        union = f"SELECT event_type, v, w FROM bld{b}" if prev is None else (
            f"SELECT event_type, v, w FROM {prev} "
            f"UNION ALL SELECT event_type, v, w FROM bld{b}"
        )
        parts.append(f"""
bld{b}_r AS (
  SELECT event_type, blk, v,
         ROW_NUMBER() OVER (PARTITION BY event_type, blk
                            ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, blk) AS cnt
  FROM clean WHERE b = {b}
), bld{b} AS (
  SELECT event_type, v,
         LEAST((cnt + {k - 1}) // {k}, cnt - rn + 1) AS w
  FROM bld{b}_r WHERE (rn - 1) % ((cnt + {k - 1}) // {k}) = 0
), un{b} AS (
  {union}
), g{b} AS (
  SELECT event_type, v, SUM(w) AS w FROM un{b} GROUP BY 1, 2
), c{b} AS (
  SELECT event_type, v, w,
         SUM(w) OVER (PARTITION BY event_type ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM g{b}
), k{b} AS (
  SELECT event_type, v, cw FROM (
    SELECT *, (tw + {k - 1}) // {k} AS s FROM c{b}
  ) WHERE cw // s > (cw - w) // s OR cw = tw
), s{b} AS (
  SELECT event_type, v,
         cw - COALESCE(LAG(cw) OVER (PARTITION BY event_type
                                     ORDER BY v), 0) AS w
  FROM k{b}
)""")
        prev = f"s{b}"
    parts.append(f"""
cum AS (
  SELECT event_type, v,
         SUM(w) OVER (PARTITION BY event_type ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS n
  FROM {prev}
), est AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN cw >= (n + 1) // 2 THEN v END) AS est_p50,
         MIN(CASE WHEN cw >= (n * 9 + 9) // 10 THEN v END) AS est_p90,
         MIN(CASE WHEN cw >= (n * 99 + 99) // 100 THEN v END) AS est_p99
  FROM cum GROUP BY event_type
), rk AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM clean
), exact AS (
  SELECT event_type,
         MIN(CASE WHEN rn >= (cnt + 1) // 2 THEN v END) AS exact_p50
  FROM rk GROUP BY event_type
)
SELECT est.event_type, est.n, est.est_p50, est.est_p90, est.est_p99,
       exact.exact_p50
FROM est JOIN exact ON exact.event_type = est.event_type
ORDER BY est.event_type""")
    return "WITH " + ",".join(parts)


QUERIES["streaming_quantile_summary"] = streaming_quantile_summary
ORACLE["streaming_quantile_summary"] = _qstream_sql()
