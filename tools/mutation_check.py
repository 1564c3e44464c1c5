"""Standing certificate-mutation gate (VERDICT r13 item 4).

The planted-truth certificates are only worth their hashes if a real
defect in the code under test (or in the planted wire bytes) actually
BREAKS the hash — r13's ad-hoc mutation run caught a live Avro
union-index bug, so the discipline is promoted to an automated gate:
for each planted-truth certificate family, apply ONE deliberate
defect at a driver-side seam, re-run the certificate against its
DuckDB oracle, and assert the compare now FAILS (then restore and
assert the baseline still passes).

Seam mechanics matter: only driver-side constructions (planted hex
builders, header framing, operator parameters) or closures captured
BY VALUE into a UDF can be mutated from this process — module-level
patches do not propagate into Spark's Python workers. Every mutation
below is one of those two shapes; __main__-defined UDFs are
cloudpickled by value, which is why the mutated gzip decompressor is
defined here.

Usage:  python tools/mutation_check.py [sf_dir]      (default sf0.001)
Exit 0 = every mutation detected; non-zero lists insensitive
certificates — the gate chain must fail, because an insensitive
certificate is green-washing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from verify_local import _hash_rows  # noqa: E402


def _compare(spark, con, fn, sql, sf_dir):
    """(ok, reason): the driver's t2 check — rowcount, schema set,
    order-insensitive value hash. A Spark-side exception counts as a
    detected mismatch (a mutation that makes the query raise has
    certainly not gone unnoticed)."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001 - any failure = detected
        return False, f"spark error: {type(e).__name__}"
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if len(srows) != len(drows):
        return False, f"rowcount {len(srows)} vs {len(drows)}"
    if sorted(scols) != sorted(dcols):
        return False, "schema"
    if _hash_rows(scols, srows) != _hash_rows(dcols, drows):
        return False, "value-hash"
    return True, "match"


# ---------------- the mutations ----------------
# each entry: (certificate, defect description, patch fn -> undo fn)

def _mut_avro_zz():
    """Varint/zigzag edge: drop the negative mapping from the planted
    wire builder — negative ints encode as if non-negative, the exact
    defect class the r13 mutation run found in the decoder."""
    from goconnect_spark.queries import parity

    orig = parity._avro_zz
    parity._avro_zz = lambda n: (n * 2).cast("long")
    return lambda: setattr(parity, "_avro_zz", orig)


def _mut_sr_header():
    """Header byte order: Confluent schema id framed little-endian
    instead of big-endian (encoder.go:50-96's one hard-coded layout)."""
    import pyspark.sql.functions as F

    from goconnect_spark.functions import serde

    orig = serde.sr_prepend_header

    def bad(avro_body, schema_id):
        header = bytes([0]) + int(schema_id).to_bytes(4, "little")
        return F.concat(F.lit(bytearray(header)), avro_body)

    serde.sr_prepend_header = bad
    return lambda: setattr(serde, "sr_prepend_header", orig)


def _mut_gif_le16():
    """Endianness: GIF u16 fields (GCE delay, screen/image dims)
    planted big-endian — the r13 byte-swap check, now standing."""
    import pyspark.sql.functions as F

    from goconnect_spark.queries import media

    orig = media._le16
    media._le16 = lambda col: F.concat(
        media._hx2(F.shiftright(col, 8) % 256), media._hx2(col % 256))
    return lambda: setattr(media, "_le16", orig)


def _mut_mp4_be32():
    """Byte offset/field width: every planted u32 (chunk offsets, box
    sizes, sample sizes/counts) off by one — single-integer demux
    defects must fail the payload-byte checks."""
    import pyspark.sql.functions as F

    from goconnect_spark.queries import media

    orig = media._be32
    media._be32 = lambda col: F.lpad(F.hex(col + 1), 8, "0")
    return lambda: setattr(media, "_be32", orig)


def _mut_gzip_truncate():
    """Lossy decompress: the roundtrip drops its last byte — md5_rt
    must diverge from md5_orig on every non-empty row."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from goconnect_spark.plans import coders

    orig = coders._gzip_decompress_udf

    def bad_factory():
        def gunz(s):
            import gzip as _gzip

            return s.map(
                lambda b: None if b is None
                else _gzip.decompress(bytes(b))[:-1])

        gunz.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf("binary")(gunz)

    coders._gzip_decompress_udf = bad_factory
    return lambda: setattr(coders, "_gzip_decompress_udf", orig)


def _mut_hh_capacity():
    """Sketch capacity pressure: run the SpaceSaving certificate with
    capacity=2 per shard — eviction inflates est above the true
    counts, so the exact-regime oracle must reject it (proves the
    certificate genuinely requires est == true, not just plausible
    numbers)."""
    from goconnect_spark.streaming import stateful

    orig = stateful.heavy_hitters

    def bad(stream, value_col, k=10, capacity=64, shards=8):
        return orig(stream, value_col, k=k, capacity=2, shards=shards)

    stateful.heavy_hitters = bad
    return lambda: setattr(stateful, "heavy_hitters", orig)


def _mut_budget_offset():
    """Budget arithmetic: the operator admits against budget+37 — the
    closed-form oracle pins the exact cutoff, so every exhausted key
    overshoots."""
    from goconnect_spark.streaming import stateful

    orig = stateful.budget_admit

    def bad(stream, key_col, weight_col, budget, id_col):
        return orig(stream, key_col, weight_col, budget + 37, id_col)

    stateful.budget_admit = bad
    return lambda: setattr(stateful, "budget_admit", orig)


def _mut_pii_luhn():
    """Validity gate disabled: every 16-digit candidate counts as
    Luhn-valid — the oracle's independent RE2+list-comprehension
    detector pins the exact valid subset, so the certificate must
    reject a detector whose checksum arithmetic is gone."""
    import pyspark.sql.functions as F

    from goconnect_spark.functions import pii

    orig = pii.luhn_valid
    pii.luhn_valid = lambda cc: F.lit(True)
    return lambda: setattr(pii, "luhn_valid", orig)


def _mut_quantile_weights():
    """Merge forgets the weights: every summary point merges with
    weight 1 (the classic distributed-percentile bug — block strides
    discarded, cumulative targets computed over point COUNTS). The
    oracle's independent two-level implementation carries the real
    weights, so upper quantiles shift and the hash breaks."""
    import pyspark.sql.functions as F

    from goconnect_spark.operators import quantiles

    orig = quantiles.block_summaries

    def bad(df, key_cols, value_col, id_col, block_col, k):
        return orig(df, key_cols, value_col, id_col, block_col, k).withColumn(
            "__w", F.lit(1).cast("long")
        )

    quantiles.block_summaries = bad
    return lambda: setattr(quantiles, "block_summaries", orig)


def _mut_compact_gaps():
    """Compaction re-weights survivors by their own weight instead of
    the gap to the previous survivor — mass between survivors is
    silently dropped, total W shrinks, and the streaming recursion's
    n and upper quantiles drift off the oracle's replay."""
    import pyspark.sql.functions as F

    from goconnect_spark.operators import quantiles

    orig = quantiles.compact_summary

    def bad(summaries, key_cols, k):
        keys = list(key_cols)
        g = summaries.groupBy(*keys, "__v").agg(F.sum("__w").alias("__w"))
        from pyspark.sql import Window

        wc = Window.partitionBy(*keys).orderBy("__v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wn = Window.partitionBy(*keys)
        cum = g.select(
            *keys, "__v", "__w", F.sum("__w").over(wc).alias("__cw")
        ).withColumn("__tw", F.max("__cw").over(wn)).withColumn(
            "__s", F.expr(f"(__tw + {k} - 1) DIV {k}")
        )
        kept = cum.where(
            (F.expr("__cw DIV __s") > F.expr("(__cw - __w) DIV __s"))
            | (F.col("__cw") == F.col("__tw"))
        )
        return kept.select(
            *keys, F.lit(0).alias("__blk"), "__v", F.col("__w")
        )

    quantiles.compact_summary = bad
    return lambda: setattr(quantiles, "compact_summary", orig)


MUTATIONS = [
    ("avro_decode_fold", "zigzag drops negative mapping", _mut_avro_zz),
    ("pii_redaction_stats", "Luhn gate disabled", _mut_pii_luhn),
    ("quantile_summary_merge", "merge drops summary weights",
     _mut_quantile_weights),
    ("streaming_quantile_summary", "compaction forgets survivor gaps",
     _mut_compact_gaps),
    ("avro_encode_roundtrip", "SR header id little-endian", _mut_sr_header),
    ("media_animation_metadata", "GIF u16 fields byte-swapped",
     _mut_gif_le16),
    ("media_mp4_sample_ranges", "planted u32 fields +1", _mut_mp4_be32),
    ("gzip_roundtrip", "decompress drops last byte", _mut_gzip_truncate),
    ("streaming_heavy_hitters", "sketch capacity forced to 2",
     _mut_hh_capacity),
    ("streaming_budget_admit", "operator budget +37", _mut_budget_offset),
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import duckdb

    import __spark_entry__ as entrymod
    from goconnect_spark.session import get_spark

    spark = get_spark("mutation-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    insensitive, broken_baseline = [], []
    for name, desc, patch in MUTATIONS:
        fn, sql = qs[name], oracles[name]
        ok, why = _compare(spark, con, fn, sql, sf_dir)
        if not ok:
            print(f"BASELINE-FAIL {name}: {why} (cannot judge mutation)")
            broken_baseline.append(name)
            continue
        undo = patch()
        try:
            ok, why = _compare(spark, con, fn, sql, sf_dir)
        finally:
            undo()
        if ok:
            print(f"INSENSITIVE   {name}: mutation '{desc}' still matches "
                  f"the oracle — certificate is not load-bearing")
            insensitive.append(name)
        else:
            print(f"detected      {name}: '{desc}' -> {why}")
        # paranoia: the restore must bring the baseline back
        ok, why = _compare(spark, con, fn, sql, sf_dir)
        if not ok:
            print(f"RESTORE-FAIL  {name}: {why} (undo left state dirty)")
            broken_baseline.append(name)

    bad = insensitive + broken_baseline
    print(f"\n{len(MUTATIONS) - len(bad)}/{len(MUTATIONS)} mutations "
          f"detected" + (f"; FAILING: {bad}" if bad else ""))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
