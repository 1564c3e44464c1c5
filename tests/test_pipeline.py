"""Pipeline API semantics — the reference's behavioral contracts
(reference README.md:90-104 manifest, translated to Spark semantics;
see SURVEY.md §5)."""

import pyspark.sql.functions as F
import pytest

from goconnect_spark.pipeline import Pipeline, PipelineError
from goconnect_spark.plans.coders import CoderInjectionError, default_registry, TypeTag
from goconnect_spark.sources import ListSource, MemorySink, RoundRobinSource


def test_map_filter_chain(spark):
    p = (
        Pipeline(spark)
        .root(ListSource(["aaa\tbbb", "ccc\tddd"]))
        .map(F.upper)
        .filter(lambda v: v != "CCC\tDDD")
    )
    out = [r.value for r in p.ordered_dataframe().collect()]
    assert out == ["AAA\tBBB"]


def test_flatmap_preserves_order(spark):
    # reference contract: FlatMap output order preserved per input
    # element (README.md:101) — seq + position ordering
    p = (
        Pipeline(spark)
        .root(ListSource(["a\tb\tc", "d\te"]))
        .flat_map(lambda v: F.split(v, "\t"))
        .map(F.upper)
    )
    out = [r.value for r in p.ordered_dataframe().collect()]
    assert out == ["A", "B", "C", "D", "E"]


def test_fold_count(spark):
    # bounded pipeline terminates and the fold emits the final value
    # (reference README.md:100 bounded-termination contract)
    p = Pipeline(spark).root(RoundRobinSource(100, ["x", "y", "z"])).count()
    rows = p.dataframe().collect()
    assert len(rows) == 1 and rows[0]["count"] == 100


def test_fold_aggregates(spark):
    p = (
        Pipeline(spark)
        .root(ListSource(list(range(10))))
        .fold(F.sum("value").alias("s"), F.max("value").alias("mx"))
    )
    r = p.dataframe().collect()[0]
    assert r.s == 45 and r.mx == 9


def test_limit_after_par_is_seq_prefix(spark):
    # reference contract: Limit yields exactly the first n elements in
    # stamp order even with Par>1 (README.md:102-103)
    p = Pipeline(spark).root(RoundRobinSource(1000, list(range(7)))).par(8).limit(10)
    out = [r.seq for r in p.ordered_dataframe().collect()]
    assert out == list(range(10))


def test_coder_injection_string_to_binary(spark):
    from pyspark.sql import types as T

    # a map stage that declares binary input while the stream carries
    # strings -> str.Encoder must be auto-injected (reference
    # pipeline.go:168-197)
    p = (
        Pipeline(spark)
        .root(ListSource(["hello", "world"]))
        .map(F.md5, in_type=T.BinaryType())
    )
    out = [r.value for r in p.ordered_dataframe().collect()]
    import hashlib

    assert out == [hashlib.md5(b"hello").hexdigest(), hashlib.md5(b"world").hexdigest()]


def test_coder_injection_unsatisfiable_raises(spark):
    from pyspark.sql import types as T

    p = Pipeline(spark).root(ListSource([1, 2])).map(lambda c: c, in_type=T.BinaryType())
    with pytest.raises(CoderInjectionError):
        p.dataframe()


def test_coder_bfs_chain():
    r = default_registry()
    # string -> kv struct requires two hops (string->binary->struct)
    chain = r.find_chain(TypeTag("string"), TypeTag("struct<key:binary,value:binary>"))
    assert chain is not None and len(chain) == 2


def test_linear_chain_enforced(spark):
    p = Pipeline(spark).root(ListSource([1]))
    with pytest.raises(PipelineError):
        p.root(ListSource([2]))


def test_memory_sink_run(spark):
    sink = MemorySink("t_mem_run")
    Pipeline(spark).root(ListSource([1, 2, 3])).map(lambda v: v * 2).run(sink)
    vals = sorted(r.value for r in spark.sql("select * from t_mem_run").collect())
    assert vals == [2, 4, 6]


def test_key_fold(spark):
    p = (
        Pipeline(spark)
        .root(RoundRobinSource(90, ["a", "b", "c"]))
        .key_fold(["value"], F.count(F.lit(1)).alias("n"))
    )
    rows = {r.value: r.n for r in p.dataframe().collect()}
    assert rows == {"a": 30, "b": 30, "c": 30}


def test_approx_distinct_matches_exact_scale(spark, sf_dir):
    # the 100 TB twin of distinct_users_kmv_by_type's exact column: HLL
    # sketch (mergeable,
    # map-side combinable) vs exact distinct — within rsd tolerance
    import pyspark.sql.functions as F

    from goconnect_spark.tables import load

    ev = load(spark, "events", sf_dir)
    rows = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()
    assert rows and all(abs(r.approx - r.exact) <= max(3, 0.1 * r.exact) for r in rows)


def test_throttle_wires_source_rate(spark):
    # reference Throttle parity: the declared rate reaches the source
    from goconnect_spark.sources.core import KafkaSource, RateSource

    rs = RateSource(rows_per_second=1000)
    p = Pipeline(spark).root(rs).throttle(50)
    p._wire_throttle()
    assert rs.rows_per_second == 50

    ks = KafkaSource("host:9092", "t")
    p2 = Pipeline(spark).root(ks).throttle(200)
    p2._wire_throttle()
    assert ks.max_offsets_per_trigger == 200


def test_stacked_folds(spark):
    # reference contract README.md:104: fold after fold — the second
    # fold aggregates the first fold's snapshot row(s)
    p = (
        Pipeline(spark)
        .root(RoundRobinSource(100, list(range(10))))
        .key_fold(["value"], F.count(F.lit(1)).alias("n"))
        .fold(F.sum("n").alias("total"), F.count(F.lit(1)).alias("groups"))
    )
    r = p.dataframe().collect()[0]
    assert r.total == 100 and r.groups == 10


def test_limit_after_fold(spark):
    # reference contract README.md:103: Limit applies after Fold too
    p = (
        Pipeline(spark)
        .root(RoundRobinSource(90, ["a", "b", "c"]))
        .key_fold(["value"], F.count(F.lit(1)).alias("n"))
        .limit(2)
    )
    rows = p.dataframe().collect()
    assert len(rows) == 2 and [r.value for r in rows] == ["a", "b"]


def test_pipeline_streaming_fold_through_sink(spark, sf_dir):
    # the fluent API's streaming path end-to-end: streaming root ->
    # map -> key_fold -> memory sink in update mode, bounded drain
    from goconnect_spark.sources import MemorySink
    from goconnect_spark.sources.core import ParquetSource

    src = ParquetSource(f"{sf_dir}/lineitem.parquet", seq_col="l_orderkey",
                        event_time_col="l_shipdate", streaming=True)
    sink = MemorySink("t_pipe_stream")
    p = (
        Pipeline(spark)
        .root(src)
        .map(lambda v: v.getField("l_returnflag"))
        .key_fold(["value"], F.count(F.lit(1)).alias("n"))
        .trigger_available_now()
    )
    q = p.run(sink)
    assert q is not None
    rows = spark.sql(
        "select value, max(n) n from t_pipe_stream group by value"
    ).collect()
    got = {r.value: r.n for r in rows}
    want = {
        r.l_returnflag: r.n
        for r in spark.read.parquet(src.path)
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_filter_injection_then_typed_stage(spark):
    """ADVICE r1 (medium): after a coder injection triggered by a
    filter stage, cur_type is a TypeTag; a later typed stage must not
    crash in _same_type, and must inject back if needed."""
    from pyspark.sql import types as T

    p = (
        Pipeline(spark)
        .root(ListSource(["hello", "world", "x"]))
        # filter declares binary input -> str.Encoder injected
        .filter(lambda c: F.length(c) > 1, in_type=T.BinaryType())
        # map declares string input -> binary->string decoder injected
        .map(F.upper, in_type=T.StringType())
    )
    out = [r.value for r in p.ordered_dataframe().collect()]
    assert out == ["HELLO", "WORLD"]


def test_streaming_limit_raises_clear_error(spark):
    """ADVICE r1: limit on a streaming root fails at compile time with
    a PipelineError, not opaquely at query start."""
    from goconnect_spark.sources import RateSource

    p = Pipeline(spark).root(RateSource(rows_per_second=5)).limit(3)
    with pytest.raises(PipelineError, match="streaming"):
        p.dataframe()


def test_codec_tagged_stage_injects_gzip(spark):
    """A stage can demand a codec-tagged input type (TypeTag with
    codec='gzip'): the registry injects the gzip encoder on the way in
    — and the chain keeps compiling past it (post-injection TypeTag
    flows through _same_type)."""
    import gzip

    p = (
        Pipeline(spark)
        .root(ListSource(["payload-a", "payload-b"]))
        # string -> binary -> gzip binary: a 2-hop injected chain
        .map(lambda c: c, in_type=TypeTag("binary", "gzip"))
    )
    out = [bytes(r.value) for r in p.ordered_dataframe().collect()]
    assert [gzip.decompress(b).decode() for b in out] == ["payload-a", "payload-b"]
