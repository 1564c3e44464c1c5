"""The fluent pipeline API: goconnect's declaration surface on Spark.

Reference model (SURVEY.md §1): a pipeline is a linear chain
Root -> [coders] -> Map/Filter/FlatMap/Fold -> Sink, carrying Elements
`{Value, Stamp{Unix, Uniq}, Checkpoint}` (reference element.go:32-38,
stamp.go:26-29). Here the Element stream IS a DataFrame with the
column contract:

    seq        LONG       -- Stamp.Uniq parity: per-source sequence
    event_time TIMESTAMP  -- Stamp.Unix parity: event time
    value      <T>        -- the payload (any Spark type)

plus any ordering refinement columns added by flat_map (sub-position),
so "guaranteed output ordering" (reference processor.go:64-280) is an
explicit `ORDER BY ordering_cols` instead of a reorder cache.

Declaration vs materialization (reference README.md:28): builder calls
only record stage defs; `.dataframe()` compiles the chain into ONE
DataFrame expression (Catalyst sees the whole plan — filters push into
the scan, maps fuse into one codegen stage), and `.run()` executes it
through the sink. Bounded/unbounded unification: the same chain
compiles to a batch plan or a Structured Streaming plan depending on
the source (reference README.md:17-19 ≈ read vs readStream +
Trigger.AvailableNow).

The ack/commit protocol (reference context.go:462-642) is not ported:
Spark checkpointing provides at-least-once to sinks (exactly-once for
idempotent file sinks); source progress is committed by the commit log
after sink flush, which is the same observable contract.

Coder injection (reference pipeline.go:168-197): when a stage declares
a required input type that doesn't match the current value type, the
registry in plans/coders.py BFS-searches conversion chains (depth <= 5)
and splices them in at declaration time.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, Union

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

from goconnect_spark.plans.coders import CoderRegistry, TypeTag, default_registry

ColumnFn = Callable[[Column], Column]


@dataclass
class _Stage:
    kind: str  # map | filter | flat_map | fold | limit | par | throttle | raw
    fn: Any = None
    in_type: Optional[T.DataType] = None
    out_type: Optional[T.DataType] = None
    args: dict = field(default_factory=dict)


class PipelineError(ValueError):
    pass


class Pipeline:
    """Linear dataflow declaration that compiles to one DataFrame.

    >>> p = (Pipeline(spark)
    ...      .root(ListSource(["aaa\\tbbb", "ccc"]))
    ...      .flat_map(lambda v: F.split(v, "\\t"))
    ...      .map(F.upper)
    ...      .filter(lambda v: v != "BBB"))
    >>> p.dataframe()          # materialize as DataFrame
    >>> p.run(ConsoleSink())   # or drain through a sink
    """

    def __init__(self, spark: SparkSession, coders: Optional[CoderRegistry] = None):
        self.spark = spark
        self.coders = coders or default_registry()
        self._source = None
        self._stages: list[_Stage] = []
        self._trigger: Optional[dict] = None

    # -- declaration -------------------------------------------------
    def root(self, source) -> "Pipeline":
        if self._source is not None:
            raise PipelineError("pipeline already has a root (chains are linear)")
        self._source = source
        return self

    def _add(self, st: _Stage) -> "Pipeline":
        if self._source is None:
            raise PipelineError("declare a root before transforms")
        self._stages.append(st)
        return self

    def map(self, fn: Union[ColumnFn, Column], in_type: Optional[T.DataType] = None,
            out_type: Optional[T.DataType] = None) -> "Pipeline":
        """1->1 transform of the value column (reference Map, def.go:45-47)."""
        return self._add(_Stage("map", fn, in_type, out_type))

    def filter(self, pred: ColumnFn, in_type: Optional[T.DataType] = None) -> "Pipeline":
        """Keep rows where pred(value) (reference Filter, def.go:53-55)."""
        return self._add(_Stage("filter", pred, in_type))

    def flat_map(self, fn: ColumnFn, in_type: Optional[T.DataType] = None,
                 out_type: Optional[T.DataType] = None) -> "Pipeline":
        """1->N: fn(value) must return an array column; each element
        becomes a row, ordered by (parent seq, position) (reference
        FlatMap def.go:49-51 — output order preserved)."""
        return self._add(_Stage("flat_map", fn, in_type, out_type))

    def fold(self, *aggs: Column) -> "Pipeline":
        """Global (non-keyed) aggregation — reference Fold (def.go:57-59).
        Batch: one output row. Streaming: running snapshot per trigger
        in update output mode, exactly the reference's
        emit-accumulator-on-trigger semantics (context.go:332-455)."""
        if not aggs:
            raise PipelineError("fold requires at least one aggregate column")
        return self._add(_Stage("fold", list(aggs)))

    def count(self) -> "Pipeline":
        """Sugar for fold(count(*)) — reference Count (def.go:61-65)."""
        return self.fold(F.count(F.lit(1)).alias("count"))

    def key_fold(self, keys: Sequence[str], *aggs: Column) -> "Pipeline":
        """Keyed aggregation — beyond the reference (it has none;
        SURVEY.md §2.3 mandates exposing it from day one)."""
        return self._add(_Stage("fold", list(aggs), args={"keys": list(keys)}))

    def limit(self, n: int) -> "Pipeline":
        """Bounded prefix in seq order (reference Limit def.go:88-91 —
        its stop-cascade is Spark's limit/AvailableNow)."""
        return self._add(_Stage("limit", n))

    def par(self, n: int) -> "Pipeline":
        """Parallelism hint -> repartition(n); ordering is restored at
        the sink via the explicit seq columns, replacing the
        reference's reorder cache (processor.go:203-270)."""
        return self._add(_Stage("par", n))

    def throttle(self, rows_per_second: int) -> "Pipeline":
        """Rate limit; effective on streaming sources that support
        maxOffsets/rowsPerSecond (reference Throttle def.go:93-96)."""
        return self._add(_Stage("throttle", rows_per_second))

    def apply(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        """Raw escape hatch: arbitrary DataFrame -> DataFrame stage
        (reference Apply of user Processors, pipeline.go:64-81)."""
        return self._add(_Stage("raw", fn))

    def trigger_every(self, seconds: float) -> "Pipeline":
        """Processing-time trigger (reference TriggerEvery def.go:83-87)."""
        self._trigger = {"processingTime": f"{seconds} seconds"}
        return self

    def trigger_available_now(self) -> "Pipeline":
        """Drain-and-terminate for bounded streaming runs."""
        self._trigger = {"availableNow": True}
        return self

    # -- materialization --------------------------------------------
    def dataframe(self) -> DataFrame:
        """Compile the declared chain into a single DataFrame."""
        if self._source is None:
            raise PipelineError("pipeline has no root")
        self._wire_throttle()
        df = self._source.read(self.spark)
        ordering = ["seq"]
        cur_type: Optional[T.DataType] = df.schema["value"].dataType if "value" in df.columns else None
        for st in self._stages:
            if st.kind in {"map", "filter", "flat_map"} and st.in_type is not None and cur_type is not None:
                if not _same_type(cur_type, st.in_type):
                    df, cur_type = self.coders.inject(df, cur_type, st.in_type)
            if st.kind == "map":
                col = st.fn(F.col("value")) if callable(st.fn) else st.fn
                df = df.withColumn("value", col)
                cur_type = st.out_type or df.schema["value"].dataType
            elif st.kind == "filter":
                df = df.where(st.fn(F.col("value")))
            elif st.kind == "flat_map":
                arr = st.fn(F.col("value")) if callable(st.fn) else st.fn
                pos = f"pos{len(ordering)}"
                others = [c for c in df.columns if c != "value"]
                df = df.select(*others, F.posexplode(arr).alias(pos, "value"))
                ordering = ordering + [pos]
                cur_type = st.out_type or df.schema["value"].dataType
            elif st.kind == "fold":
                keys = st.args.get("keys") or []
                if keys:
                    df = df.groupBy(*keys).agg(*st.fn)
                else:
                    df = df.agg(*st.fn)
                ordering = list(keys)
                cur_type = None
            elif st.kind == "limit":
                if df.isStreaming:
                    # Structured Streaming rejects sort+limit in append
                    # mode; the reference's unbounded Limit is a stop-
                    # cascade (def.go:88-91) with no Spark equivalent
                    # short of foreachBatch bookkeeping. Fail loudly at
                    # compile time instead of opaquely at query start —
                    # bounded runs get the same semantics via
                    # trigger_available_now() on a batch read.
                    raise PipelineError(
                        "limit(n) is not supported on streaming roots: "
                        "use a bounded (batch) source, or "
                        "streaming.run.StreamingLimit for the unbounded "
                        "take-n (stop-cascade) semantics"
                    )
                if ordering:
                    df = df.orderBy(*ordering)
                df = df.limit(st.fn)
            elif st.kind == "par":
                df = df.repartition(st.fn)
            elif st.kind == "throttle":
                pass  # source-level option for streaming; no-op in batch
            elif st.kind == "raw":
                df = st.fn(df)
                cur_type = df.schema["value"].dataType if "value" in df.columns else None
        self._ordering = ordering
        return df

    def _wire_throttle(self) -> None:
        """Push a declared throttle into the source's rate option
        (reference Throttle sleeps between emits, util/throttler.go;
        the Spark analog is source-side rate limiting: rowsPerSecond
        on a rate source, maxOffsetsPerTrigger on Kafka)."""
        rates = [st.fn for st in self._stages if st.kind == "throttle"]
        if not rates:
            return
        rate = min(rates)
        if hasattr(self._source, "rows_per_second"):
            self._source.rows_per_second = rate
        elif hasattr(self._source, "max_offsets_per_trigger"):
            self._source.max_offsets_per_trigger = rate

    def ordered_dataframe(self) -> DataFrame:
        """Materialize with the reference's total-order guarantee
        (NetMergeOrdered parity): global sort on the seq columns."""
        df = self.dataframe()
        if self._ordering:
            df = df.orderBy(*self._ordering)
        return df

    # -- execution ---------------------------------------------------
    def run(self, sink=None, await_termination: bool = True):
        """Drain the pipeline through a sink. Returns the sink result
        (batch) or the StreamingQuery (streaming)."""
        from goconnect_spark.sources.sinks import ConsoleSink

        sink = sink or ConsoleSink()
        started = time.time()
        df = self.dataframe()
        if df.isStreaming:
            q = sink.write_stream(df, trigger=self._trigger)
            if await_termination and self._trigger and self._trigger.get("availableNow"):
                q.awaitTermination()
            return q
        out = sink.write(df.orderBy(*self._ordering) if self._ordering else df)
        elapsed = time.time() - started
        # reference logs "All stages completed in %f s" (pipeline.go:47)
        print(f"goconnect_spark: all stages completed in {elapsed:.3f} s")
        return out


def _same_type(a, b) -> bool:
    """Type equality across the two representations that flow through
    the compiler: plain Spark DataTypes and codec-carrying TypeTags
    (coders.inject returns a TypeTag, so after an injection triggered
    by e.g. a filter stage, `cur_type` is a TypeTag and the next typed
    stage must still compare correctly)."""
    return TypeTag.of(a) == TypeTag.of(b)
