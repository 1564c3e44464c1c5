"""Sources (reference Root transforms, SURVEY.md §2.1).

Every source yields the pipeline column contract
(seq LONG, event_time TIMESTAMP, value <T>); see pipeline.py.

- ListSource      ≈ io.From (reference io/list.go:27-29): bounded
                    in-memory list; seq = list index (the reference's
                    checkpoint is the index too, io/list.go:63).
- RoundRobinSource≈ io.RoundRobin (io/list.go:31-39): n elements
                    cycling over the list — expressed as spark.range(n)
                    + element_at, so it scales to any n without
                    materializing the replay on the driver.
- FileSource      ≈ file.Source + file.Reader (io/file/source.go:29-64,
                    reader.go:30-74): one row per file with path /
                    mod-time / content — Spark's binaryFile source
                    provides exactly the Url{Proto,Path,Name,Mod} +
                    ByteStream pair as columns.
- TextFileSource  ≈ file.Source→Reader→Text chain (io/file/text.go):
                    one row per line.
- ParquetSource   — the engine's native columnar source (the reference
                    lists parquet as TODO, README.md:82).
- RateSource      — streaming test source (rows/sec), for throttle /
                    trigger semantics tests.
- KafkaSource     ≈ kafka1.Source (io/kafka1/source.go:39-135):
                    streaming KVM-binary records with headers + event
                    timestamp; offset commit ≡ Spark checkpointing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class Source:
    is_streaming = False

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


@dataclass
class ListSource(Source):
    values: Sequence[Any]
    event_time: Optional[str] = None  # ISO timestamp applied to all rows

    def read(self, spark: SparkSession) -> DataFrame:
        rows = [(i, v) for i, v in enumerate(self.values)]
        df = spark.createDataFrame(rows, ["seq", "value"])
        et = F.lit(self.event_time).cast("timestamp") if self.event_time else F.current_timestamp()
        return df.select(F.col("seq").cast("long"), et.alias("event_time"), "value")


@dataclass
class RoundRobinSource(Source):
    n: int
    values: Sequence[Any]

    def read(self, spark: SparkSession) -> DataFrame:
        arr = F.array(*[F.lit(v) for v in self.values])
        k = len(self.values)
        return spark.range(self.n).select(
            F.col("id").alias("seq"),
            F.current_timestamp().alias("event_time"),
            F.element_at(arr, (F.col("id") % k).cast("int") + 1).alias("value"),
        )


@dataclass
class FileSource(Source):
    """Binary file-for-a-file source. value = content bytes; the Url
    struct (proto/path/name/mod — reference coder/url/url.go:29-34) is
    carried alongside."""

    path: str
    glob: str = "*"

    def read(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql.window import Window

        df = spark.read.format("binaryFile").option("pathGlobFilter", self.glob).load(self.path)
        w_seq = F.row_number().over(Window.orderBy("path")) - 1
        return df.select(
            w_seq.cast("long").alias("seq"),
            F.col("modificationTime").alias("event_time"),
            F.col("content").alias("value"),
            F.struct(
                F.lit("file").alias("proto"),
                F.regexp_replace("path", "file:", "").alias("path"),
                F.element_at(F.split("path", "/"), -1).alias("name"),
                F.col("modificationTime").cast("long").alias("mod"),
            ).alias("url"),
        )


@dataclass
class TextFileSource(Source):
    """file.Text parity: one element per line, seq = (file, line)
    composite so ordering follows files then lines.

    Reads each file whole (``wholetext``) and splits lines with
    posexplode, so within-file line numbering is exact BYTE order —
    immune to the multi-split hazard where a plain ``spark.read.text``
    scan's partition order is not byte order for files larger than one
    split. The trade is that one file must fit in one task (the
    reference's io/file use case — per-element files — is far below
    that); a 100 TB pipeline with multi-GB single text files should
    land them as parquet/jsonl first. The file index is a window over
    the distinct file list (one row per file — constant-sized); no
    data-sized global window anywhere."""

    path: str

    _FILE_STRIDE = 1 << 40  # lines per file headroom in the seq space

    def read(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql.window import Window

        df = spark.read.option("wholetext", True).text(self.path).select(
            F.input_file_name().alias("_f"),
            F.col("value"),
        )
        files = df.select("_f").distinct().select(
            "_f",
            (F.row_number().over(Window.orderBy("_f")) - 1).cast("long").alias("_fidx"),
        )
        # Hadoop line semantics: a trailing newline does not open a
        # final empty line; an empty file has no lines.
        lines = F.split(F.regexp_replace("value", r"\r?\n$", ""), r"\r?\n")
        return (
            df.join(F.broadcast(files), "_f")
            .where(F.length("value") > 0)
            .select("_fidx", F.posexplode(lines).alias("_pos", "value"))
            .select(
                (
                    F.col("_fidx") * F.lit(self._FILE_STRIDE) + F.col("_pos")
                ).cast("long").alias("seq"),
                F.current_timestamp().alias("event_time"),
                "value",
            )
        )


@dataclass
class ParquetSource(Source):
    path: str
    seq_col: Optional[str] = None
    event_time_col: Optional[str] = None
    streaming: bool = False
    schema: Optional[str] = None
    # streaming-only pass-through options for FileStreamSource, e.g.
    # {"maxFilesPerTrigger": 1, "cleanSource": "delete"} or
    # {"cleanSource": "archive", "sourceArchiveDir": ...,
    #  "maxFileAge": "14d"}. cleanSource bounds the per-trigger listing
    # term a long-lived file drain otherwise accumulates (the O(files)
    # cost the r13 rate-source A/B isolated — SCALING.md): processed
    # files leave the input dir, so late triggers list a bounded set
    # instead of the whole history. maxFileAge additionally ages
    # entries out of the seen-files map. Ignored for batch reads.
    stream_options: Optional[dict] = None

    @property
    def is_streaming(self):
        return self.streaming

    def read(self, spark: SparkSession) -> DataFrame:
        if self.streaming:
            # the streaming file source requires a directory; point it
            # at the parent with a glob when given a single FILE. A
            # DIRECTORY named *.parquet (Spark's own output layout)
            # must NOT take this path: the glob would then filter the
            # parent's leaf files against the directory's name and
            # match nothing — a silently empty stream (caught by the
            # full-catalog randomized differential, which writes its
            # tables directory-style).
            import os as _os

            path, glob = self.path, None
            if path.endswith(".parquet") and not _os.path.isdir(path):
                parent, _, fname = path.rpartition("/")
                path, glob = parent, fname
            reader = spark.readStream.schema(self.schema or spark.read.parquet(self.path).schema)
            if glob:
                reader = reader.option("pathGlobFilter", glob)
            for k, v in (self.stream_options or {}).items():
                reader = reader.option(k, v)
            df = reader.parquet(path)
        else:
            df = spark.read.parquet(self.path)
        cols = list(df.columns)
        seq = F.col(self.seq_col) if self.seq_col else F.monotonically_increasing_id()
        et = F.col(self.event_time_col) if self.event_time_col else F.current_timestamp()
        return df.select(
            seq.cast("long").alias("seq"),
            # NTZ parquet timestamps -> LTZ (session TZ is UTC) so
            # watermarks/windows accept the column
            et.cast("timestamp").alias("event_time"),
            F.struct(*cols).alias("value"),
        )


@dataclass
class RateSource(Source):
    rows_per_second: int = 100
    is_streaming = True

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.readStream.format("rate").option("rowsPerSecond", self.rows_per_second).load()
        return df.select(
            F.col("value").alias("seq"),
            F.col("timestamp").alias("event_time"),
            F.col("value"),
        )


def kafka_records_to_elements(df: DataFrame, include_headers: bool = True) -> DataFrame:
    """Map Spark's Kafka source schema (key, value, topic, partition,
    offset, timestamp, timestampType[, headers]) to the Element
    contract: seq from the broker offset, event_time from the broker
    timestamp, value = KVMBinary struct {key, value[, headers]}
    (reference types.go:43-48; io/kafka1/source.go:107-111 stamps
    elements with the record timestamp the same way).

    Pure column mapping — factored out of KafkaSource so the transform
    is testable against a static DataFrame shaped like the real source
    output (no broker in the sandbox)."""
    value_cols = [F.col("key"), F.col("value")]
    if include_headers:
        value_cols.append(F.col("headers"))
    return df.select(
        F.col("offset").alias("seq"),
        F.col("timestamp").alias("event_time"),
        F.struct(*value_cols).alias("value"),
        F.col("partition"),
    )


@dataclass
class KafkaSource(Source):
    """KVMBinary parity (reference types.go:43-48): key/value binary +
    headers, event_time from the broker timestamp (the reference stamps
    elements the same way, io/kafka1/source.go:107)."""

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"
    include_headers: bool = True
    max_offsets_per_trigger: Optional[int] = None
    is_streaming = True
    extra_options: dict = field(default_factory=dict)

    def read(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
            .option("includeHeaders", str(self.include_headers).lower())
        )
        if self.max_offsets_per_trigger:
            reader = reader.option("maxOffsetsPerTrigger", self.max_offsets_per_trigger)
        for k, v in self.extra_options.items():
            reader = reader.option(k, v)
        return kafka_records_to_elements(reader.load(), self.include_headers)
