from goconnect_spark.sources.core import (
    FileSource,
    KafkaSource,
    ListSource,
    ParquetSource,
    RateSource,
    RoundRobinSource,
    TextFileSource,
)
from goconnect_spark.sources.sinks import (
    ConsoleSink,
    KafkaSink,
    MemorySink,
    ParquetSink,
)

__all__ = [
    "ListSource",
    "RoundRobinSource",
    "FileSource",
    "TextFileSource",
    "ParquetSource",
    "RateSource",
    "KafkaSource",
    "ConsoleSink",
    "MemorySink",
    "ParquetSink",
    "KafkaSink",
]
