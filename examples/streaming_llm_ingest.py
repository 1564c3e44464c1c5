"""Streaming ingestion of a training-data corpus: the LLM pipeline's
front door as one continuous Structured Streaming job.

    documents stream
      -> exact dedup within a watermark horizon (bounded state)
      -> quality gate (length/repetition heuristics, pure columns)
      -> partitioned parquet (the training-shard sink)

At 100 TB/day this is the shape that matters: dedup state is bounded
by the watermark (dropDuplicatesWithinWatermark), the quality gate is
whole-stage-codegen, and the sink writes partition-pruned shards with
exactly-once file semantics from the checkpoint.

Run: python examples/streaming_llm_ingest.py
"""

from __future__ import annotations

import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.streaming.run import streaming_dedup  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main():
    spark = get_spark("streaming-llm-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = tempfile.mkdtemp(prefix="llm_shards_")
    chk = tempfile.mkdtemp(prefix="llm_chk_")

    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_DIR)
        .withColumn("event_time", F.current_timestamp())
        .withColumn("content_hash", F.md5(F.lower(F.trim("text"))))
    )

    deduped = streaming_dedup(stream, ["content_hash"], watermark="1 hour")
    toks = F.size(F.split("text", " "))
    quality = deduped.where(
        (toks >= 16) & (toks <= 2048) & (F.length("text") / toks <= 12)
    )

    q = (
        quality.select("doc_id", "lang", "text", "n_chars")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .partitionBy("lang")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    shards = spark.read.parquet(out_dir)
    print("shards by lang:")
    shards.groupBy("lang").count().orderBy("lang").show()
    print("rows in:", spark.read.parquet(f"{SF_DIR}/documents.parquet").count(),
          "| rows kept:", shards.count())


if __name__ == "__main__":
    main()
