"""Reference example parity: examples/localfs-subflow-localfs —
read every file in a directory, run each through the same transform
subflow, and write exactly one output file per input file (same
names) to a target directory.

Spark-first shape: the per-file subflow is a partition of the one
declared plan — FileSource carries the Url struct per file, the
transform is a column expression over the whole corpus at once, and
FilePerSourceSink repartitions by file name so each file is written
by one executor task.

Run: python examples/localfs_subflow_localfs.py
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.pipeline import Pipeline  # noqa: E402
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources import FileSource  # noqa: E402
from goconnect_spark.sources.sinks import FilePerSourceSink  # noqa: E402


def main():
    spark = get_spark("localfs-subflow")
    spark.sparkContext.setLogLevel("ERROR")

    in_dir = tempfile.mkdtemp(prefix="subflow_in_")
    out_dir = tempfile.mkdtemp(prefix="subflow_out_")
    for i in range(4):
        with open(os.path.join(in_dir, f"doc{i}.txt"), "wb") as f:
            f.write(f"file {i} line a\nfile {i} line b\n".encode())

    # the subflow: bytes -> text -> uppercase -> bytes, one output
    # file per input file
    (
        Pipeline(spark)
        .root(FileSource(in_dir, glob="*.txt"))
        .map(lambda v: F.encode(F.upper(F.decode(v, "UTF-8")), "UTF-8"))
        .run(FilePerSourceSink(out_dir))
    )

    for name in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, name), "rb") as f:
            print(name, "->", f.read().decode().splitlines()[0])

    gz_dir = tempfile.mkdtemp(prefix="subflow_gz_")
    # variant: per-file gzip (the coder registry's gzip encoder), name
    # rewritten via the url struct
    (
        Pipeline(spark)
        .root(FileSource(in_dir, glob="*.txt"))
        .apply(
            lambda df: df.withColumn(
                "url", F.col("url").withField("name", F.concat(F.col("url.name"), F.lit(".gz")))
            )
        )
        .map(lambda v: v, in_type=None)
        .run(FilePerSourceSinkGz(gz_dir))
    )
    for name in sorted(os.listdir(gz_dir)):
        with open(os.path.join(gz_dir, name), "rb") as f:
            print(name, "->", gzip.decompress(f.read()).decode().splitlines()[0])


class FilePerSourceSinkGz(FilePerSourceSink):
    def write(self, df):
        from goconnect_spark.plans.coders import _gzip_compress_udf

        return super().write(df.withColumn("value", _gzip_compress_udf()(F.col("value"))))


if __name__ == "__main__":
    main()
