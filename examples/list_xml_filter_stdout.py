"""Reference example parity: examples/list-xml-filter-stdout
(reference main.go:31-61 + differential oracle compare.go:10-88).

Pipeline: 500,000 '<name>…</name>' docs replayed round-robin ->
xml parse -> extract text -> filter NOT contains('B') -> running fold
sum(length(name)) snapshotted every 50,000 elements (TriggerEach(n)
parity in batch: chunk + cumulative window) -> keep snapshots
> 2,100,000 -> stdout.

The reference validates against a hand-rolled channel pipeline; here
the differential oracle is plain Python over the same list.

Run: python examples/list_xml_filter_stdout.py [n_elements]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.session import get_spark  # noqa: E402

NAMES = [
    "Adam", "Albert", "Alex", "Bart", "Bohdan", "Boris", "Carl",
    "Celine", "Dana", "Edward", "Emil", "Filip", "Greta", "Hana",
    "Igor", "Jan", "Karel", "Lena", "Marek", "Nora", "Otto",
    "Petra", "Rita", "Sven", "Tomas", "Ula", "Viktor", "Wojtek",
]
TRIGGER_EVERY = 50_000
THRESHOLD = 210_000  # reference main.go:50


def python_oracle(n: int) -> list[tuple[int, int]]:
    """The reference's compare.go analog: plain sequential pipeline."""
    acc, out = 0, []
    for i in range(n):
        name = NAMES[i % len(NAMES)]
        if "B" not in name.upper():
            acc += len(name)
        # trigger cadence counts source elements (seq), independent of
        # the filter — matching the chunk-by-seq Spark formulation
        if (i + 1) % TRIGGER_EVERY == 0 and acc > THRESHOLD:
            out.append(((i + 1) // TRIGGER_EVERY, acc))
    return out


def main(n: int = 500_000) -> None:
    spark = get_spark("list-xml-filter-stdout")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    arr = F.array(*[F.lit(f"<r><name>{x}</name></r>") for x in NAMES])
    docs = spark.range(n).select(
        F.col("id").alias("seq"),
        F.element_at(arr, (F.col("id") % len(NAMES)).cast("int") + 1).alias("xml"),
    )
    parsed = docs.select("seq", F.from_xml("xml", "name STRING").alias("d")).select(
        "seq", F.col("d.name").alias("name")
    )
    kept = parsed.where(~F.upper("name").contains("B"))
    # TriggerEach(50k) parity: chunk partial sums + running cumulative
    # window = the fold's per-trigger accumulator snapshots
    chunks = kept.groupBy(F.floor(F.col("seq") / TRIGGER_EVERY).alias("chunk")).agg(
        F.sum(F.length("name")).alias("partial")
    )
    snapshots = chunks.select(
        (F.col("chunk") + 1).cast("int").alias("trigger_no"),
        F.sum("partial").over(Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, 0)).alias("acc"),
    )
    result = [(r.trigger_no, r.acc) for r in snapshots.where(F.col("acc") > THRESHOLD).orderBy("trigger_no").collect()]
    elapsed = time.time() - t0

    expected = python_oracle(n)
    ok = result == expected
    for t, acc in result:
        print(f"trigger {t}: acc = {acc}")
    print(f"differential oracle: {'MATCH' if ok else 'MISMATCH'} ({len(result)} snapshots)")
    print(f"all stages completed in {elapsed:.3f} s")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
