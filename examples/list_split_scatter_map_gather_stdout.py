"""Reference example parity: examples/list-split-scatter-map-gather-stdout
(reference main.go:38-55).

Pipeline: list of tab-joined lines -> split (FlatMap) -> scatter
across partitions (NetRoundRobin ≈ repartition) -> upper-case (Map)
-> ordered gather (NetMergeOrdered ≈ sort by seq) -> stdout.

The reference guarantees the gathered output preserves the original
element order despite the scatter; here the explicit (seq, pos)
ordering columns provide the same guarantee.

Run: python examples/list_split_scatter_map_gather_stdout.py
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.pipeline import Pipeline  # noqa: E402
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.sources import ListSource  # noqa: E402

LINES = [
    "aaa\tbbb\tccc",
    "ddd\teee",
    "fff\tggg\thhh\tiii",
    "jjj",
]


def main() -> None:
    spark = get_spark("scatter-map-gather")
    spark.sparkContext.setLogLevel("ERROR")

    p = (
        Pipeline(spark)
        .root(ListSource(LINES))
        .flat_map(lambda v: F.split(v, "\t"))  # str.Split
        .par(8)                                 # NetRoundRobin scatter
        .map(F.upper)                           # distributed map
    )
    out = [r.value for r in p.ordered_dataframe().collect()]  # NetMergeOrdered

    expected = [w.upper() for line in LINES for w in line.split("\t")]
    print(" ".join(out))
    assert out == expected, f"order not preserved: {out}"
    print("ordered gather: MATCH")
    spark.stop()


if __name__ == "__main__":
    main()
