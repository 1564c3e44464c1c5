"""Join strategies for skewed and co-located workloads.

`salted_join` implements the classic skew-mitigation: the skewed
(large) side gets a random-ish salt in [0, n_salts); the small side is
exploded n_salts times; the join key becomes (key, salt), spreading a
hot key over n_salts reducers. AQE's skew-join split handles moderate
skew automatically — salting is for the pathological keys AQE can't
split (e.g. a single key bigger than an executor).

The salt is derived from a hash of stable row content when available
(deterministic) or spark_partition_id/monotonic id otherwise — it
only needs to spread rows, not to be reproducible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Optional[str] = None,
) -> DataFrame:
    """Join `large` (skewed) with `small`, spreading each join key over
    n_salts partitions.

    salt_source: column of `large` to derive the salt from (any
    roughly-uniform column, e.g. a row id). Defaults to a hash of all
    large-side columns.
    """
    on = list(on)
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        # right/full would emit unmatched small-side rows once per salt
        # replica (the small side is exploded n_salts times) — duplicates.
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, not {how!r}: "
            "the small side is replicated n_salts times, so right/full "
            "outer would duplicate unmatched small-side rows"
        )
    if salt_source is not None:
        salt = F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    else:
        salt = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    salted_large = large.withColumn("__salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    salted_small = small.withColumn("__salt", salts)
    out = salted_large.join(salted_small, on + ["__salt"], how)
    return out.drop("__salt")
