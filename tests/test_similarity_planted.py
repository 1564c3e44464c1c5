"""Planted near-duplicates for the embedding LSH (VERDICT r1 item 6).

The shipped embeddings corpus has max pairwise cosine ~0.6, so
embedding_near_dup's oracle-green 0-row result proves recall of
nothing. These tests append perturbed copies of corpus vectors and
assert (a) the LSH pipeline recalls the planted pairs, and (b) the
DuckDB oracle still hash-matches on the augmented table.
"""

import math

import pyspark.sql.functions as F
import pytest

from goconnect_spark.queries.similarity import _NEAR_DUP_SQL, near_dup_pairs
from goconnect_spark.tables import load

_N_PLANTED = 5
_ID_OFFSET = 100000


def _augmented(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    planted = (
        emb.where(F.col("vec_id") < _N_PLANTED)
        .select(
            (F.col("vec_id") + _ID_OFFSET).alias("vec_id"),
            # scale perturbation: cosine to the original is ~1.0 but the
            # quantized vectors differ, so this is a genuine near-dup,
            # not a byte-identical copy
            F.expr("transform(embedding, x -> CAST(x * 1.001 AS FLOAT))").alias("embedding"),
            "label",
        )
    )
    return emb.select("vec_id", "embedding", "label").union(planted)


def test_lsh_recalls_planted_near_dups(spark, sf_dir):
    out = near_dup_pairs(_augmented(spark, sf_dir)).collect()
    assert len(out) >= _N_PLANTED  # non-vacuous: the planted pairs surface
    got_pairs = {(r.vec_a, r.vec_b) for r in out}
    planted_pairs = {(i, i + _ID_OFFSET) for i in range(_N_PLANTED)}
    # full recall on the planted set: a ~0.1% perturbation keeps all
    # 16 hyperplane signs, so both bands collide
    assert planted_pairs <= got_pairs
    for r in out:
        assert r.cosine >= 0.9
        if (r.vec_a, r.vec_b) in planted_pairs:
            assert r.cosine > 0.999


def test_oracle_matches_on_augmented_table(spark, sf_dir, tmp_path):
    """The same augmented table through Spark AND DuckDB — the oracle
    SQL must stay hash-equivalent when the result is non-empty."""
    import duckdb

    aug_dir = str(tmp_path / "aug_embeddings")
    _augmented(spark, sf_dir).coalesce(1).write.parquet(aug_dir)

    srows = [tuple(r) for r in near_dup_pairs(spark.read.parquet(aug_dir)).collect()]
    assert len(srows) >= _N_PLANTED

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{aug_dir}/*.parquet'")
    drows = con.execute(_NEAR_DUP_SQL).fetchall()

    def norm(rows):
        return sorted(
            (int(a), int(b), repr(round(float(c), 9))) for a, b, c in rows
        )

    assert norm(srows) == norm(drows)
