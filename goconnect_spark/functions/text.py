"""Reusable text-pipeline column builders (public API).

These are the composable pieces behind queries/text.py and
queries/dedup.py: tokenization, shingling, portable hashing
(md5-hex), minhash signatures and simhash — all built-in JVM
expressions, no Python UDFs.

Portability note: the "hash" primitive everywhere is the md5 hex
string; lexicographic min over md5 strings is a valid uniform minhash
and is reproducible across engines (the DuckDB oracle computes the
same strings), unlike xxhash64/murmur whose seeds/variants differ
per engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per whitespace token."""
    return df.select(
        id_col, F.explode(F.split(text_col, " ")).alias("w")
    ).where(F.col("w") != "")


def word_shingles(df: DataFrame, n: int = 2, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc (docs with >= n words)."""
    words = df.select(id_col, F.split(text_col, " ").alias("w")).where(F.size("w") >= n)
    parts = ", ".join(f"w[i+{k}]" for k in range(n))
    return words.select(
        id_col,
        F.explode(
            F.expr(f"transform(sequence(0, size(w)-{n}), i -> concat_ws(' ', {parts}))")
        ).alias("shingle"),
    ).distinct()


def char_ngrams(df: DataFrame, n: int = 3, text_col: str = "text",
                id_col: str = "doc_id", keep_cols: tuple = ()) -> DataFrame:
    """One row per char n-gram occurrence (not distinct)."""
    return df.select(
        id_col,
        *keep_cols,
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col})-{n-1}, 1)),"
                f" i -> substr({text_col}, i, {n}))"
            )
        ).alias("ngram"),
    )


def minhash_signature(shingles: DataFrame, n_hashes: int = 12,
                      id_col: str = "doc_id") -> DataFrame:
    """(id, seed, mh): per-seed lexicographic-min md5 of salted
    shingles. One shuffle on (id, seed)."""
    spark = shingles.sparkSession
    seeds = spark.range(n_hashes).select(F.col("id").cast("int").alias("seed"))
    return (
        shingles.crossJoin(F.broadcast(seeds))
        .groupBy(id_col, "seed")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle")))).alias("mh"))
    )


def lsh_band_keys(signature: DataFrame, band_size: int = 3,
                  id_col: str = "doc_id") -> DataFrame:
    """(id, band, band_key): md5 over the seed-ordered minhashes of
    each band — the LSH bucket key for the candidate join."""
    return (
        signature.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.expr("transform(array_sort(collect_list(struct(seed, mh))), x -> x.mh)"),
                    "|",
                )
            ).alias("band_key")
        )
    )


def simhash(token_freqs: DataFrame, bits: int = 32, id_col: str = "doc_id",
            token_col: str = "w", freq_col: str = "f") -> DataFrame:
    """(id, simhash): integer-only simhash over weighted tokens.
    Token bit b comes from hex digit b//4 of md5(token)."""
    spark = token_freqs.sparkSession
    with_h = token_freqs.withColumn("h", F.substring(F.md5(token_col), 1, bits // 4))
    bit_ids = spark.range(bits).select(F.col("id").cast("int").alias("b"))
    hexval = F.expr("instr('0123456789abcdef', substr(h, CAST(b/4 AS INT)+1, 1)) - 1")
    bit = F.floor(hexval / F.pow(F.lit(2), F.col("b") % 4)).cast("int") % 2
    return (
        with_h.crossJoin(F.broadcast(bit_ids))
        .select(id_col, "b", (F.col(freq_col) * (bit * 2 - 1)).alias("c"))
        .groupBy(id_col, "b")
        .agg(F.sum("c").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("b")).cast("long")).otherwise(F.lit(0))
            ).alias("simhash")
        )
    )


def hamming_distance(a: Column, b: Column, bits: int = 32) -> Column:
    """Popcount of XOR via per-bit compare (portable integer form)."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0, (acc, k) -> acc + "
        f"CAST(CAST(floor({a._jc.toString()} / power(2, k)) AS BIGINT) % 2 != "
        f"CAST(floor({b._jc.toString()} / power(2, k)) AS BIGINT) % 2 AS INT))"
    )


def jaccard_pairs(shingles: DataFrame, candidates: DataFrame,
                  id_col: str = "doc_id", a_col: str = "doc_a",
                  b_col: str = "doc_b") -> DataFrame:
    """Exact Jaccard for candidate pairs: intersection via shingle
    join, sizes via per-doc counts; touches only candidates."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    inter = (
        candidates.join(shingles.alias("sa"), F.col(a_col) == F.col(f"sa.{id_col}"))
        .join(
            shingles.alias("sb"),
            (F.col(b_col) == F.col(f"sb.{id_col}")) & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy(a_col, b_col)
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col(a_col) == F.col(f"na.{id_col}"))
        .join(sizes.alias("nb"), F.col(b_col) == F.col(f"nb.{id_col}"))
        .select(
            a_col,
            b_col,
            (F.col("inter") / (F.col("na.n") + F.col("nb.n") - F.col("inter")).cast("double")).alias(
                "jaccard"
            ),
        )
    )
