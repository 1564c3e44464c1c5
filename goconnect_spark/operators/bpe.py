"""Distributed BPE (byte-pair-encoding) merge-table induction — the
tokenizer-training step of an LLM data pipeline, run over the corpus
the way Sennrich et al. (ACL 2016, "Neural Machine Translation of Rare
Words with Subword Units") define it, but with the O(corpus) work
distributed:

- the corpus reduces ONCE to a (word, freq) vocabulary table (one
  shuffle; vocab-sized thereafter — the standard trick: BPE statistics
  only depend on the word-frequency table, not the raw corpus);
- each merge iteration is one in-row adjacent-pair expansion + one
  map-side-combined weighted count over the vocab table, then an
  argmax with a TOTAL tie-break (freq desc, pair lexicographic) whose
  single winning row crosses the driver (a 1-row bounded collect — the
  merge decision is inherently sequential; everything corpus-sized
  stays distributed);
- the chosen merge is applied in-row via a left fold over the symbol
  array (`F.aggregate` — whole-stage codegen, no Python in the loop),
  which reproduces greedy left-to-right non-overlapping replacement
  exactly (for "aaa" with merge (a,a): [aa, a], not [a, aa]);
- `localCheckpoint` truncates the per-iteration lineage (the Spark
  iterative-plan pitfall, same as operators/graph.py).

The reference engine has no tokenizer layer (SURVEY §2.8); this is
LLM-pipeline mandate surface. Cross-checked against the sequential
reference implementation `bpe_merges_py` by a property test — the
repo's distributed-vs-sequential equivalence contract (PPJoin /
PageRank pattern). Determinism: integer frequencies, total-order
tie-breaks, no RNG — byte-identical merge tables on any partitioning
(covered by the invariance suite's principles).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_EOW = "</w>"  # end-of-word sentinel: merges never cross word ends


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Left fold applying merge (a, b) -> a+b greedily left-to-right."""
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the only corpus-sized pass BPE training needs."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 2,
) -> List[Tuple[str, str, int]]:
    """Learn the first `n_merges` BPE merges over `docs[text_col]`.
    Returns [(sym_a, sym_b, pair_freq), ...] in merge order; stops
    early when the best remaining pair's weighted frequency drops
    below `min_freq`."""
    vocab = word_freq_table(docs, text_col).select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(_EOW))
        ).alias("syms"),
    ).localCheckpoint()

    merges: List[Tuple[str, str, int]] = []
    for it in range(n_merges):
        pairs = vocab.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> struct(syms[i] as a, syms[i+1] as b))"
                )
            ).alias("p"),
        ).where(F.expr("size(syms) >= 2"))
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("pf"))
            .orderBy(F.desc("pf"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pf"] < min_freq:
            break
        a, b, pf = best[0]["a"], best[0]["b"], int(best[0]["pf"])
        merges.append((a, b, pf))
        vocab = vocab.select(
            "freq", _merge_fold(F.col("syms"), a, b).alias("syms")
        )
        # checkpoint every few merges: enough to keep the nested-fold
        # lineage shallow without paying a materialization job per
        # iteration (each checkpoint is a full vocab-table write)
        if (it + 1) % 4 == 0:
            vocab = vocab.localCheckpoint()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: List[Tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize `text_col` with a learned merge table: per word, chars
    + end-of-word sentinel, then every merge applied in learned order —
    all in-row (one nested fold per merge, JVM-side)."""
    words = F.split(F.col(text_col), " ")
    per_word = F.transform(
        words, lambda w: F.concat(F.split(w, ""), F.array(F.lit(_EOW)))
    )
    for a, b, _ in merges:
        per_word = F.transform(per_word, lambda syms: _merge_fold(syms, a, b))
    return docs.withColumn(out_col, F.flatten(per_word))


def bpe_merges_py(
    word_freqs: dict, n_merges: int = 10, min_freq: int = 2
) -> List[Tuple[str, str, int]]:
    """Sequential reference of the IDENTICAL algorithm (property
    tests): same symbolization, same greedy left-to-right merge, same
    (freq desc, a asc, b asc) tie-break."""
    vocab = {tuple(list(w) + [_EOW]): f for w, f in word_freqs.items() if w}
    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get(
                    (syms[i], syms[i + 1]), 0
                ) + f
        if not counts:
            break
        (a, b), pf = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pf < min_freq:
            break
        merges.append((a, b, pf))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out: list = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges
