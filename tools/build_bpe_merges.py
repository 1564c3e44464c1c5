"""Offline BPE merge-table training — the index-build step for the
frozen tokenizer artifact (the same freeze-the-fit pattern as
tools/build_pq_codebooks.py / build_ivf_centroids.py: train ONCE,
freeze the result as literals, keep every catalog query + oracle
deterministic and cross-engine replayable).

Usage: python tools/build_bpe_merges.py [sf_dir] [n_merges]
Rewrites goconnect_spark/queries/_bpe_frozen.py.

Training runs the distributed trainer (operators/bpe.bpe_merges —
property-verified against the sequential reference); at 100 TB this
is a once-per-tokenizer-version batch job whose output ships as a
literal table, exactly how production tokenizers version vocab files.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 24

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "goconnect_spark", "queries", "_bpe_frozen.py",
)


def main():
    from goconnect_spark.session import get_spark
    from goconnect_spark.tables import load
    from goconnect_spark.operators.bpe import bpe_merges

    spark = get_spark()
    docs = load(spark, "documents", SF_DIR)
    merges = bpe_merges(docs, n_merges=N_MERGES, min_freq=2)
    # the whole-document replace-chain encoding is only safe if no
    # merge pattern can straddle a word boundary — i.e. no pair's
    # FIRST symbol contains the word-final sentinel. True by
    # construction (word-final symbols have no successor); refuse to
    # freeze a table that ever violates it.
    bad = [(a, b) for a, b, _ in merges if "</w>" in a]
    assert not bad, f"boundary invariant violated: {bad}"
    rows = "\n".join(
        f"    ({a!r}, {b!r}, {pf})," for a, b, pf in merges
    )
    body = f'''"""FROZEN BPE merge table — trained by tools/build_bpe_merges.py
(distributed trainer operators/bpe.bpe_merges, property-verified vs
the sequential reference) on {SF_DIR} documents, n_merges={N_MERGES},
min_freq=2. DO NOT EDIT BY HAND; retrain to change. (sym_a, sym_b,
pair_freq) in merge order — application order is load-bearing."""

BPE_MERGES = [
{rows}
]
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {len(merges)} merges -> {OUT}")
    for m in merges:
        print(" ", m)


if __name__ == "__main__":
    main()
