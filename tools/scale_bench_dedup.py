"""Dedup-family scaling measurement (VERDICT r1 item 10).

The shipped testdata stops at sf0.1 (5,000 documents), so the 100 TB
claims were plan-shape-verified but never measured past that. This
script synthesizes m-x corpora by replicating the sf0.1 documents
table with a per-replica word prefix — every word of replica k becomes
"r<k><word>", so cross-replica shingles never collide and the true
near-dup pair count scales LINEARLY with m (as natural corpus growth
does), instead of quadratically (as byte-identical replication would).

Runs the dedup family at each multiplier and prints one JSON line per
(query, m) with wall seconds and result rows. Record the table in
SCALING.md.

Run: python tools/scale_bench_dedup.py [multipliers...]  (default 1 5 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_connected_components",
    # graph family: degree-oriented triangle counting (documents-only
    # input, so the replicated corpus exercises it too). Replica word
    # prefixes keep components disjoint → true triangle count scales
    # linearly, which is what the wall-clock should do as well.
    "word_graph_triangles",
    # round-4 filtering family (documents-only inputs). Replica
    # prefixes keep gram/bigram spaces disjoint across replicas, so
    # duplicated-gram mass and the bigram LM table scale linearly.
    # Within one multiplier the three share the cached token corpus;
    # the first query's wall carries the tokenize cost.
    "gopher_quality_rules",
    "duplicated_ngram_coverage",
    "doc_lm_score",
    # round-4 curation family (documents-only inputs): chunking is
    # map-side linear; chunk dedup groups the uniform fingerprint;
    # the split aggregate is output-constant; tfidf joins the
    # vocabulary-sized df table (prefixed words: vocab scales with m,
    # which is the worst case for the df join).
    "doc_chunking",
    "chunk_dedup_stats",
    "train_val_test_split",
    "tfidf_top_terms",
    # round-4 sampling family (documents-only inputs): the greedy
    # budget sample's grouped two-phase cumsum must stay flat-ish as
    # each of the 20 sources grows m-x (no per-source serialization);
    # the epoch plan is #sources-sized aggregation throughout.
    "token_budget_sample",
    "source_epoch_plan",
    # round-5 additions (documents-only inputs): the incremental
    # probe's cost must track the NEW-BATCH size (top 5% of the id
    # space = half of the last replica's ids — constant-ish per m on
    # replicated ids, so wall should grow with the store build, not
    # m^2); agreement and histogram are pair-set / cluster-count
    # sized on top of the cached family tables; boilerplate is one
    # keyed aggregation over the shared shingle incidence.
    "dedup_incremental_new_batch",
    "dedup_cluster_size_histogram",
    "dedup_method_agreement",
    "boilerplate_top_shingles",
    # round-5 session-2 additions (documents-only inputs): containment
    # shares the ranked-prefix cache with ngram_jaccard (its wall
    # should track the candidate join, linear under disjoint replica
    # shingle spaces); calibration is candidate-set sized over the
    # cached signature/band tables; the fingerprint report's df cap
    # bounds inverted-index fanout per fingerprint regardless of m.
    "containment_dedup",
    "minhash_jaccard_calibration",
    "fingerprint_collision_dedup",
    # round-5 session-3 additions (documents-only inputs): DSIR's
    # bucket models are B=1024-row aggregates regardless of m (wall
    # should track the bigram expand, linear); the snapshot diff is
    # one full-outer id join (linear); keeper election is one
    # aggregation over the cached cluster map (pair-set sized).
    "dsir_importance_weights",
    "corpus_snapshot_diff",
    "dedup_quality_keepers",
    # round-6 additions (documents-only inputs): BM25 shares the
    # cached token pass; its df table is vocabulary-sized (replica
    # prefixes make vocab scale with m — worst case for the term
    # join) and the final top-20 is TakeOrdered. The water-fill solve
    # is |sources|-sized regardless of m: wall should track the one
    # corpus aggregation feeding it.
    "bm25_keyword_topk",
    "source_budget_waterfill",
    # EMD drift: two passes over documents + |sources| x 100 solve —
    # wall should track the global-rank pass, linear
    "source_length_emd",
    # per-source decile normalization: tokenize + per-source windows
    "source_quality_harmonized",
    # round-7: frozen-table BPE application; round-8: rewritten to the
    # word-level decomposition (corpus pass + vocab-sized chain +
    # freq-weighted counts) — wall should be flat-to-linear in docs
    # (replica word prefixes grow the vocab with m, worst case for the
    # distinct-word chain)
    "bpe_tokenize_corpus",
    # round-8: per-doc tokenization through the broadcast-join
    # reassembly serving path — posexplode + join + one per-doc
    # groupBy; linear in docs, independent of merge count (the
    # merge-count axis is tools/scale_bench_bpe_merges.py)
    "bpe_doc_tokens",
    # round-10: merged token-count estimators (whitespace stats +
    # BPE-ish piece counts) — two corpus scans, two map-side-combined
    # aggregates, one bounded broadcast join; wall should be linear in
    # docs with no join-side growth (source key is bounded)
    "text_token_stats",
    # round-10: deep-table Arrow-engine certification entry — corpus
    # pass reduces to (word, freq), then per-distinct-word Arrow
    # tokenization under the 240- AND 2400-merge tables; wall is
    # vocab-sized, so replica word prefixes (vocab x m) are the worst
    # case while the corpus term stays one groupBy
    "bpe_vocab_deep_tokens",
]

# subset via env, e.g. SCALE_QUERIES=word_graph_triangles
if os.environ.get("SCALE_QUERIES"):
    QUERIES = [q for q in QUERIES if q in os.environ["SCALE_QUERIES"].split(",")]


def synthesize(spark, m: int, out_dir: str) -> None:
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    reps = spark.range(m).select(F.col("id").cast("int").alias("k"))
    out = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("k").cast("long") * 10_000_000).alias("doc_id"),  # widen k: int32 overflows at m >= 215
            F.array_join(
                F.expr("transform(split(text, ' '), w -> concat('r', k, w))"), " "
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main():
    mults = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    from goconnect_spark.queries import all_queries
    from goconnect_spark.session import get_spark

    spark = get_spark("dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    for m in mults:
        work = tempfile.mkdtemp(prefix=f"dedup_scale_m{m}_")
        try:
            synthesize(spark, m, work)
            n_docs = spark.read.parquet(f"{work}/documents.parquet").count()
            for name in QUERIES:
                t0 = time.time()
                rows = qs[name](spark, work).count()
                print(
                    json.dumps(
                        {
                            "query": name,
                            "multiplier": m,
                            "docs": n_docs,
                            "rows": rows,
                            "sec": round(time.time() - t0, 2),
                        }
                    ),
                    flush=True,
                )
            spark.catalog.clearCache()  # drop persisted intermediates between scales
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
