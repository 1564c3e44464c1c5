"""End-to-end LLM training-data pipeline: the engine's operator
families composed the way a real corpus build uses them.

    documents (raw corpus)
      │ 0. PII scrub             (regex + Luhn detectors, redaction —
      │                           BEFORE anything hashes or learns
      │                           from the text)
      │ 1. exact dedup           (md5 keeper groups)
      │ 2. near-dup removal      (minhash-LSH pairs -> connected
      │                           components -> quality-aware keeper
      │                           election, drop the rest)
      │ 3. quality filter        (token stats: length + stopword +
      │                           type/token thresholds)
      │ 4. language filter       (keep target langs by label)
      │ 4b. token budget         (water-fill a 60% budget across
      │                           sources; greedy md5-order take)
      │ 5. deterministic split   (md5-mod: 90% train / 10% val)
      │ 6. sequence packing      (512-token chunked packs)
      │ 9. shape report          (per-source length percentiles via
      │                           the mergeable quantile summary)
      ▼ packed training batches + a stats report

Every stage is the same DataFrame operator exercised by the oracle
gate; this script wires them and prints corpus-funnel stats.

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goconnect_spark.queries.dedup import dedup_connected_components, dedup_exact  # noqa: E402
from goconnect_spark.session import get_spark  # noqa: E402
from goconnect_spark.tables import load  # noqa: E402

CAP = 512
TARGET_LANGS = ("en", "de", "fr")


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("llm-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    raw = load(spark, "documents", sf_dir)
    n0 = raw.count()

    # 0. PII scrub FIRST — nothing downstream (dedup hashes, token
    # stats, the trained tokenizer) may ever see unredacted text.
    # Pure codegen column expressions (functions/pii.py): one map
    # stage, no shuffle, no Python boundary.
    from goconnect_spark.functions.pii import with_pii_scrub

    scrubbed = with_pii_scrub(raw, "text", out_col="text_red")
    pii_rates = (
        scrubbed.groupBy("source")
        .agg(
            F.sum("n_emails").alias("emails"),
            F.sum("n_phones").alias("phones"),
            F.sum("n_ipv4").alias("ips"),
            F.sum("n_cc_valid").alias("cards"),
        )
        .agg(
            F.sum("emails").alias("emails"), F.sum("phones").alias("phones"),
            F.sum("ips").alias("ips"), F.sum("cards").alias("cards"),
        )
        .collect()[0]
    )
    docs = scrubbed.drop("text").withColumnRenamed("text_red", "text").drop(
        "n_emails", "n_phones", "n_ipv4", "n_cc_candidates", "n_cc_valid",
        "n_ibans", "n_iban_valid",
    )

    # 1. exact dedup: keep each hash-group's keeper
    keepers = dedup_exact(spark, sf_dir).select(F.col("keeper_doc_id").alias("doc_id"))
    docs1 = docs.join(keepers, "doc_id", "left_semi")
    n1 = docs1.count()

    # 2. near-dup clusters: keep the BEST document of each cluster
    # (quality-aware election — type-token ratio with length/id
    # tie-breaks), the production choice over min-id keepers
    from goconnect_spark.queries.dedup import dedup_quality_keepers

    clusters = dedup_connected_components(spark, sf_dir)
    best = dedup_quality_keepers(spark, sf_dir).select(
        F.col("quality_keeper").alias("doc_id"), F.lit(1).alias("is_best")
    )
    non_keepers = (
        clusters.join(best, "doc_id", "left")
        .where(F.col("is_best").isNull())
        .select("doc_id")
    )
    docs2 = docs1.join(non_keepers, "doc_id", "left_anti")
    n2 = docs2.count()

    # 3. quality filter (inline token stats)
    toks = docs2.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(F.col("w") != "")
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_types"),
    )
    good = stats.where((F.col("n_tokens") >= 20) & (F.col("n_types") / F.col("n_tokens") >= 0.05))
    docs3 = docs2.join(good.select("doc_id"), "doc_id", "left_semi")
    n3 = docs3.count()

    # 4. language filter
    docs4 = docs3.where(F.col("lang").isin(*TARGET_LANGS))
    n4 = docs4.count()

    # 4b. source balance: water-fill a 60% token budget across the
    # surviving sources (mixing.waterfill_allocation — small sources
    # taken whole, dominant ones truncated at the common water line),
    # then take each source's share greedily in md5 order so the
    # subsample is deterministic and replayable. The per-source cumsum
    # window parallelizes across sources; a single 100 TB source would
    # use the grouped two-phase cumsum instead (token_budget_sample).
    from goconnect_spark.queries.mixing import waterfill_allocation

    per_src = docs4.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    alloc = waterfill_allocation(per_src).select("source", "cap")
    sized = docs4.select(
        "doc_id", "source", "lang", "text",
        F.size(F.split("text", " ")).cast("long").alias("ntok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w_src = Window.partitionBy("source").orderBy("h", "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    docs5 = (
        sized.join(F.broadcast(alloc), "source")
        .withColumn("cum", F.sum("ntok").over(w_src))
        .where(F.col("cum") <= F.col("cap"))
        .select("doc_id", "source", "lang", "text")
    )
    n5 = docs5.count()

    # 5. deterministic split (no RNG: md5-mod)
    h = F.expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint) % 10")
    split = docs5.withColumn("split", F.when(h == 0, "val").otherwise("train"))

    # 6. pack the train split into 512-token chunks — the same
    # two-phase global cumsum the catalog's sequence_packing uses
    # (an unpartitioned ORDER BY window would funnel the whole corpus
    # through one task; see operators/ranking.py)
    train = split.where(F.col("split") == "train").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    ranged = train.repartitionByRange(F.col("doc_id")).withColumn(
        "pid", F.spark_partition_id()
    )
    totals = ranged.groupBy("pid").agg(F.sum("n_tokens").alias("ptot"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "pid", F.coalesce(F.sum("ptot").over(w_off), F.lit(0)).alias("poff")
    )
    w_in = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packs = (
        ranged.join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(
                (F.col("poff") + F.sum("n_tokens").over(w_in) - F.col("n_tokens")) / CAP
            ).alias("pack_id"),
        )
        .groupBy("pack_id")
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens"))
    )
    n_packs, tok_total = packs.count(), packs.agg(F.sum("tokens")).collect()[0][0]
    n_val = split.where(F.col("split") == "val").count()

    # 7. deterministic epoch shards: every (epoch, pack) gets a
    # pseudorandom rank from md5(epoch:pack_id) -> (shard, position),
    # so any worker recomputes its own shard with no RNG and no
    # coordinator (the mixing.epoch_shard_assignment pattern, applied
    # to packs instead of raw docs)
    from goconnect_spark.operators.ranking import global_row_number

    n_shards = 4
    shard_stats = []
    for epoch in range(2):
        keyed = packs.withColumn(
            "h", F.md5(F.concat(F.lit(f"{epoch}:"), F.col("pack_id").cast("string")))
        )
        ranked = global_row_number(keyed, ["h", "pack_id"], rn_col="rn", with_total=False)
        per_shard = (
            ranked.select(F.expr(f"(rn - 1) % {n_shards}").alias("shard"), "tokens")
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("packs"), F.sum("tokens").alias("tokens"))
            .orderBy("shard")
        )
        shard_stats.append((epoch, per_shard.collect()))

    # 9. corpus-shape report via the mergeable quantile summary
    # (operators/quantiles.py) — the percentile-monitoring state a
    # production intake keeps per source without ever sorting the
    # corpus (exact per-group percentiles hit the single-buffer
    # memory cliff; see SCALING.md r14)
    from goconnect_spark.operators.quantiles import stride_quantiles

    len_q = stride_quantiles(
        docs5.select(
            "doc_id", "source",
            F.size(F.split("text", " ")).cast("double").alias("ntok"),
        ).withColumn("blk", F.col("doc_id") % 8),
        ["source"], "ntok", "doc_id", "blk", 32,
        [("p50", 1, 2), ("p99", 99, 100)],
    ).orderBy("source").collect()

    print(f"corpus funnel ({sf_dir}):")
    print(f"  raw documents      : {n0}")
    print(
        "  pii redacted       : "
        f"{pii_rates.emails} emails, {pii_rates.phones} phones, "
        f"{pii_rates.ips} ips, {pii_rates.cards} valid cards"
    )
    print(f"  after exact dedup  : {n1}  (-{n0 - n1})")
    print(f"  after near-dedup   : {n2}  (-{n1 - n2})")
    print(f"  after quality      : {n3}  (-{n2 - n3})")
    print(f"  after lang filter  : {n4}  (-{n3 - n4})")
    print(f"  after token budget : {n5}  (-{n4 - n5})")
    print(f"  train/val split    : {n5 - n_val}/{n_val}")
    # 8. tokenizer induction on the TRAIN split only (never val — the
    # same leakage rule as any learned artifact): distributed BPE over
    # the vocab-reduced word table (operators/bpe.py)
    from goconnect_spark.operators.bpe import apply_bpe_replace, bpe_merges

    train_docs = split.where(F.col("split") == "train").select("doc_id", "text")
    merges = bpe_merges(train_docs, n_merges=8, min_freq=2)
    # ...then APPLY the trained table across the train split via the replace-chain
    # path (all-codegen string ops — the serving-speed twin of the
    # fold; this train-once/apply-everywhere split is exactly the
    # frozen-table pattern queries/_bpe_frozen.py ships at catalog
    # scale)
    n_bpe_tokens = (
        apply_bpe_replace(train_docs, merges)
        .select(F.sum(F.size("bpe_tokens")).alias("n"))
        .collect()[0]["n"]
    )

    print(f"  packed             : {n_packs} packs, {tok_total} tokens (cap {CAP})")
    print(
        "  bpe merges (train) : "
        + ", ".join(f"{a}+{b}({f})" for a, b, f in merges[:6])
        + (" …" if len(merges) > 6 else "")
    )
    print(f"  bpe tokens (train) : {n_bpe_tokens} after {len(merges)} merges")
    for epoch, rows in shard_stats:
        layout = ", ".join(f"s{r.shard}:{r.packs}p/{r.tokens}t" for r in rows)
        print(f"  epoch {epoch} shards     : {layout}")
    for r in len_q:
        print(
            f"  len summary {r.source:>6}: n={r.n} p50={r.p50:.0f} "
            f"p99={r.p99:.0f} tokens"
        )
    print(f"pipeline completed in {time.time() - t0:.2f} s")
    assert n0 >= n1 >= n2 >= n3 >= n4 >= n5, "funnel must be monotone"
    for _, rows in shard_stats:
        assert sum(r.packs for r in rows) == n_packs, "shards must partition the packs"
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
