package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the composed pipeline a user of
  * this engine runs over a raw document corpus (builder brief north star):
  *
  *   1. quality gate (token-count / avg-token-length / distinct-token
  *      thresholds — the C4-style filter),
  *   2. exact dedup (normalized-text fingerprint, keep smallest id),
  *   3. near-dup kill (MinHash-LSH verified-Jaccard pairs; the larger id
  *      of each surviving pair is dropped),
  *   4. language tag (stopword argmax).
  *
  * Every stage is a pure DataFrame transform from this library — the whole
  * pipeline is one lazy plan per stage boundary, no driver-side loops, and
  * each stage's shuffle key (fingerprint, band hash) is the natural
  * partition key at 100 TB.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 10,
      maxTokens: Int = 1000,
      minAvgTokenLen: Double = 2.0,
      minDistinctTokens: Int = 5,
      minhashShingle: Int = 3,
      nearDupThreshold: Double = 0.8)

  /** Near-dup kill strategies: MinHash banding (probabilistic, the 100 TB
    * path) or blocked exact Jaccard (deterministic — oracle-checkable). */
  sealed trait NearDup
  case object MinHashKill extends NearDup
  final case class BlockedKill(blockCols: Seq[String]) extends NearDup

  /** Returns the curated corpus: (doc_id, text, pred_lang, n_tokens). */
  def curate(docs: DataFrame, cfg: Config = Config(),
      nearDup: NearDup = MinHashKill): DataFrame = {
    val t = col("text")
    // 1. quality gate
    val gated = docs.filter(
      TextFunctions.tokenCount(t).between(cfg.minTokens, cfg.maxTokens) &&
        TextFunctions.avgTokenLen(t) >= cfg.minAvgTokenLen &&
        TextFunctions.distinctTokenCount(t) >= cfg.minDistinctTokens)
    // 2. exact dedup: keep the smallest doc_id per fingerprint
    val keepers = gated
      .select(col("doc_id"), TextFunctions.fingerprint(t).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // materialized once (localCheckpoint): consumed three times (both
    // sides of the near-dup pair join and the survivor anti-join) —
    // without it the quality-gate HOFs and fingerprint hash re-evaluate
    // per consumer. localCheckpoint instead of cache so the copy is
    // released by the ContextCleaner when the result is dropped, not
    // pinned across invocations. (On a multi-executor cluster prefer a
    // reliable checkpoint dir if executor loss must be survivable.)
    val deduped = gated.join(keepers, Seq("doc_id"), "left_semi").localCheckpoint()
    // 3. near-dup kill: drop the larger id of each verified pair
    val pairs = nearDup match {
      case MinHashKill => Dedup.minHashNearDup(deduped, "doc_id", "text",
        shingleSize = cfg.minhashShingle, threshold = cfg.nearDupThreshold)
      case BlockedKill(blockCols) => Dedup.ngramJaccardBlocked(deduped, "doc_id", "text",
        blockCols, cfg.minhashShingle, cfg.nearDupThreshold)
    }
    // kill list size is proportional to the corpus dup rate — unbounded
    // at 100 TB, so no broadcast hint; AQE broadcasts the anti-join build
    // side at runtime whenever it measures small
    val kill = pairs.select(col("id_b").as("doc_id")).distinct()
    val survivors = deduped.join(kill, Seq("doc_id"), "left_anti")
    // 4. language tag
    survivors.select(
      col("doc_id"), col("text"),
      TextFunctions.langId(t).as("pred_lang"),
      TextFunctions.tokenCount(t).as("n_tokens"))
  }

  /** Per-stage retention counts — the pipeline's health dashboard. */
  def stats(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val total = docs.count()
    val curated = curate(docs, cfg).count()
    Seq(("input", total), ("curated", curated)).toDF("stage", "n_docs")
  }
}
