package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.CorpusPipeline
import graft.sources.Tables

class CorpusPipelineSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("pipeline drops low-quality, exact-dup, and near-dup docs; keeps the rest") {
    val good = "the quick brown fox jumps over the lazy dog every single morning again"
    val docs = Seq(
      (1L, good),
      (2L, good), // exact dup of 1 → dropped
      (3L, good + " extra"), // near-dup of 1 at 1-gram jaccard ≥ 0.8 → dropped
      (4L, "short text"), // fails min-token gate
      (5L, "completely different words about distributed query engines running on clusters today")
    ).toDF("doc_id", "text")
    val cfg = CorpusPipeline.Config(minhashShingle = 1, nearDupThreshold = 0.8)
    val out = CorpusPipeline.curate(docs, cfg).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 5L))
  }

  test("minhash and blocked kills agree on the fixture corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cfg = CorpusPipeline.Config(minhashShingle = 1, nearDupThreshold = 0.8)
    val viaMinhash = CorpusPipeline.curate(docs, cfg, CorpusPipeline.MinHashKill)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaBlocked = CorpusPipeline.curate(docs, cfg,
        CorpusPipeline.BlockedKill(Seq("lang", "source")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // minhash searches globally (no blocks) so it can only kill MORE pairs
    assert(viaMinhash.subsetOf(viaBlocked))
    assert(viaMinhash.nonEmpty)
  }

  test("stats reports input vs curated counts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val s = CorpusPipeline.stats(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s("input") == 500 && s("curated") > 0 && s("curated") <= 500)
  }
}
