package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.HashEmbed

/** Feature-hashed document embeddings: sparse construction invariants
  * and cosine ranking behavior. */
class HashEmbedSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("sparse vectors: bucket counts sum to token counts, buckets within dim") {
    val docs = Seq((1L, "a b a c"), (2L, "d d")).toDF("doc_id", "text")
    val sv = HashEmbed.sparseVectors(docs, "doc_id", "text", dim = 16).collect()
    assert(sv.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    val perDoc = sv.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perDoc == Map(1L -> 4L, 2L -> 2L))
  }

  test("an exact duplicate is the top cosine neighbor at full ppm score") {
    // doc 0 is the query (id % 100 == 0); doc 7 is its verbatim copy —
    // it must rank 1 with cos_ppm = 1_000_000 (identical sparse vectors;
    // norms small enough that the double path is exact)
    val docs = Seq(
      (0L, "alpha beta gamma alpha"), (7L, "alpha beta gamma alpha"),
      (8L, "alpha beta delta x"), (9L, "zeta eta theta iota")
    ).toDF("doc_id", "text")
    val out = HashEmbed.cosineTopK(docs, "doc_id", "text",
      isQuery = col("doc_id") % 100 === 0, dim = 64, k = 3)
      .orderBy("rank").collect()
    assert(out(0).getLong(1) == 7L && out(0).getLong(3) == 1000000L)
    // disjoint-vocabulary doc may only appear with a zero score (hash
    // collisions aside at dim 64 these words land apart)
    val last = out.filter(_.getLong(1) == 9L)
    assert(last.forall(_.getLong(3) == 0L) || last.isEmpty)
  }

  test("tfidf cosine: rare-term overlap outranks common-term overlap") {
    // query shares "zebra" (rare, df=2) with doc 3 and "the" (common,
    // df>half) with doc 5; the common term is pruned, so doc 3 must
    // rank first and doc 5 must not appear at all
    val docs = Seq(
      (0L, "zebra the alpha"),
      (3L, "zebra notes"), (5L, "the the the notes"),
      (6L, "filler words here"), (7L, "other filler text"),
      (8L, "more the filler"), (9L, "the last filler")
    ).toDF("doc_id", "text")
    val out = HashEmbed.tfidfCosineTopK(docs, "doc_id", "text",
      isQuery = col("doc_id") % 100 === 0, k = 5).collect()
    assert(out.nonEmpty && out.head.getLong(1) == 3L,
      s"rare-term doc must rank first: ${out.mkString(",")}")
    assert(!out.exists(_.getLong(1) == 5L),
      "doc sharing only a pruned common term must not be a candidate")
  }

  test("ranking is deterministic under row order permutation") {
    val docs = Seq((0L, "a b c"), (3L, "a b x"), (5L, "a y z"), (6L, "q r s"))
    val a = HashEmbed.cosineTopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      isQuery = col("doc_id") % 100 === 0, dim = 32, k = 4).collect().toSet
    val b = HashEmbed.cosineTopK(docs.reverse.toDF("doc_id", "text"), "doc_id", "text",
      isQuery = col("doc_id") % 100 === 0, dim = 32, k = 4).collect().toSet
    assert(a == b)
  }
}
