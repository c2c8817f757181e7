package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.text.LateInteraction

class LateInteractionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("maxsim kernel equals the naive sum-of-best-dots") {
    val q = Seq(Seq(Seq(1L, 2L), Seq(-3L, 4L)))
    val d = Seq(Seq(Seq(10L, 0L), Seq(0L, 10L), Seq(-1L, -1L)))
    val got = q.zip(d).toDF("qv", "dv")
      .select(GraftFunctions.maxSimScore(col("qv"), col("dv")))
      .as[Long].head()
    val naive = q.head.map(qv =>
      d.head.map(dv => qv.zip(dv).map { case (a, b) => a * b }.sum).max).sum
    assert(got == naive) // max(10,20,-3) + max(-30,40,-1) = 20 + 40
    assert(got == 60L)
  }

  test("maxsim with an empty doc bag scores 0") {
    val got = Seq((Seq(Seq(1L, 2L)), Seq.empty[Seq[Long]])).toDF("qv", "dv")
      .select(GraftFunctions.maxSimScore(col("qv"), col("dv")))
      .as[Long].head()
    assert(got == 0L)
  }

  test("late-interaction top-k: token scatter still matches, self excluded") {
    // doc 100 contains both query tokens of query 0 (scattered); doc 101
    // shares one; doc 102 none of them
    val docs = Seq(
      (0L, "alpha beta"),
      (100L, "alpha filler1 filler2 beta"),
      (101L, "alpha zeta eta theta"),
      (102L, "iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val out = LateInteraction.maxSimTopK(
        docs.filter(col("doc_id") === 0), docs, "doc_id", "text", qLen = 2, k = 3)
      .orderBy("rank").collect()
    assert(out.forall(_.getLong(0) == 0L))
    assert(!out.exists(_.getLong(1) == 0L), "query doc must not match itself")
    // the doc containing BOTH query tokens must outrank the one-token doc:
    // a shared token contributes its (large) self dot product
    val ranked = out.map(_.getLong(1)).toSeq
    assert(ranked.indexOf(100L) < ranked.indexOf(101L))
  }
}
