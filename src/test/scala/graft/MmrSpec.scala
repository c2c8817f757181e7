package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Knn
import graft.sources.Tables

class MmrSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("lambda = 1.0 degenerates to pure relevance = cosine top-k order") {
    val q = Tables.embeddingQueries(spark, dir)
    val b = Tables.embeddingBase(spark, dir)
    val mmr = Knn.mmrTopK(q, b, k = 5, shortlist = 20, lambdaNum = 10)
      .select(col("query_id"), col("neighbor_id"), col("pick"))
      .as[(Long, Long, Int)].collect().toSet
    val topk = Knn.cosineTopK(q, b, 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(mmr == topk)
  }

  test("picks are 5 distinct neighbors per query, pick 1 is the cosine argmax") {
    val q = Tables.embeddingQueries(spark, dir)
    val b = Tables.embeddingBase(spark, dir)
    val mmr = Knn.mmrTopK(q, b, k = 5).cache()
    val perQuery = mmr.groupBy("query_id")
      .agg(countDistinct(col("neighbor_id")).as("nd"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    assert(perQuery.forall { case (_, nd, n) => nd == 5 && n == 5 })
    val first = mmr.filter(col("pick") === 1)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    val top1 = Knn.cosineTopK(q, b, 1)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    assert(first == top1)
    mmr.unpersist()
  }
}
