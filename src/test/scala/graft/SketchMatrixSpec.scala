package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Bitmap, Gram, SpaceSaving}

class SketchMatrixSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ——— Gram matrix ———

  test("gram: matches the brute-force upper triangle on a small matrix") {
    val vecs = Seq(
      Array(1.0f, 2.0f, 3.0f),
      Array(-1.0f, 0.5f, 2.0f),
      Array(0.0f, -2.5f, 1.0f))
    val df = vecs.toDF("v")
    val got = Gram.upperTriangle(spark, df, "v", scale = 2L)
      .as[(Int, Int, Long)].collect().toSet
    // quantized rows at scale 2 (floor(v*2 + 0.5)): (2,4,6), (-2,1,4), (0,-5,2)
    val q = Seq(Seq(2L, 4L, 6L), Seq(-2L, 1L, 4L), Seq(0L, -5L, 2L))
    val want = (for {
      i <- 0 until 3
      j <- i until 3
    } yield (i + 1, j + 1, q.map(r => r(i) * r(j)).sum)).toSet
    assert(got == want)
  }

  test("gram: partition layout does not change the result") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(4)(rnd.nextFloat() * 2 - 1))
    val one = Gram.upperTriangle(spark, vecs.toDF("v").repartition(1), "v", 1024L)
      .as[(Int, Int, Long)].collect().toSet
    val many = Gram.upperTriangle(spark, vecs.toDF("v").repartition(13), "v", 1024L)
      .as[(Int, Int, Long)].collect().toSet
    assert(one == many)
    assert(one.size == 4 * 5 / 2)
  }

  test("gram: ragged vectors are rejected, empty input yields empty triangle") {
    val ragged = Seq(Array(1.0f, 2.0f), Array(1.0f)).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      Gram.upperTriangle(spark, ragged.repartition(1), "v", 2L).collect()
    }
    assert(e.getMessage.contains("ragged") || e.getCause != null)
    val empty = Seq.empty[Array[Float]].toDF("v")
    assert(Gram.upperTriangle(spark, empty, "v", 2L).count() == 0)
  }

  test("pca projection: recovers the dominant axis and is layout-invariant") {
    // data hugely stretched along dim 2: top component ≈ e2, so the
    // projection must order rows by their dim-2 coordinate
    val vecs = Seq(
      (1L, Array(0.1f, 8.0f, 0.2f)),
      (2L, Array(0.3f, -6.0f, 0.1f)),
      (3L, Array(-0.2f, 2.0f, 0.4f)),
      (4L, Array(0.0f, -1.0f, -0.3f)))
    val df = vecs.toDF("id", "v")
    val got = Gram.topComponentProject(spark, df, "id", "v", scale = 1024L)
      .as[(Long, Long)].collect().toMap
    val byProj = got.toSeq.sortBy(_._2).map(_._1)
    // sign of the direction is arbitrary but consistent: order matches
    // dim-2 order either ascending or descending
    assert(byProj == Seq(2L, 4L, 3L, 1L) || byProj == Seq(1L, 3L, 4L, 2L))
    val repart = Gram.topComponentProject(spark, df.repartition(7), "id", "v", 1024L)
      .as[(Long, Long)].collect().toMap
    assert(repart == got)
  }

  // ——— Bitmap ———

  test("bitmap: AND popcounts equal the exact id-set intersection") {
    val ids = (0L until 500L).toDF("id")
    val a = Bitmap.build(ids, "id", col("id") % 3 === 0)
    val b = Bitmap.build(ids, "id", col("id") % 5 === 0)
    val nBoth = Bitmap.and(a, b).agg(sum("n_both")).as[Long].head()
    assert(nBoth == (0L until 500L).count(i => i % 3 == 0 && i % 5 == 0))
  }

  test("bitmap: block words reconstruct the exact member ids") {
    val ids = Seq(0L, 1L, 31L, 32L, 33L, 95L, 96L).toDF("id")
    val words = Bitmap.build(ids, "id", lit(true))
      .as[(Long, Long)].collect().toMap
    val members = words.toSeq.flatMap { case (blk, w) =>
      (0 until 32).filter(b => (w >> b & 1L) == 1L).map(b => blk * 32 + b)
    }.toSet
    assert(members == Set(0L, 1L, 31L, 32L, 33L, 95L, 96L))
  }

  // ——— Space-saving ———

  test("space-saving: exact when capacity covers the key space") {
    val s = Seq(1L, 1L, 2L, 3L, 3L, 3L).foldLeft(SpaceSaving.Summary.empty(8))(_.add(_))
    assert(s.estimate(1L) == 2L && s.estimate(2L) == 1L && s.estimate(3L) == 3L)
    assert(s.estimate(99L) == 0L) // not full → absent means absent
  }

  test("space-saving: guarantee holds under eviction and merge") {
    val rnd = new scala.util.Random(3)
    // zipfish: key k with frequency ~ 1/k over 40 keys, 4000 draws
    val draws = Seq.fill(4000)((math.pow(rnd.nextDouble(), 3.0) * 40).toLong)
    val truth = draws.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 12
    val slack = draws.size.toLong / cap
    // split into 7 chunks, summarize each, merge pairwise in tree order
    val parts = draws.grouped(600).map(
      _.foldLeft(SpaceSaving.Summary.empty(cap))(_.add(_))).toSeq
    val merged = parts.reduce(_.merge(_))
    truth.foreach { case (k, n) =>
      val est = merged.estimate(k)
      assert(est >= n, s"key $k: est $est below true $n")
      assert(est - n <= slack, s"key $k: est $est exceeds true $n + $slack")
    }
  }

  test("space-saving heavy hitters: top-k of events-shaped data all in bound") {
    val rows = (0L until 2000L).map(i => (i % 37, i)).toDF("user_id", "event_id")
    val got = SpaceSaving.heavyHitters(spark, rows, "user_id", capacity = 16, k = 5)
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == 5)
    assert(got.forall(_._3), s"bound violated: ${got.mkString(", ")}")
  }
}
