package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Native codegen kernels must be bit-identical to the HOF reference
  * formulation (same double promotion, same accumulation order). */
class VectorExprSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("native l2sq/dot match HOF versions bit-for-bit on fixture pairs") {
    val e = Tables.embeddings(spark, dir).limit(50).cache()
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("vb")))
    val diff = pairs.select(
      l2sq(col("va"), col("vb")).as("n_l2"),
      l2sqHof(col("va"), col("vb")).as("h_l2"),
      dot(col("va"), col("vb")).as("n_dot"),
      dotHof(col("va"), col("vb")).as("h_dot"))
      .filter(col("n_l2") =!= col("h_l2") || col("n_dot") =!= col("h_dot"))
    assert(diff.count() == 0)
  }

  test("fused cosine matches the composed formulation bit-for-bit") {
    val e = Tables.embeddings(spark, dir).limit(50).cache()
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("vb")))
    val diff = pairs.select(
      cosine(col("va"), col("vb")).as("f"),
      cosineComposed(col("va"), col("vb")).as("c"))
      .filter(col("f") =!= col("c"))
    assert(diff.count() == 0)
  }

  test("native kernels handle nulls and empty arrays") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("a", "b")
    val out = df.select(l2sq(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 8.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("interpreted eval (non-codegen path) agrees too") {
    val df = Seq((Array(1.0f, 1.0f), Array(2.0f, 3.0f))).toDF("a", "b")
    // force interpreted path through a filter on the expression value
    val v = df.select(l2sq(col("a"), col("b")).as("d")).collect()(0).getDouble(0)
    assert(v == 5.0)
  }

  test("sorted-merge intersect count equals array_intersect semantics") {
    import graft.functions.GraftFunctions.sortedIntersectCount
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L, 10L)), // overlap 2
      (Array.empty[Long], Array(1L, 2L)), // empty side
      (Array(7L), Array(7L)) // exact match
    ).toDF("a", "b")
    val out = df.select(sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect().map(_.getInt(0)).toList
    assert(out == List(2, 0, 1))
  }

  test("fused ADC table kernel matches the per-entry l2sq formulation") {
    // m=2, ksub=2, dsub=2 over an int64 vector; cb[(sub*ksub+code)*dsub+j]
    val cb = Array(
      Array(Array(1L, 2L), Array(3L, -4L)), // sub 0
      Array(Array(0L, 0L), Array(-5L, 6L))) // sub 1
    val df = Seq((0L, Seq(10L, 20L, 30L, 40L))).toDF("id", "rv")
    val out = df.select(graft.index.PqTestAccess.adcTable(col("rv"), cb, 2).as("qd"))
      .collect()(0).getAs[scala.collection.Seq[Long]](0)
    def l2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(out.toList == List(
      l2(Seq(10L, 20L), Seq(1L, 2L)), l2(Seq(10L, 20L), Seq(3L, -4L)),
      l2(Seq(30L, 40L), Seq(0L, 0L)), l2(Seq(30L, 40L), Seq(-5L, 6L))))
    // wrong-dimension vector must raise, not silently mis-slice
    val bad = Seq((0L, Seq(10L, 20L, 30L))).toDF("id", "rv")
    val e = intercept[Exception] {
      bad.select(graft.index.PqTestAccess.adcTable(col("rv"), cb, 2).as("qd")).collect()
    }
    assert(e.getMessage != null)
  }

  test("fused minhash-bands kernel matches the Scala replica pipeline") {
    import graft.text.Dedup
    val texts = Seq("a b c d e f", "a b c", "x")
    val numHashes = 16; val numBands = 4
    val coeffA = Array.tabulate(numHashes)(Dedup.minHashCoeffA)
    val coeffB = Array.tabulate(numHashes)(Dedup.minHashCoeffB)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val ph = graft.text.TextFunctions.withShingles(df, "text", 1, "sh")
      .select(col("id"), transform(col("sh"), x =>
        graft.functions.PolyHash.column(x, 257L, Dedup.MinHashMod)).as("ph"))
    val kernel = ph.select(col("id"),
      graft.functions.GraftFunctions.minhashBands(
        col("ph"), coeffA, coeffB, numBands, Dedup.MinHashMod).as("bh"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]](1).toList).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val expected = Dedup.bandHashesScala(
        Dedup.minHashSigScala(Dedup.shingleSet(t, 1), numHashes), numBands).toList
      assert(kernel(i.toLong) == expected, s"doc $i")
    }
  }

  test("distance kernels raise on vector dimension mismatch") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    for (kernel <- Seq(l2sq(col("a"), col("b")), dot(col("a"), col("b")),
        cosine(col("a"), col("b")))) {
      val e = intercept[Exception] { df.select(kernel).collect() }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(t =>
        t.getMessage != null && t.getMessage.contains("dimension mismatch")),
        s"expected a dimension-mismatch failure, got: $e")
    }
  }

  test("int64 ADC lookup sums the right table entries and guards shape") {
    import graft.functions.GraftFunctions.pqAdcLong
    // m=2, ksub=3: table idx j*3+code
    val df = Seq((Array(10L, 20L, 30L, 40L, 50L, 60L), Array(2, 0)))
      .toDF("qd", "codes")
    val v = df.select(pqAdcLong(col("qd"), col("codes"), 3).as("d"))
      .collect()(0).getLong(0)
    assert(v == 30L + 40L)
    // mismatched shape must raise, not silently mis-index
    val bad = Seq((Array(10L, 20L, 30L), Array(2, 0))).toDF("qd", "codes")
    val e = intercept[Exception] {
      bad.select(pqAdcLong(col("qd"), col("codes"), 3).as("d")).collect()
    }
    assert(e.getMessage != null)
  }
}
