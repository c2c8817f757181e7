package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch.Sketch

class QuantileSketchSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("no compaction below capacity: exact order statistics, zero error bound") {
    val s = (1L to 100L).foldLeft(Sketch.empty(64))(_.add(_))
    assert(s.errBound == 0L)
    assert(s.n == 100L)
    assert(s.query(0) == 1L && s.query(49) == 50L && s.query(99) == 100L)
  }

  test("carried bound holds under compaction for every quantile, any order") {
    val n = 5000
    for (vals <- Seq((1 to n).map(_.toLong), (1 to n).reverse.map(_.toLong),
        (1 to n).map(i => ((i * 2654435761L) % n) + 1))) {
      val s = vals.foldLeft(Sketch.empty(16))(_.add(_))
      assert(s.errBound > 0L) // compactions happened at this k
      for (target <- Seq(0L, 1249L, 2499L, 3749L, 4999L)) {
        val est = s.query(target)
        // values are a permutation of 1..n: true rank interval of est is
        // [est-1, est-1] (0-indexed)
        assert(math.abs((est - 1) - target) <= s.errBound,
          s"target $target est $est bound ${s.errBound}")
      }
    }
  }

  test("merge: bounds add, count is exact, queries stay within bound") {
    val a = (1L to 3000L).foldLeft(Sketch.empty(32))(_.add(_))
    val b = (3001L to 6000L).foldLeft(Sketch.empty(32))(_.add(_))
    val m = a.merge(b)
    assert(m.n == 6000L)
    assert(m.errBound >= math.max(a.errBound, b.errBound))
    for (target <- Seq(0L, 2999L, 5999L)) {
      val est = m.query(target)
      assert(math.abs((est - 1) - target) <= m.errBound)
    }
  }

  test("native groupBy aggregate: exact when small, bound holds per group when compacted") {
    import org.apache.spark.sql.functions._
    // group a: 1..50 (fits k=64 buffer — exact); group b: permutation of
    // 1..5000 at k=16 (forces compaction + cross-partition merges)
    val rows = (1L to 50L).map(("a", _)) ++
      (1L to 5000L).map(i => ("b", ((i * 48271L) % 5000) + 1))
    val df = rows.toDF("g", "v").repartition(8)
    val out = df.groupBy(col("g"))
      .agg(graft.functions.GraftFunctions
        .quantileSketchAgg(col("v"), 64, Seq(0, 5000, 10000)).as("sk"))
      .select(col("g"), col("sk.n"), col("sk.err_bound"), col("sk.ests"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    val (na, erra, estsA) = out("a")
    assert(na == 50L && erra == 0L)
    // targets (0-indexed): 0, (49·5000)/10000 = 24, 49 → values 1, 25, 50
    assert(estsA == Seq(1L, 25L, 50L)) // exact order statistics below capacity
    val (nb, errb, estsB) = out("b")
    assert(nb == 5000L)
    // group b values are a permutation of 1..5000: true rank of est = est-1
    for ((est, target) <- estsB.zip(Seq(0L, 2499L, 4999L)))
      assert(math.abs((est - 1) - target) <= errb,
        s"est $est target $target bound $errb")
  }

  test("checkedQuantiles: within_bound true on a distributed column") {
    val df = (1 to 20000).map(i => ((i * 48271L) % 20000)).toDF("v")
      .repartition(8)
    val got = graft.operators.QuantileSketch
      .checkedQuantiles(spark, df, "v", k = 64, qBps = Seq(1000, 5000, 9000))
      .collect()
    assert(got.length == 3)
    assert(got.forall(_.getBoolean(2)), got.mkString(";"))
  }
}
