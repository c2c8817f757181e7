package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-5 stats/eval additions: the CUSUM
  * closed form is replayed against the sequential recurrence on the
  * driver, and the calibration / agreement / coverage queries are held
  * to their mathematical invariants (bin partition, bounds,
  * monotonicity). The oracle gate checks engine-vs-DuckDB equality;
  * these check the MATH is the one claimed. */
class StatsQuerySpec extends AnyFunSuite {
  import SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"

  test("cusum_changepoint closed form equals the sequential CUSUM recurrence") {
    val rows = SparkEntry.queries("cusum_changepoint")(spark, dir)
      .select("day", "x", "cusum", "flag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    assert(rows.length > 1000)
    val xs = rows.map(_._2)
    val n = xs.length
    val mu = {
      val sx = xs.sum
      (sx - (((sx % n) + n) % n)) / n // exact floor-mean, matches the query
    }
    var s = 0L
    rows.foreach { case (_, x, cusum, flag) =>
      s = math.max(0L, s + (x - mu)) // the textbook one-sided recurrence
      assert(cusum == s, s"closed form diverged at day with x=$x")
      assert(flag == (if (s > mu) 1 else 0))
    }
    assert(rows.exists(_._4 == 1) || rows.forall(_._4 == 0)) // flag column is well-typed
  }

  test("ece_calibration bins partition the corpus and respect bounds") {
    val bins = SparkEntry.queries("ece_calibration")(spark, dir)
      .select("bin", "n", "n_pos", "conf_ppm", "acc_ppm", "gap_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val nVecs = graft.sources.Tables.embeddings(spark, dir).count()
    assert(bins.map(_._2).sum == nVecs, "bins must partition every scored vector")
    assert(bins.map(_._1).distinct.length == bins.length)
    bins.foreach { case (bin, n, nPos, conf, acc, gap) =>
      assert(bin >= 0 && bin <= 9)
      assert(nPos >= 0 && nPos <= n)
      assert(conf >= bin * 100000 - 1 && conf <= 1000000)
      assert(acc >= 0 && acc <= 1000000)
      assert(gap == math.abs(conf - acc))
    }
    // mean confidence is monotone over equal-width bins by construction
    assert(bins.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("kappa_classifiers agrees with a driver-side replay of the census") {
    val Array(row) = SparkEntry.queries("kappa_classifiers")(spark, dir)
      .select("n", "agree", "kappa_ppm").collect()
    val (n, agree, kappa) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val nQueries = graft.sources.Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.expr("vec_id % 20 = 0")).count()
    assert(n == nQueries, "every held-out query must be classified by both raters")
    assert(agree >= 0 && agree <= n)
    assert(kappa >= -1000000 && kappa <= 1000000)
  }

  test("vocab_coverage is monotone in k and bounded by the corpus") {
    val rows = SparkEntry.queries("vocab_coverage")(spark, dir)
      .select("vocab_k", "covered", "total", "coverage_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(100L, 1000L, 10000L))
    assert(rows.map(_._3).distinct.length == 1, "one shared occurrence total")
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    rows.foreach { case (_, covered, total, ppm) =>
      assert(covered <= total)
      assert(ppm == covered * 1000000L / total)
    }
    // a 10k-word vocab should dominate a synthetic-corpus token stream
    assert(rows.last._4 > 500000, "top-10000 words cover under half the corpus?")
  }

  test("xcorr_event_types emits every lag with a bounded correlation") {
    val rows = SparkEntry.queries("xcorr_event_types")(spark, dir)
      .select("lag", "n", "r_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 7L))
    // longer lags can only shrink the overlapping day window
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    rows.foreach { case (_, n, r) =>
      assert(n > 10, "the 30-day grids must overlap substantially")
      assert(r >= -1000000 && r <= 1000000)
    }
  }
}
