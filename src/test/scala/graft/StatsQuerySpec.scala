package graft

import org.apache.spark.sql.functions.{col, to_timestamp}
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

  test("mann_kendall_trend matches a driver-side replay of S, ties and z") {
    val Array(row) = SparkEntry.queries("mann_kendall_trend")(spark, dir)
      .select("n_days", "s_stat", "var_num", "z_ppm", "trend").collect()
    val (nd, s, varNum, zPpm, trend) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getInt(4))
    // rebuild the daily series exactly as the query does
    val xs = SparkEntry.queries("cusum_changepoint")(spark, dir)
      .select("day", "x").collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    assert(nd == xs.length)
    var sRef = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length)
      sRef += java.lang.Long.signum(xs(j) - xs(i))
    assert(s == sRef)
    val tieAdj = xs.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val n = nd
    assert(varNum == math.max(1L, n * (n - 1) * (2 * n + 5) - tieAdj))
    val zc = if (s > 0) s - 1 else if (s < 0) s + 1 else 0L
    assert(zPpm == math.floor(1000000.0 * zc / math.sqrt(varNum / 18.0)).toLong)
    assert(trend == (if (zPpm >= 1960000L) 1 else if (zPpm <= -1960000L) -1 else 0))
  }

  test("theil_sen_slope is the lower median of the pairwise floor-div slopes") {
    val Array(row) = SparkEntry.queries("theil_sen_slope")(spark, dir)
      .select("n_pairs", "slope_med_u").collect()
    val (m, med) = (row.getLong(0), row.getLong(1))
    val daily = SparkEntry.queries("cusum_changepoint")(spark, dir)
      .select("day", "x").collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)).toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield {
      val num = (daily(j)._2 - daily(i)._2) * 1000000L
      val dd = daily(j)._1 - daily(i)._1
      Math.floorDiv(num, dd) // the pmod-adjusted div in both engines IS floorDiv
    }).sorted
    assert(m == slopes.length && m == daily.length.toLong * (daily.length - 1) / 2)
    assert(med == slopes(((m + 1) / 2 - 1).toInt), "lower median at rank (m+1) div 2")
  }

  test("ks_two_sample matches an exact driver-side D over the pooled values") {
    val Array(row) = SparkEntry.queries("ks_two_sample")(spark, dir)
      .select("n_a", "n_b", "d_ppm", "at_cents").collect()
    val (n1, n2, dPpm, atV) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    import org.apache.spark.sql.functions.{col, expr}
    val o = graft.sources.Tables.orders(spark, dir).select(col("o_custkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
    val c = graft.sources.Tables.customer(spark, dir).select(col("c_custkey"),
      (col("c_mktsegment") === "BUILDING").cast("long").as("a"))
    val vals = o.join(c, col("o_custkey") === col("c_custkey"))
      .select("v", "a").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(n1 == vals.count(_._2 == 1L) && n2 == vals.count(_._2 == 0L))
    var (c1, c2, best, bestV) = (0L, 0L, -1L, Long.MaxValue)
    vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      c1 += g.count(_._2 == 1L); c2 += g.count(_._2 == 0L)
      val d = math.abs(c1 * n2 - c2 * n1)
      if (d > best) { best = d; bestV = v }
    }
    assert(dPpm == 1000000L * best / (n1 * n2))
    assert(atV == bestV)
    assert(dPpm >= 0 && dPpm <= 1000000L)
  }

  test("trend detectors survive degenerate synthetic series (tie guard, flat slopes)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_edge_trend").toString
    // 4 days of IDENTICAL revenue: every pair ties, so the Mann-Kendall
    // variance numerator collapses to zero and only the greatest(1, …)
    // guard keeps z defined
    (1 to 4).map(d => (d.toLong, 10.0, s"2024-01-0$d 00:00:00"))
      .toDF("o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.parquet(tmp + "/orders.parquet")
    val Array(mk) = SparkEntry.queries("mann_kendall_trend")(spark, tmp)
      .select("n_days", "s_stat", "var_num", "z_ppm", "trend").collect()
    assert(mk.getLong(0) == 4 && mk.getLong(1) == 0)
    assert(mk.getLong(2) == 1, "all-tied series must hit the variance guard")
    assert(mk.getLong(3) == 0 && mk.getInt(4) == 0)
    val Array(ts) = SparkEntry.queries("theil_sen_slope")(spark, tmp)
      .select("n_pairs", "slope_med_u").collect()
    assert(ts.getLong(0) == 6 && ts.getLong(1) == 0, "flat series → zero slope")
  }

  test("ks_two_sample with an empty segment reports d_ppm 0, no division error") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_edge_ks").toString
    Seq((1L, 10.0, "2024-01-01 00:00:00"), (2L, 20.0, "2024-01-02 00:00:00"))
      .toDF("o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .write.parquet(tmp + "/orders.parquet")
    // no customer is in the BUILDING segment → n_a = 0
    Seq((1L, "MACHINERY"), (2L, "FURNITURE"))
      .toDF("c_custkey", "c_mktsegment")
      .write.parquet(tmp + "/customer.parquet")
    val Array(row) = SparkEntry.queries("ks_two_sample")(spark, tmp)
      .select("n_a", "n_b", "d_ppm").collect()
    assert(row.getLong(0) == 0 && row.getLong(1) == 2 && row.getLong(2) == 0)
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
