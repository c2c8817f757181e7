package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide guard for the round-4 verdict's "global single-partition
  * window over data-sized input" class: every registered query's
  * optimized plan is scanned for unpartitioned Window nodes
  * ([[graft.tools.WindowAudit.globalWindows]]), and any query found is
  * only tolerated if it appears in the allowlist below with a reason its
  * window input is BOUNDED (constant- or calendar-cardinality, never
  * proportional to corpus size). Data-sized ranks must instead go
  * through `Eval.withGlobalRowNumber` (range-partitioned parallel
  * prefix count) — see rfm_users / rrf_fuse / pareto_80_20 /
  * gini_customer_spend / equi_depth_histogram for the pattern.
  */
class WindowAuditSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"

  /** Queries whose unpartitioned windows run over provably bounded
    * inputs. Keep each entry honest: the bound must not grow with the
    * corpus. */
  val boundedWindowAllowlist: Map[String, String] = Map(
    "autocorr_daily_revenue" -> "lag over the DAILY revenue series — calendar-cardinality",
    "benford_digits" -> "share-of-total over exactly 9 leading-digit rows",
    "cumulative_distinct_users" -> "running total over the DAILY first-seen series — calendar-cardinality",
    "cusum_changepoint" -> "prefix sum + running min over the DAILY revenue series — calendar-cardinality",
    "bitext_mix_compose" -> "cumulative quota over the per-DOMAIN aggregate (sources + language-pair bitext domains) — domain-cardinality",
    "hybrid_rerank" -> "rerank rank over the top-50 fused shortlist — constant by construction (TakeOrdered feeds it)",
    "index_advisor" -> "rank over 4 candidate layout strategies — constant",
    "metrics_gapfill" -> "LOCF over one minute-bucket grid — elapsed-time cardinality, not row count",
    "token_budget_mix" -> "cumulative quota over the per-DOMAIN aggregate — domain-cardinality",
    "weekly_seasonality" -> "share-of-total over exactly 7 weekday rows")

  test("no registered query has an unpartitioned window over data-sized input") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val hits =
        try tools.WindowAudit.globalWindows(fn(spark, dir))
        catch { case e: Throwable => Seq(s"PLAN ERROR ${e.getClass.getSimpleName}") }
      if (hits.nonEmpty && !boundedWindowAllowlist.contains(name))
        Some(s"$name: ${hits.mkString(" ")}")
      else None
    }
    assert(offenders.isEmpty,
      "global windows outside the bounded allowlist (de-globalize via " +
        "Eval.withGlobalRowNumber or justify in boundedWindowAllowlist):\n" +
        offenders.mkString("\n"))
  }

  test("runtime guard: a data-sized input reaching a global window throws") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val seeded = SparkTestSession.spark.range(0, 5000).toDF("id")
      .withColumn("rn", row_number().over(Window.orderBy(col("id"))))
      .transform(graft.functions.Guards.boundedWindow(_, "seeded-violation", bound = 1000))
    val e = intercept[Throwable](seeded.count())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("window-guard:seeded-violation")),
      s"guard did not fire; got: $e")
  }

  test("runtime guard: a bounded input passes through unchanged") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ok = SparkTestSession.spark.range(0, 500).toDF("id")
      .withColumn("rn", row_number().over(Window.orderBy(col("id"))))
      .transform(graft.functions.Guards.boundedWindow(_, "bounded-ok", bound = 1000))
    assert(ok.count() == 500)
  }

  test("allowlist carries no stale entries") {
    val stale = boundedWindowAllowlist.keys.filterNot { name =>
      SparkEntry.queries.get(name).exists { fn =>
        try tools.WindowAudit.globalWindows(fn(spark, dir)).nonEmpty
        catch { case _: Throwable => true }
      }
    }
    assert(stale.isEmpty, s"allowlisted queries no longer have global windows: $stale")
  }
}
