package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Eval

class EvalSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("exclusive prefix sum matches the single-partition reference on unique keys") {
    val df = Seq((5L, 10L), (1L, 1L), (3L, 100L), (9L, 7L), (2L, 2L))
      .toDF("k", "v")
    val got = Eval.withExclusivePrefixSum(df, "k", "v", "pre")
      .select("k", "pre").as[(Long, Long)].collect().toMap
    // ascending by k: 1(+1) 2(+2) 3(+100) 5(+10) 9(+7), exclusive
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 5L -> 103L, 9L -> 113L))
  }

  test("grouped row_number matches the per-group single-partition reference") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 3 groups × 200 rows with colliding sort values (user_id tiebreak),
    // enough rows that the range shuffle spans many partitions
    val df = spark.range(600)
      .select((col("id") % 3).cast("int").as("g"), col("id").as("user_id"),
        (col("id") * 37 % 11).as("key"))
    val want = df.withColumn("rn", row_number()
        .over(Window.partitionBy("g").orderBy("key", "user_id")).cast("long"))
      .select("g", "user_id", "rn").as[(Int, Long, Long)].collect().toSet
    // smallMaxRows = 0 forces the range-shuffle prefix machine;
    // the default takes the measured-small window path — both must agree
    for (threshold <- Seq(0L, 100000L)) {
      val got = Eval.withGroupedRowNumber(df, "g",
          Seq(col("key"), col("user_id")), "rn", smallMaxRows = threshold)
        .select("g", "user_id", "rn").as[(Int, Long, Long)].collect().toSet
      assert(got == want, s"smallMaxRows=$threshold")
    }
  }

  test("grouped row_number: empty input returns empty, not an analysis error") {
    import org.apache.spark.sql.functions._
    val empty = spark.range(0).select(col("id").cast("int").as("g"),
      col("id").as("user_id"))
    val out = Eval.withGroupedRowNumber(empty, "g", Seq(col("user_id")), "rn")
    assert(out.columns.contains("rn") && out.count() == 0L)
  }

  test("grouped row_number rejects group ids outside [0, 2^32)") {
    import org.apache.spark.sql.functions._
    val neg = spark.range(5).select(lit(-1).as("g"), col("id").as("user_id"))
    val e = intercept[IllegalArgumentException] {
      Eval.withGroupedRowNumber(neg, "g", Seq(col("user_id")), "rn").collect()
    }
    assert(e.getMessage.contains("outside [0, 2^32)"))
  }

  test("aucBps: hand-computed Mann-Whitney with ties") {
    // pos scores {3,3,5}, neg {1,3,4}: wins = 5, ties = 2 → u2 = 12,
    // denominator = 2·3·3 = 18 → auc = 12/18 = 0.6666…
    val df = Seq((3L, 1L), (3L, 1L), (5L, 1L), (1L, 0L), (3L, 0L), (4L, 0L))
      .toDF("score", "pos")
    val r = Eval.aucBps(df, "score", "pos").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 12L, 6666L)))
  }

  test("linear attribution conserves exactly 10000 bps per attributed purchase") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("attribution_linear")(spark, dir)
    val totalBps = out.agg(sum("total_bps")).head().getLong(0)
    // attributed purchases = purchases with ≥1 touch in the window
    val ev = graft.sources.Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"),
        col("event_id").as("pe"))
    val t = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_millis(col("ts")).as("t_ms"))
    val attributed = p.join(t, Seq("user_id"))
      .filter(col("t_ms") <= col("p_ms") &&
        col("t_ms") > col("p_ms") - 604800000L)
      .select("pe").distinct().count()
    assert(totalBps == 10000L * attributed)
  }

  test("aucBps: perfect separation is 10000 bps, reversed is 0") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)).toDF("score", "pos")
    assert(Eval.aucBps(perfect, "score", "pos").head().getLong(3) == 10000L)
    val reversed = Seq((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L)).toDF("score", "pos")
    assert(Eval.aucBps(reversed, "score", "pos").head().getLong(3) == 0L)
  }
}
