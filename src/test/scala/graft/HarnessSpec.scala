package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DynamicBench
import graft.sources.{Fvecs, MetricLogs, Tables}

class HarnessSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"

  test("dynamic-update run: phases ordered, recall recovers to baseline") {
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    val log = DynamicBench.dynamicUpdateRun(spark, queries, base,
      cutoff = 250, k = 10, intervalsPerPhase = 2).collect()
    val events = log.map(_.getAs[String]("event")).toSeq
    assert(events == Seq("steady", "steady", "delete_end", "post_delete", "post_delete",
      "insert_end", "recovered", "recovered"))
    val steady = log.filter(_.getAs[String]("event") == "steady").map(_.getAs[Double]("recall"))
    val post = log.filter(_.getAs[String]("event") == "post_delete").map(_.getAs[Double]("recall"))
    val recovered = log.filter(_.getAs[String]("event") == "recovered").map(_.getAs[Double]("recall"))
    assert(steady.forall(_ == 1.0))
    assert(post.forall(_ < 1.0)) // half the base deleted → recall drops
    assert(recovered.forall(_ == 1.0)) // delete∘insert = identity
  }

  test("dynamic-update RACE: phase tags complete, snapshot isolation holds") {
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    val adj = graft.index.GraphIndex.buildNNDescent(base, 16, rounds = 2)
      .localCheckpoint()
    val res = DynamicBench.dynamicUpdateRace(spark, queries, base, adj,
      cutoff = 250, k = 10, steadyIntervals = 2, recoveredIntervals = 2)
    val rows = res.intervals
    // intervals are contiguous 1..n; the two sentinel events exist
    assert(rows.map(_.interval) == (1 to rows.length))
    assert(rows.count(_.event == "delete_end") == 1)
    assert(rows.count(_.event == "insert_end") == 1)
    val byPhase = rows.filter(_.event.isEmpty).groupBy(_.phase)
    assert(byPhase("steady").length == 2 && byPhase("recovered").length == 2)
    // snapshot isolation: an interval racing the DELETE phase reads a
    // complete published snapshot — either the pre-swap one (recall ==
    // steady) or, if it started after the swap landed, the post-delete
    // one (recall strictly below steady, never a torn in-between above)
    val steadyRecall = byPhase("steady").map(_.recall).max
    assert(steadyRecall > 0.5)
    byPhase.get("during_delete").foreach(_.foreach(r =>
      assert(r.recall <= steadyRecall + 1e-9, r)))
    // recovered serves the re-inserted graph: recall within (0, steady]
    byPhase("recovered").foreach(r =>
      assert(r.recall > 0.0 && r.recall <= steadyRecall + 1e-9, r))
    assert(res.deleteMs > 0 && res.insertMs > 0)
  }

  test("multi-tenant run: per-client-count aggregate rows, recall stays exact") {
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    val agg = DynamicBench.multiTenantRun(spark, queries, base, 10, Seq(2, 4))
      .orderBy("num_clients").collect()
    assert(agg.map(_.getInt(0)).toSeq == Seq(2, 4))
    assert(agg.forall(_.getAs[Double]("mean_recall") == 1.0))
    assert(agg.forall(r => r.getAs[Double]("sum_qps") > r.getAs[Double]("mean_qps")))
  }

  test("multi-tenant curve: 5-point sweep per backend, totals invariant in client count") {
    val curve = SparkEntry.queries("multi_tenant_curve")(spark, dir).collect()
    val backends = curve.map(_.getAs[String]("backend")).distinct
    // one row per (backend, client count), the full {10..50} sweep each
    assert(backends.nonEmpty)
    for (b <- backends) {
      val rows = curve.filter(_.getAs[String]("backend") == b)
      assert(rows.map(_.getAs[Int]("num_clients")).sorted.toSeq == Seq(10, 20, 30, 40, 50))
      // dealing the same events to more clients never changes the total
      assert(rows.map(_.getAs[Long]("sum_qps_rows")).distinct.length == 1)
    }
    assert(curve.forall { r =>
      val bps = r.getAs[Long]("mean_recall_bps"); bps >= 0L && bps <= 10000L
    })
    val chart = SparkEntry.queries("svg_tenant_curve_chart")(spark, dir).collect()(0)
    assert(chart.getAs[Long]("n_series") == backends.length.toLong)
    assert(chart.getAs[String]("svg").startsWith("<svg "))
    // 5 x-values per series, pixel-bucketed, so never more points than that
    assert(chart.getAs[Long]("n_points") <= 5L * backends.length)
  }

  test("metric log text round-trips through format + parse") {
    import spark.implicits._
    val metrics = Seq((1, 4970.25, 2010.5, 0.9769), (2, 27.11, 368876.0, 0.9416))
      .toDF("interval", "qps", "latency_ms", "recall")
    val parsed = MetricLogs.parseLines(MetricLogs.formatLines(metrics))
      .orderBy("interval").collect()
    assert(parsed.length == 2)
    assert(parsed(0).getDouble(1) == 4970.25 && parsed(0).getDouble(3) == 0.9769)
    assert(parsed(1).getDouble(2) == 368876.0)
  }

  test("metric log round-trips through actual text files (S4 -> S5)") {
    import spark.implicits._
    val metrics = Seq((1, 4970.25, 2010.5, 0.9769), (2, 1234.0, 5.25, 0.5))
      .toDF("interval", "qps", "latency_ms", "recall")
    val path = "target/tmp/metric_log_txt"
    MetricLogs.formatLines(metrics).coalesce(1).write.mode("overwrite").text(path)
    val parsed = MetricLogs.parseLines(
      spark.read.text(path).withColumnRenamed("value", "line"))
      .orderBy("interval").collect()
    assert(parsed.length == 2)
    assert(parsed(0).getDouble(1) == 4970.25)
    assert(parsed(1).getDouble(3) == 0.5)
  }

  test("fvecs/ivecs round-trip preserves vectors and positional ids") {
    val tmp = new java.io.File("target/tmp"); tmp.mkdirs()
    val fpath = "target/tmp/test.fvecs"
    val ipath = "target/tmp/test.ivecs"
    val vecs = (0 until 10).map(i => Array.tabulate(4)(j => i * 4.0f + j))
    val ids = (0 until 10).map(i => Array.tabulate(3)(j => i * 3 + j))
    Fvecs.writeFvecs(fpath, vecs)
    Fvecs.writeIvecs(ipath, ids)
    val f = Fvecs.readFvecs(spark, fpath).orderBy("id").collect()
    assert(f.length == 10)
    assert(f(3).getAs[scala.collection.Seq[Float]]("vector") .toSeq == vecs(3).toSeq)
    val iv = Fvecs.readIvecs(spark, ipath).orderBy("id").collect()
    assert(iv(7).getAs[scala.collection.Seq[Int]]("ids") .toSeq == ids(7).toSeq)
  }

  test("sharded fvecs export reads back with the same positional ids") {
    import org.apache.spark.sql.functions.col
    val out = "target/tmp/sharded_fvecs"
    new java.io.File(out).mkdirs()
    val src = Tables.embeddingBase(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    Fvecs.writeFvecsSharded(src, out, numShards = 4)
    val shards = new java.io.File(out).listFiles().filter(_.getName.endsWith(".fvecs"))
    assert(shards.length > 1, s"expected multiple shards, got ${shards.length}")
    val back = Fvecs.readFvecs(spark, out).orderBy("id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("vector").toList)
    val expected = src.orderBy("id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("vector").toList)
    assert(back.length == expected.length)
    assert(back.toList == expected.toList)
  }

  test("multimodal: stub features deterministic, meta digest matches payload") {
    val media = graft.multimodal.Multimodal.asMediaTable(
      Tables.documents(spark, dir), "doc_id", "text", "text/plain")
    val feats = graft.multimodal.Multimodal.extractFeatures(media)
    val row = feats.orderBy("media_id").limit(1).collect()(0)
    assert(row.getAs[scala.collection.Seq[Float]]("features").length == graft.multimodal.Multimodal.FeatureDim)
    val again = graft.multimodal.Multimodal.extractFeatures(media)
      .orderBy("media_id").limit(1).collect()(0)
    assert(row.getAs[scala.collection.Seq[Float]]("features") == again.getAs[scala.collection.Seq[Float]]("features"))
    val meta = graft.multimodal.Multimodal.mediaMeta(media).orderBy("media_id").limit(1).collect()(0)
    assert(meta.getAs[String]("digest").length == 32)
    assert(meta.getAs[Long]("n_bytes") > 0)
  }

  test("ivf_autotune picks the smallest curve rung meeting the target, else the deepest") {
    val curve = SparkEntry.queries("ivf_nprobe_curve")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chosen = SparkEntry.queries("ivf_autotune")(spark, dir).collect()
    assert(chosen.length == 1)
    val (targetBp, np, recall) =
      (chosen(0).getLong(0), chosen(0).getInt(1), chosen(0).getLong(2))
    assert(targetBp == 9000L)
    val qualifying = curve.filter(_._2 >= 9000L).keys
    val expectedNp = if (qualifying.nonEmpty) qualifying.min else curve.keys.max
    assert(np == expectedNp, s"curve=$curve chosen=$np")
    assert(recall == curve(np))
  }

  test("incremental summaries: any batch grouping merges to the full-table aggregate") {
    import graft.operators.IncrementalAgg
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val full = canon(IncrementalAgg.summarize(ev, "event_type", col("cents")))
    // 3-way split by an arbitrary hash, folded in two different orders
    val parts = (0 until 3).map(i => IncrementalAgg.summarize(
      ev.filter(pmod(hash(col("cents")), lit(3)) === i), "event_type", col("cents")))
    val fwd = canon(parts.reduce(IncrementalAgg.merge(_, _, "event_type")))
    val rev = canon(parts.reverse.reduce(IncrementalAgg.merge(_, _, "event_type")))
    assert(fwd == full && rev == full)
  }
}
