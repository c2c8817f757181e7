package graft.index

import org.apache.spark.sql.functions._

/** Scratch stage-profiler for the IVFPQ search chain (not part of the
  * driver contract; safe to delete). */
object ProfIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables
    val model = graft.index.IvfPq.fit(Tables.embeddingBase(spark, dir),
      graft.index.IvfFlat.fit(Tables.embeddingBase(spark, dir), nlist = 8))
    model.codebookArray // force collect outside timing
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$label%-22s run$i ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    val qq = queries.select(col("query_id").as("vec_id"),
      graft.index.IvfFlat.quantize(col("q_embedding")).as("qv"))
    time("probes") {
      graft.index.IvfFlat.probeCells(qq, model.centroids, 7).count()
    }
    time("qarr(expr)") {
      val probes = graft.index.IvfFlat.probeCells(qq, model.centroids, 7)
        .select(col("query_id"), col("qv"), col("cid").as("icid"))
      val cLit = array(model.centroids.toIndexedSeq.map(c => typedlit(c.toSeq)): _*)
      probes
        .withColumn("cvec", element_at(cLit, col("icid") + 1))
        .select(col("query_id"), col("icid"),
          zip_with(col("qv"), col("cvec"), (x, y) => x - y).as("rv"))
        .select(col("query_id"), col("icid"),
          graft.index.PqFlat.adcTable(col("rv"), model.codebookArray, model.dsub).as("qd"))
        .select(col("query_id"), aggregate(col("qd"), lit(0L), (a, e) => a + e))
        .count()
    }
    def newQarr = {
      val probes = IvfFlat.probeCells(qq, model.centroids, 7)
        .select(col("query_id"), col("qv"), col("cid").as("icid"))
      val cLit = array(model.centroids.toIndexedSeq.map(c => typedlit(c.toSeq)): _*)
      probes
        .withColumn("cvec", element_at(cLit, col("icid") + 1))
        .select(col("query_id"), col("icid"),
          zip_with(col("qv"), col("cvec"), (x, y) => x - y).as("rv"))
        .select(col("query_id"), col("icid"),
          PqFlat.adcTable(col("rv"), model.codebookArray, model.dsub).as("qd"))
    }
    time("scan+shortlist") {
      import graft.functions.GraftFunctions
      val shortAgg = GraftFunctions.topKByDist(col("vec_id"), col("adist"), 250)
      model.lists.join(broadcast(newQarr), Seq("icid"))
        .select(col("query_id"), col("vec_id"),
          GraftFunctions.pqAdcLong(col("qd"), col("codes"), model.ksub)
            .cast("double").as("adist"))
        .groupBy(col("query_id"))
        .agg(shortAgg.as("cand"))
        .select(col("query_id"), explode(col("cand")).as("vec_id"))
        .count()
    }
    val qarrCp = newQarr.localCheckpoint()
    time("join only") {
      model.lists.join(broadcast(qarrCp), Seq("icid"))
        .select(col("query_id"), col("vec_id")).count()
    }
    time("join+adc+min") {
      model.lists.join(broadcast(qarrCp), Seq("icid"))
        .select(col("query_id"), col("vec_id"),
          graft.functions.GraftFunctions.pqAdcLong(col("qd"), col("codes"), model.ksub)
            .cast("double").as("adist"))
        .groupBy(col("query_id")).agg(min(col("adist"))).count()
    }
    time("join+adc+topk") {
      val shortAgg = graft.functions.GraftFunctions.topKByDist(col("vec_id"), col("adist"), 250)
      model.lists.join(broadcast(qarrCp), Seq("icid"))
        .select(col("query_id"), col("vec_id"),
          graft.functions.GraftFunctions.pqAdcLong(col("qd"), col("codes"), model.ksub)
            .cast("double").as("adist"))
        .groupBy(col("query_id")).agg(shortAgg.as("cand")).count()
    }
    time("collect qarr") { newQarr.collect().length.toLong }
    time("join only inline") {
      model.lists.join(broadcast(newQarr), Seq("icid"))
        .select(col("query_id"), col("vec_id")).count()
    }
    model.lists.join(broadcast(newQarr), Seq("icid"))
      .select(col("query_id"), col("vec_id")).explain("formatted")
    time("full search") {
      graft.index.IvfPq.search(model, queries, base, 10, 7, 250).count()
    }
    spark.stop()
  }
}
