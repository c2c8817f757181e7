package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.{HashEmbed, TextFunctions}

/** Stage-level timing for the tf-idf / hash-embed retrieval pair —
  * the same measure-don't-guess method as [[LangIdProfile]].
  * Usage: `sbt "runMain graft.tools.TfidfProfile [sfDir]"`. */
object TfidfProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[tp] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }

    val docs = Tables.documents(spark, dir)

    // full queries, timed twice (cold-ish, warm)
    time("tfidf full run1")(HashEmbed.tfidfCosineTopK(
      docs, "doc_id", "text", col("doc_id") % 100 === 0, 5, 9000).count())
    time("tfidf full run2")(HashEmbed.tfidfCosineTopK(
      docs, "doc_id", "text", col("doc_id") % 100 === 0, 5, 9000).count())

    // pieces
    val tf = time("tf explode+agg+ckpt")(
      docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .localCheckpoint())
    // derive the corpus constants from the loaded fixture, exactly as
    // tfidfCosineTopK does — hardcoding sf0.1's 5000 docs silently skews
    // the df-prune and idf-weight stages on any other fixture
    val nDocs = time("nDocs distinct count")(
      docs.select(col("doc_id")).distinct().count())
    val digitsN = nDocs.toString.length.toLong
    val dfp = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") * 10000 < lit(nDocs) * 9000)
    val weighted = tf.join(dfp, Seq("tok"))
      .withColumn("w",
        col("tf") * (lit(1L + digitsN) - length(col("df").cast("string"))))
    time("weighted count")(weighted.count())
    val norms = weighted.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("nrm"))
    time("norms count")(norms.count())
    val q = weighted.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"), col("tok"), col("w").as("qw"))
    val dots = q.join(weighted.filter(!(col("doc_id") % 100 === 0)), Seq("tok"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qw") * col("w")).as("dot"))
    println("[tp] dots partitions: " + dots.rdd.getNumPartitions)
    time("dots join+agg count")(dots.count())
    // hypothesis: AQE coalesces the tiny tok-shuffle to ~1 partition and a
    // single task pays the join's ~100x row amplification. Pinned variant:
    val qP = q.repartition(32, col("tok"))
    val bP = weighted.filter(!(col("doc_id") % 100 === 0)).repartition(32, col("tok"))
    val dotsP = qP.join(bP, Seq("tok"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qw") * col("w")).as("dot"))
    time("dots PINNED join+agg")(dotsP.count())
    time("dots PINNED run2")(dotsP.count())
    // broadcast variant: q side is queries-sized, broadcast kills the
    // weighted-side exchange entirely and partial-agg crushes the output
    val dotsB = broadcast(q).join(weighted.filter(!(col("doc_id") % 100 === 0)), Seq("tok"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("qw") * col("w")).as("dot"))
    time("dots BROADCAST join+agg")(dotsB.count())
    time("dots BROADCAST run2")(dotsB.count())

    time("hashembed full run1")(HashEmbed.cosineTopK(
      docs, "doc_id", "text", col("doc_id") % 100 === 0, 4096, 5).count())
    time("hashembed full run2")(HashEmbed.cosineTopK(
      docs, "doc_id", "text", col("doc_id") % 100 === 0, 4096, 5).count())

    spark.stop()
  }
}
