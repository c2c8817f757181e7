package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextFunctions

/** Throwaway profiling main (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val docs = Tables.documents(spark, dir).repartition(32)
      val sh = TextFunctions.withShingles(docs, "text", 8, "__sh")
        .select(col("doc_id"), explode(col("__sh")).as("g"))
      t("shingle count only")(println(sh.count()))
      t("shingle ckpt")(sh.localCheckpoint().count())
      val byGram = sh.localCheckpoint()
      val rare = byGram.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 5)).select(col("g"))
      t("rare count")(println(rare.count()))
      val rareSh = t("rareSh ckpt")(byGram.join(rare, Seq("g")).localCheckpoint())
      val edges = rareSh.as("a").join(rareSh.as("b"), Seq("g"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        .distinct()
      val pr = t("pageRank build")(graft.operators.Graph.pageRankInt(edges, iters = 3))
      t("final count")(println(pr.count()))
    }
    spark.stop()
  }
}
