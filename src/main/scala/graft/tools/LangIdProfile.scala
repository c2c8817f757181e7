package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Stage-level timing for the lang_id_ngram pipeline: times each
  * sub-DataFrame in isolation (count-forced) so the cost center is
  * measured, not guessed. Usage:
  * `sbt "runMain graft.tools.LangIdProfile [sfDir]"`. */
object LangIdProfile {
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

    def time(label: String)(df: => DataFrame): Unit = {
      // warm once, then measure
      df.count()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[lip] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s ($n rows)")
    }

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
    val eligible = docs.filter(length(col("t")) >= 3)
    val tg = expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")

    time("train explode")(eligible
      .filter(graft.operators.Sampling.idBucket(col("doc_id"), 4) === 0)
      .select(col("doc_id"), col("lang"), explode(tg).as("g")))

    val trigrams = eligible
      .filter(graft.operators.Sampling.idBucket(col("doc_id"), 4) === 0)
      .select(col("doc_id"), col("lang"), explode(tg).as("g"))
    val profile = trigrams.groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("g"))))
      .filter(col("rn") <= 50)
      .select(col("lang").as("p_lang"), col("g"))
    time("profile (train+agg+win)")(profile)

    val docGrams = eligible.select(col("doc_id"), explode(array_distinct(tg)).as("g"))
    time("docGrams explode")(docGrams)

    val joined = docGrams.join(profile, Seq("g"))
    time("docGrams join profile")(joined)

    val overlap = joined.groupBy(col("doc_id"), col("p_lang"))
      .agg(count(lit(1)).as("overlap"))
    time("overlap agg")(overlap)

    val scoredLang = overlap
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("overlap").desc, col("p_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("p_lang"))
    time("argmax window")(scoredLang)

    time("full confusion")(docs.select(col("doc_id"), col("lang"))
      .join(scoredLang, Seq("doc_id"), "left")
      .select(col("lang"), coalesce(col("p_lang"), lit("unknown")).as("predicted_lang"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n")))

    spark.stop()
  }
}
