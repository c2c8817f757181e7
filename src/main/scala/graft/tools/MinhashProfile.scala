package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextFunctions}
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("warm")(docs.count())
    val sigs = time("signatures")(Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16).cache())
    time("sig-count")(sigs.count())
    val r = 4
    val bands = sigs.select(col("doc_id"), posexplode(array((0 until 4).map(b =>
      xxhash64((b*r until (b+1)*r).map(i => col("sig")(i)): _*)): _*)).as(Seq("band_idx","band_hash"))).cache()
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"), Seq("band_idx","band_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct().cache()
    val nc = time("candidates")(cand.count())
    println(s"PROF n_candidates $nc")
    val full = time("full-minHashNearDup")(Dedup.minHashNearDup(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    println(s"PROF verified $full")
    spark.stop()
  }
}
