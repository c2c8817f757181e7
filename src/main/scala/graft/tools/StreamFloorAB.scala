package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudicate the streaming warm floor (r10 verdict item 4): ~14
  * `stream_*` queries pay ~1–2.6 s each even warm. Candidate mechanisms:
  *   (a) checkpoint I/O — the memory-sink queries use TEMP checkpoints
  *       under java.io.tmpdir, which is ext4 on this box, so every
  *       micro-batch fsyncs offset/commit logs to DISK;
  *   (b) irreducible engine cost — per-query listener/plan/microbatch
  *       scheduling that no checkpoint placement changes.
  * The A/B: the SAME trivial AvailableNow pipeline (one parquet file →
  * projection → memory sink, stateless; then a stateful windowed
  * variant) timed warm with its checkpoint on /tmp (ext4) vs /dev/shm
  * (tmpfs). The trivial-query floor bounds what ANY stream query can
  * save; the delta attributes it between (a) and (b).
  */
object StreamFloorAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    var n = 0
    def run(ckptRoot: String, stateful: Boolean): Double = {
      n += 1
      val sink = s"floor_ab_$n"
      val ckpt = s"$ckptRoot/floor_ab_$n"
      val src = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(s"$dir/events*.parquet"))
      val out =
        if (stateful)
          src.withWatermark("ts", "10 days")
            .groupBy(window(col("ts"), "1 day")).agg(count(lit(1)).as("n"))
        else src.select(col("event_id"), col("user_id"))
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode(if (stateful) "complete" else "append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    def reps(label: String, ckptRoot: String, stateful: Boolean): Unit = {
      run(ckptRoot, stateful) // warmup
      val ts = (1 to 5).map(_ => run(ckptRoot, stateful))
      println(f"$label%-28s min=${ts.min}%.3f median=${ts.sorted.apply(2)}%.3f max=${ts.max}%.3f")
    }

    // per-run checkpoint roots, deleted in finally: leaking them under
    // /dev/shm accumulates RAM-backed tmpfs across repeated A/B runs,
    // which can itself skew later bench draws on the same box (ADVICE r11)
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(); ()
    }
    val roots = Seq("/tmp/graft_floor_ab", "/dev/shm/graft_floor_ab")
    try {
      roots.foreach(r => new java.io.File(r).mkdirs())
      reps("stateless ext4-ckpt", roots(0), stateful = false)
      reps("stateless tmpfs-ckpt", roots(1), stateful = false)
      reps("stateful  ext4-ckpt", roots(0), stateful = true)
      reps("stateful  tmpfs-ckpt", roots(1), stateful = true)
    } finally roots.foreach(r => rmTree(new java.io.File(r)))
    spark.stop()
  }
}
