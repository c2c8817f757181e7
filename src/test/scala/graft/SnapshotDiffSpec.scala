package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MetricsAnalytics, Sampling, Snapshots}

/** Snapshot reconciliation, weighted sampling, and gap-filled resampling. */
class SnapshotDiffSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("rendezvous sharding: balanced-ish, and scale-out only moves keys to the new shard") {
    val ids = (1L to 9000L).toDF("id")
    val a = Sampling.withRendezvousShard(
      Sampling.withRendezvousShard(ids, "id", 8, "s8"), "id", 9, "s9")
      .select(col("id"), col("s8"), col("s9")).collect()
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    val moved = a.filter(r => r.getLong(1) != r.getLong(2))
    // HRW: every relocated key lands on the NEW shard (id 8) …
    assert(moved.forall(_.getLong(2) == 8))
    // … and roughly 1/9 of keys move (binomial tolerance)
    assert(moved.length > 9000 / 9 / 2 && moved.length < 9000 / 9 * 2)
    // determinism: same inputs, same assignment
    val b = Sampling.withRendezvousShard(ids, "id", 8, "s8")
      .select("id", "s8").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.forall(r => b(r.getLong(0)) == r.getLong(1)))
  }

  test("mergeInto applies update/delete/insert clauses in one pass") {
    val tgt = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    // 1 → update to 11; 2 → matched delete (v=21 ≡ 0 mod 7); 9 → insert
    val src = Seq((1L, 11L), (2L, 21L), (9L, 90L)).toDF("k", "v")
    val got = Snapshots.mergeInto(tgt, src, "k", Seq("v"),
        deleteWhen = col("src_v") % 7 === 0)
      .select(col("k"), col("v"), col("action"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((11L, "update")),
      3L -> ((30L, "keep")),
      9L -> ((90L, "insert"))))
  }

  test("diff classifies insert/delete/update and drops unchanged rows") {
    val oldDf = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
    val newDf = Seq((2L, "b", 20L), (3L, "c", 31L), (4L, "d", 40L)).toDF("k", "s", "v")
    val got = Snapshots.diff(oldDf, newDf, "k", Seq("s", "v"))
      .select(col("k"), col("change_type")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("diff is null-safe: null payload vs value is update, null vs null unchanged") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val newDf = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val got = Snapshots.diff(oldDf, newDf, "k", Seq("s"))
      .select(col("k"), col("change_type")).as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update")) // key 1: null <=> null → unchanged
  }

  test("weighted sample: 0 bps keeps nothing, 10000 bps keeps everything, monotone in weight") {
    val df = (0L until 2000L).toDF("id")
    assert(Sampling.weightedSample(df, "id", lit(0L)).count() == 0)
    assert(Sampling.weightedSample(df, "id", lit(10000L)).count() == 2000)
    val low = Sampling.weightedSample(df, "id", lit(2000L))
      .as[Long].collect().toSet
    val high = Sampling.weightedSample(df, "id", lit(6000L))
      .as[Long].collect().toSet
    assert(low.subsetOf(high)) // raising the weight only adds rows
    // keep rate tracks the probability (hash is uniform-ish)
    assert(math.abs(low.size / 2000.0 - 0.2) < 0.05)
    assert(math.abs(high.size / 2000.0 - 0.6) < 0.05)
  }

  test("gap-fill: missing buckets appear with n_events=0 and carry the last sum forward") {
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 5L),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:40"), 7L),
      // minute 00:01 empty
      (java.sql.Timestamp.valueOf("2024-01-01 00:02:05"), 3L))
      .toDF("ts", "cents")
    val got = MetricsAnalytics.gapFillLocf(rows, col("ts"), col("cents"), 60000L)
      .orderBy("bucket_ms")
      .select(col("n_events"), col("filled_sum")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 12L), (0L, 12L), (1L, 3L)))
  }
}
