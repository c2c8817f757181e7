package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins
import graft.text.Dedup

class JoinsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest earlier right row per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"),
      (3L, ts("2024-01-01 10:00:10"), "t4") // no quote for key 3
    ).toDF("key", "ts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (2L, ts("2024-01-01 10:00:10"), 200.0) // exactly at trade ts → matches
    ).toDF("key", "ts", "price")
    val out = Joins.asOf(trades, quotes, "key", "ts", Seq("price"))
      .collect().map(r => (r.getAs[String]("trade"), Option(r.getAs[Any]("price")))).toMap
    assert(out("t1") == Some(100.0))
    assert(out("t2") == Some(101.0))
    assert(out("t3") == Some(200.0))
    assert(out("t4").isEmpty)
  }

  test("salted join equals plain join") {
    val big = (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) "hot" else s"k$i"))
      .toDF("row_id", "key")
    val small = Seq(("hot", 1), ("k5", 2), ("k17", 3)).toDF("key", "v")
    val plain = big.join(small, Seq("key")).select("row_id", "v")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val salted = Joins.salted(big, small, "key", saltFactor = 4, bigIdCol = "row_id")
      .select("row_id", "v").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("winnowing: shared long substring guarantees shared fingerprints") {
    val common = "the quick brown fox jumps over the lazy dog in the morning"
    val docs = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"totally different beginning $common and another ending"),
      (3L, "no overlap here at all just unrelated words entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowNearDup(docs, "doc_id", "text", k = 8, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // determinism
    val fps1 = Dedup.winnowFingerprints(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getSeq[Long](1).toList)
    val fps2 = Dedup.winnowFingerprints(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(_.getSeq[Long](1).toList)
    assert(fps1.toSeq == fps2.toSeq)
  }

  test("bucketed band join equals the naive theta join, incl. boundaries") {
    // ms values sit exactly on and around cell boundaries of width 100
    val l = Seq((1L, 0L), (2L, 100L), (3L, 199L), (4L, 200L), (5L, 1000L))
      .toDF("lid", "tms")
    val r = Seq((10L, 0L), (11L, 99L), (12L, 100L), (13L, 300L), (14L, 301L), (15L, 950L))
      .toDF("rid", "tms")
    val fast = Joins.bandPairs(l, r, "tms", 100L)
      .select("lid", "r_rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.as("l").crossJoin(r.withColumnRenamed("tms", "rtms").as("r"))
      .filter(abs(col("tms") - col("rtms")) <= 100L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast == naive)
    assert(fast.contains((4L, 13L))) // |200-300| = width: inclusive edge
    assert(!fast.contains((4L, 14L))) // |200-301| just outside
  }
}
