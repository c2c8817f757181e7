package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Joins, Snapshots}
import graft.text.Curation

/** Specs for the round-3 additions: Bloom join pruning, SCD2 history
  * build, and sequence packing. */
class BloomScdPackSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("bloom probe has no false negatives and prunes most non-members") {
    val keys = (0L until 200L).map(_ * 7 + 1).toDF("k")
    val keySet = (0L until 200L).map(_ * 7 + 1).toSet
    val big = (0L until 5000L).toDF("k")
    val words = Joins.bloomFilterWords(keys, "k", numWords = 256)
    val passed = Joins.bloomProbe(big, "k", words).as[Long].collect().toSet
    assert(keySet.subsetOf(passed), "every true member must pass")
    val falsePos = passed.size - keySet.size
    // 256*30 = 7680 bits, 600 set → fpp ≈ (600/7680)^3 ≈ 5e-4
    assert(falsePos < 50, s"expected few false positives, got $falsePos")
    // determinism: same filter, same survivors
    val again = Joins.bloomProbe(big, "k", Joins.bloomFilterWords(keys, "k", 256))
      .as[Long].collect().toSet
    assert(again == passed)
  }

  test("bloom filter handles huge keys without overflow (ANSI-safe)") {
    val keys = Seq(Long.MaxValue - 1, 4294967296L * 3 + 17).toDF("k")
    val words = Joins.bloomFilterWords(keys, "k", numWords = 64)
    val passed = Joins.bloomProbe(keys, "k", words).count()
    assert(passed == 2)
  }

  test("scd2 collapses runs, versions changes, flags the open row") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "a", ts("2024-01-01 10:05:00"), 2L), // same state: collapsed
      (1L, "b", ts("2024-01-01 10:10:00"), 3L),
      (1L, "a", ts("2024-01-01 10:20:00"), 4L), // back to a: NEW version
      (2L, "x", ts("2024-01-01 09:00:00"), 5L)
    ).toDF("user_id", "state", "ts", "event_id")
    val got = Snapshots.scd2(events, "user_id", "state", "ts", "event_id")
      .orderBy("user_id", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(4), r.getBoolean(5)))
    val base = ts("2024-01-01 10:00:00").getTime
    assert(got.toSeq == Seq(
      (1L, "a", 1, base + 600000L, false), // valid_to = the 10:10 change
      (1L, "b", 2, base + 1200000L, false),
      (1L, "a", 3, -1L, true),
      (2L, "x", 1, -1L, true)))
  }

  test("sequence packing: offsets chain, bins fill to capacity, spans flagged") {
    val docs = Seq(
      (1L, ("w " * 100).trim, "en"), // 100 tokens
      (2L, ("w " * 200).trim, "en"), // 200 → spans the 256 cut
      (3L, ("w " * 50).trim, "en"),
      (4L, ("w " * 10).trim, "fr") // separate shard restarts at bin 0
    ).toDF("doc_id", "text", "lang")
    val got = Curation.packSequences(docs, "doc_id", "text", "lang", capacity = 256)
      .orderBy("lang", "doc_id")
      .select("doc_id", "n_tokens", "bin_id", "bin_offset", "spans_bins")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 100L, 0L, 0L, false),
      (2L, 200L, 0L, 100L, true), // 100+200 > 256: crosses into bin 1
      (3L, 50L, 1L, 44L, false), // starts at 300 = bin 1, offset 44
      (4L, 10L, 0L, 0L, false)))
  }
}
