package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Curation

class CurationSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("token budget water-filling: hand-computed allocation and invariants") {
    // capacities: a=2, b=6, c=20, d=20 tokens (total 48); budget 50% = 24.
    // Sorted asc: a(2): 2*4=8 ≤ 24 → saturated. b(6): 6*3=18 ≤ 22 →
    // saturated. c(20): 20*2=40 ≤ 16? no. So a,b keep all 8; c,d split
    // floor(16/2)=8 each. Expected: a→2, b→6, c→8, d→8.
    val docs = Seq(
      ("a", "t1 t2"), ("b", "t1 t2 t3 t4 t5 t6"),
      ("c", Seq.tabulate(20)(i => s"c$i").mkString(" ")),
      ("d", Seq.tabulate(20)(i => s"d$i").mkString(" "))
    ).toDF("source", "text")
    val out = Curation.tokenBudgetAllocation(docs, "source", "text", 5000)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") == ((2L, 2L, true)))
    assert(out("b") == ((6L, 6L, true)))
    assert(out("c") == ((20L, 8L, false)))
    assert(out("d") == ((20L, 8L, false)))
    // invariants: alloc ≤ cap everywhere; Σalloc ≤ budget
    assert(out.values.forall { case (cap, al, _) => al <= cap })
    assert(out.values.map(_._2).sum <= 24L)
  }

  test("token budget: oversized budget saturates every domain") {
    val docs = Seq(("x", "a b c"), ("y", "d e")).toDF("source", "text")
    val out = Curation.tokenBudgetAllocation(docs, "source", "text", 10000)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("x" -> 3L, "y" -> 2L))
  }

  test("pii redaction counts and scrubs emails and long numbers") {
    val docs = Seq(
      (1L, "contact me at alice@example.com or bob@test.org thanks"),
      (2L, "my number is 5551234567 ok"),
      (3L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = Curation.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == ((2, 0)))
    assert(out(2L) == ((0, 1)))
    assert(out(3L) == ((0, 0)))
    // redacted fingerprint changes iff something was redacted
    val fps = Curation.piiRedact(docs, "doc_id", "text")
      .join(docs, "doc_id")
      .select(col("doc_id"), col("redacted_fp") === md5(col("text").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!fps(1L) && !fps(2L) && fps(3L))
  }

  test("chunking covers every token with the configured overlap") {
    val text = (1 to 300).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc")).toDF("doc_id", "text")
    val chunks = Curation.chunk(docs, "doc_id", "text", chunkSize = 128, stride = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // 300 tokens → starts 0, 64, 128, 192 (last window covers 193..300)
    assert(doc1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(doc1.take(3).forall(_._3 == 128) && doc1.last._3 == 108)
    val doc2 = chunks.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._3 == 2)
  }

  test("repetition stats flag a degenerate doc and pass a diverse one") {
    val docs = Seq(
      (1L, Seq.fill(50)("spam").mkString(" ")),
      (2L, (1 to 50).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._1 == 10000L && !out(1L)._3) // all tokens identical
    assert(out(2L)._1 == 200L && out(2L)._3) // 1/50 = 200 bp
  }

  test("contamination counts training docs sharing an 8-gram, zero-filled") {
    val shared = "a b c d e f g h"
    val docs = Seq(
      (7L, s"$shared tail one"), // benchmark (7 % 20 == 7)
      (27L, s"unrelated words only here nothing shared at all"), // benchmark
      (1L, s"prefix $shared more"), // shares the 8-gram with doc 7
      (2L, "completely different text with other words entirely")
    ).toDF("doc_id", "text")
    val out = Curation.contamination(docs, "doc_id", "text", col("doc_id") % 20 === 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 1L, 27L -> 0L))
  }

  test("domain mix keeps a deterministic cap per group") {
    val docs = (0L until 40L).map(i => (i, s"doc $i", if (i % 2 == 0) "en" else "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Curation.domainMix(docs, "doc_id", Seq("lang", "source"), cap = 3)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 2)
    assert(out.forall(r => r._2 == 20L && r._3 == 3L))
    // determinism: same input → same kept id sum
    val again = Curation.domainMix(docs, "doc_id", Seq("lang", "source"), cap = 3)
      .collect().map(r => (r.getString(0), r.getLong(4))).toMap
    assert(out.map(r => r._1 -> r._4).toMap == again)
  }

  test("boilerplate: the shared footer is flagged, unique sentences are not") {
    val docs = Seq(
      (1L, "unique one. subscribe to our newsletter. more unique text"),
      (2L, "different body. subscribe to our newsletter. tail two"),
      (3L, "third body here. subscribe to our newsletter. tail three"),
      (4L, "entirely fresh. nothing shared here")
    ).toDF("doc_id", "text")
    val out = Curation.boilerplate(docs, "doc_id", "text", minDf = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 1L))) // 3 sentences, 1 boilerplate
    assert(out(2L) == ((3L, 1L)))
    assert(out(3L) == ((3L, 1L)))
    assert(out(4L) == ((2L, 0L)))
    // a repeated sentence WITHIN one doc is one vote, not boilerplate
    val selfRep = Seq(
      (1L, "same line. same line. same line"),
      (2L, "other a. other b")).toDF("doc_id", "text")
    val o2 = Curation.boilerplate(selfRep, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(o2 == Map(1L -> 0L, 2L -> 0L))
  }
}
