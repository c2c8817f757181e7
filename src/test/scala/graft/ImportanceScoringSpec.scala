package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.ImportanceScoring

/** Unigram-LM digit scoring + DSIR importance weights: the corpus
  * statistics must drive the scores in the documented direction. */
class ImportanceScoringSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("unigram score favors documents made of common tokens") {
    // "the" appears 12×, "zyzzyva" once — the all-common doc must win
    // on avg_digit_bp
    val docs = (Seq.fill(10)("the the") ++ Seq("the zyzzyva", "qwertyuiop zxcvbnm"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = ImportanceScoring.unigramDigitScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) > out(10L), "all-common doc must out-score the mixed doc")
    assert(out(10L) > out(11L), "mixed doc must out-score the all-rare doc")
  }

  test("unigram digit score is an exact integer decomposition") {
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r = ImportanceScoring.unigramDigitScore(docs, "doc_id", "text").collect()(0)
    // counts: a→2 (1 digit), b→1 (1 digit); score = 1+1+1 = 3 over 3 toks
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 10000L)
  }

  test("bigram digit score is an exact integer decomposition") {
    // corpus bigrams: "a b" ×2 (docs 1,2), "b c" ×1 — doc 1 scores
    // digitlog(2) + digitlog(1) = 2 over 2 bigrams; the 1-token doc has
    // no bigrams and drops out
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val rows = ImportanceScoring.bigramDigitScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) == ((2L, 2L, 10000L)))
    assert(rows(2L) == ((1L, 1L, 10000L)))
    assert(!rows.contains(3L), "sub-bigram doc must not appear")
  }

  test("bigram score is order-sensitive where the unigram score is not") {
    // same bag of words, different order: unigram scores tie, bigram
    // scores split ("a b" appears 12× → 2 digits; "b a" once → 1 digit;
    // the digit log only separates counts across a power of ten)
    val docs = (Seq.fill(12)("a b") ++ Seq("b a")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val uni = ImportanceScoring.unigramDigitScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bi = ImportanceScoring.bigramDigitScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uni(0L) == uni(12L), "unigram score must tie on the permuted doc")
    assert(bi(0L) > bi(12L), "bigram score must split on the permuted doc")
  }

  test("dsir weights: target-heavy vocabulary gets the higher weight") {
    // target slice speaks "aaa bbb", background speaks "xxx yyy"; a new
    // target-vocab doc must out-weigh a background-vocab doc
    val docs = (
      Seq.fill(20)(("t", "aaa bbb aaa bbb")) ++ Seq.fill(20)(("r", "xxx yyy xxx yyy")) ++
        Seq(("probe_t", "aaa bbb"), ("probe_r", "xxx yyy"))
      ).zipWithIndex.map { case ((tag, t), i) => (i.toLong, tag, t) }
      .toDF("doc_id", "tag", "text")
    val w = ImportanceScoring.dsirDigitWeights(
      docs, "doc_id", "text", col("tag") === "t" || col("tag") === "probe_t")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(40L) > w(41L), s"target-vocab probe must out-weigh background probe: $w")
  }
}
