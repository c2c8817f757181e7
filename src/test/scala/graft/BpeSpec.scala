package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe

class BpeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("merge rounds match a hand-computed reference on a toy corpus") {
    // corpus: "low low low lower newest newest"
    val docs = Seq((1L, "low low low"), (2L, "lower newest newest")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", rounds = 3)
      .orderBy("round")
      .select(col("pair"), col("merged"), col("cnt"))
      .as[(String, String, Long)].collect().toSeq
    // round 1 pair counts: "l o"=4, "o w"=4, "w e"=3, "e r"=1, "n e"=2,
    // "e w"=2, "e s"=2, "s t"=2 → tie 4/4 broken lexicographically: "l o"
    assert(got(0) == ("l o", "lo", 4L))
    // round 2: "lo w"=4 wins
    assert(got(1) == ("lo w", "low", 4L))
    // round 3: "e s"=2, "e w"=2, "n e"=2, "s t"=2, "low e"=1... tie at 2
    // broken lexicographically → "e s"
    assert(got(2) == ("e s", "es", 2L))
  }

  test("back-to-back pair runs merge fully (two-pass replace)") {
    val docs = Seq((1L, "ababab abab")).toDF("doc_id", "text")
    // chars: a b a b a b / a b a b — pair "a b" count 5
    val got = Bpe.trainMerges(docs, "text", rounds = 1)
      .select(col("pair"), col("cnt")).as[(String, Long)].head()
    assert(got == ("a b", 5L))
    val applied = Bpe.applyMerges(docs, "text", Seq(("a b", "ab")))
      .select(col("bpe_symbols")).as[Seq[String]].head()
    assert(applied == Seq("ab", "ab", "ab", "ab", "ab"))
  }

  test("applyMerges with the trained table reproduces the vocabulary compression") {
    val docs = Seq((1L, "the fast key the fast"), (2L, "the key")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", rounds = 4)
      .orderBy("round")
      .select(col("pair"), col("merged")).as[(String, String)].collect().toSeq
    assert(merges.length == 4)
    val symbols = Bpe.applyMerges(docs, "text", merges)
      .select(explode(col("bpe_symbols")).as("s"))
    // "t h e" appears 3x and is merged within 2 rounds ("t h"→"th","th e"→"the")
    assert(symbols.filter(col("s") === "the").count() == 3)
    // merging never creates symbols with spaces and never loses characters
    val totalChars = symbols.agg(sum(length(col("s")))).head().getLong(0)
    assert(totalChars == "thefastkeythefast".length + "thekey".length)
  }

  test("training is exhaustion-safe: stops when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // all 1-char words
    val got = Bpe.trainMerges(docs, "text", rounds = 5).collect()
    assert(got.isEmpty)
  }
}
