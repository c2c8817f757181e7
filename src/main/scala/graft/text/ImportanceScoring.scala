package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics document scoring for training-data curation:
  * unigram-LM quality scoring (the CCNet/KenLM filter family, Wenzek et
  * al. 2020) and DSIR-style hashed-n-gram importance weights (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling").
  *
  * Both are reduced to their deterministic, engine-portable core: token
  * probabilities enter through the DIGIT LENGTH of their integer counts
  * (⌊log₁₀ count⌋ + 1) — a frozen, exactly-replayable surrogate for log
  * count that keeps every score an exact int64 sum, so a SQL oracle
  * replays training + scoring bit-for-bit. Swapping digit-log for a float
  * log-prob table changes one expression, not the pipeline shape.
  *
  * Scale shape (the part that matters at 100 TB): one explode pass over
  * the corpus, one map-combined groupBy to train counts, one equi-join to
  * score, one groupBy back to documents. No driver state, no collect; the
  * DSIR feature space is a FIXED bucket table (default 1024 rows) that
  * broadcasts to the scoring join regardless of corpus size.
  */
object ImportanceScoring {

  /** ⌊log₁₀ n⌋ + 1 for positive n — the portable "digit log". */
  private def digitLog(n: Column): Column = length(n.cast("string")).cast("long")

  /** Per-document unigram-LM score: Σ_tokens digitlog(corpus_count(tok)).
    * High score ⇔ the document is made of common (in-distribution) words;
    * low average ⇔ rare-token soup — the CCNet perplexity-filter decision
    * reduced to integer arithmetic. Also emits the per-token average in
    * basis points for a length-independent threshold. */
  def unigramDigitScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    toks.join(vocab, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(digitLog(col("cnt"))).as("lm_digit_score"))
      .select(col(idCol), col("n_tok"), col("lm_digit_score"),
        expr("(10000 * lm_digit_score) div n_tok").as("avg_digit_bp"))
  }

  /** Per-document bigram-LM score — the order-sensitive sibling of
    * [[unigramDigitScore]] (a KenLM-style n-gram filter truncated to
    * n=2): Σ_bigrams digitlog(corpus_count(bigram)), plus the per-bigram
    * average in basis points. Bigrams are built ROW-LOCALLY
    * (zip_with over the token array and its shift — no positional
    * self-join), so the corpus pass stays one explode + one map-combined
    * groupBy + one equi-join at any scale. Documents with fewer than two
    * tokens have no bigrams and drop out, exactly as in the oracle. */
  def bigramDigitScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val arr = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("a"))
      .filter(size(col("a")) >= 2)
    val bi = arr.select(col(idCol),
      explode(zip_with(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1),
        (x, y) => concat(x, lit(" "), y))).as("bg"))
    val lm = bi.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    bi.join(lm, "bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigram"),
        sum(digitLog(col("cnt"))).as("lm2_digit_score"))
      .select(col(idCol), col("n_bigram"), col("lm2_digit_score"),
        expr("(10000 * lm2_digit_score) div n_bigram").as("avg2_digit_bp"))
  }

  /** DSIR importance weight per document, target vs raw distribution over
    * hashed unigram buckets: w = Σ_tokens [digitlog(tgt_cnt(b)+1) −
    * digitlog(raw_cnt(b)+1)], b = PolyHash(tok) mod `buckets`. Documents
    * whose token buckets are relatively over-represented in the target
    * slice get positive weight — the resampling key of DSIR with
    * Laplace-smoothed hashed features. Both distributions train in ONE
    * pass (conditional count over the same grouped frame). */
  def dsirDigitWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    val toks = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("b",
        pmod(graft.functions.PolyHash.column(col("tok"), 257L, 1000000007L),
          lit(buckets.toLong)))
    val dists = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("raw_cnt"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("tgt_cnt"))
    toks.join(broadcast(dists), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(digitLog(col("tgt_cnt") + 1) - digitLog(col("raw_cnt") + 1))
          .as("w_digit"))
  }
}
