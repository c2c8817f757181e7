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

  /** Per-document interpolated Kneser–Ney bigram-LM score — the smoothing
    * the KenLM filters of CCNet-class pipelines actually use (Kneser &
    * Ney 1995; Chen & Goodman 1998), where [[bigramDigitScore]] is the
    * unsmoothed surrogate. With absolute discount D = 3/4:
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)
    *
    * i.e. discounted bigram evidence backed off to the CONTINUATION
    * probability of w₂ (in how many distinct contexts does w₂ appear),
    * which is what separates KN from plain add-k: frequent-but-bound
    * tokens ("Francisco") stop inflating unseen-bigram mass. Multiplying
    * through by 4·c(w₁·)·N₁₊(··) makes the probability an exact integer
    * rational; the emitted per-bigram score is floor(10⁶·P) — every
    * count, product and division is int64 (the worst numerator is
    * 10⁶·4·c₁₂·N ≈ 10⁶·4·|bigrams|·|types|, far under 2⁶³ at any
    * fixture scale), so the whole LM trains AND scores exactly in the
    * SQL oracle. All quantities are positive, so Spark `div` and DuckDB
    * `//` agree.
    *
    * Scale shape: one explode pass, map-combined groupBys for the four
    * count tables (bigram types, left-context totals, continuation
    * counts, the 1-row type total broadcast), one equi-join back to
    * per-document bigram multiplicities. Same plan family as
    * [[unigramDigitScore]] — no new shuffle class. */
  /** Bigram instance stream (idCol, w1, w2), row-local build. */
  private def bigramInstances(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val arr = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("a"))
      .filter(size(col("a")) >= 2)
    arr.select(col(idCol),
      explode(arrays_zip(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), size(col("a")) - 1))).as("z"))
      .select(col(idCol), col("z.0").as("w1"), col("z.1").as("w2"))
  }

  /** The trained KN bigram table `(w1, w2, kn_ppm)` of
    * [[kneserNeyBigramScore]] — public so the per-context mass invariant
    * (Σ_seen-w2 P(w2|w1) ≤ 1, the discount reserving mass for unseen
    * continuations) is directly testable against the LM itself. */
  def kneserNeyTypeScores(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    typeScoresFromInstances(bigramInstances(docs, idCol, textCol))

  private def typeScoresFromInstances(bi: DataFrame): DataFrame = {
    // corpus LM tables. c12 has four consumers below and its aggregate
    // recomputes per consumer, but it is deliberately NOT checkpointed:
    // the map-combined re-aggregation is cheaper than the checkpoint
    // barrier (A/B at sf0.1: 1.34 s plain vs 2.09 s checkpointed warm)
    val c12 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val left = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1w1"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("nw2"))
    val total = c12.agg(count(lit(1)).as("nn"))
    c12
      .join(left, "w1").join(cont, "w2").crossJoin(broadcast(total))
      .withColumn("kn_ppm", expr(
        """(1000000 * (greatest(4 * c12 - 3, 0) * nn + 3 * n1w1 * nw2))
          | div (4 * c1 * nn)""".stripMargin.replace("\n", "")))
      .select(col("w1"), col("w2"), col("kn_ppm"))
  }

  def kneserNeyBigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = bigramInstances(docs, idCol, textCol)
    // per-document bigram multiplicity (join scores once per TYPE per doc)
    val docBi = bi.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    docBi.join(typeScoresFromInstances(bi), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_bigram"),
        sum(col("m") * col("kn_ppm")).as("kn_ppm_sum"))
      .select(col(idCol), col("n_bigram"), col("kn_ppm_sum"),
        expr("kn_ppm_sum div n_bigram").as("avg_kn_ppm"))
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
