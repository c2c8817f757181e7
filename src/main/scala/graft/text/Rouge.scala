package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROUGE-N overlap scoring (Lin, 2004 "ROUGE: A Package for Automatic
  * Evaluation of Summaries") — the n-gram eval metric of the
  * summarization/generation loop a training-data pipeline feeds:
  * CLIPPED n-gram matches (each reference n-gram credits at most its
  * own multiplicity, so a candidate repeating one gram cannot inflate
  * the score — the property that separates ROUGE/BLEU counting from
  * plain set Jaccard, which `ngram_jaccard_pairs` covers).
  *
  *   match_n = Σ_g min(count_cand(g), count_ref(g))
  *   recall  = match_n / |ref n-grams|     (ROUGE-N proper)
  *   F1      = 2·match_n / (|ref| + |cand|)
  *
  * Everything stays exact int64 (counts, least(), floor-ppm via integer
  * division with positive denominators), so the scoring replays
  * bit-for-bit in a SQL oracle.
  *
  * Scale shape: one explode per (side, n) into a map-combined
  * groupBy(pair, gram) count, then an equi-join ON (pair_id, gram) —
  * candidates are co-partitioned by the join key, never all-pairs; the
  * final per-pair reduction is one more map-combined groupBy. Grams are
  * built row-locally (slice + zip_with), no positional self-join.
  */
object Rouge {

  /** Word n-grams WITH multiplicities of an already-tokenized array
    * column — genuinely n-generic (unlike a fixed two-slice zip, which
    * silently yields bigrams for any n ≥ 2), and deliberately NOT
    * deduplicated: clipped counting needs every occurrence, which is why
    * [[TextFunctions.shinglesOfTokens]] (array_distinct semantics) is
    * not reused. Texts shorter than n yield an empty array, never a
    * truncated "gram". The tokens must live in their own column first —
    * HOF lambdas re-evaluate per element (same caveat as
    * shinglesOfTokens). */
  private def gramsOfTokens(tokensCol: String, n: Int): Column =
    if (n <= 1) col(tokensCol)
    else expr(
      s"""CASE WHEN size($tokensCol) < $n THEN array()
         |ELSE transform(sequence(1, size($tokensCol) - ${n - 1}),
         |  i -> array_join(slice($tokensCol, i, $n), ' ')) END""".stripMargin)

  /** Per-(pair, gram) multiplicities for one side. */
  private def gramCounts(side: DataFrame, textCol: String, n: Int,
      out: String): DataFrame =
    side.select(col("pair_id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("pair_id"), explode(gramsOfTokens("__toks", n)).as("g"))
      .groupBy(col("pair_id"), col("g")).agg(count(lit(1)).as(out))

  /** Clipped-match and total-gram columns for one n, named with the
    * given suffix: (pair_id, m_<sfx>, t_cand_<sfx>, t_ref_<sfx>). */
  private def overlapN(pairs: DataFrame, n: Int, sfx: String): DataFrame = {
    val cand = gramCounts(pairs.select(col("pair_id"), col("cand_text")),
      "cand_text", n, "c_cand")
    val ref = gramCounts(pairs.select(col("pair_id"), col("ref_text")),
      "ref_text", n, "c_ref")
    val m = cand.join(ref, Seq("pair_id", "g"))
      .groupBy(col("pair_id"))
      .agg(sum(least(col("c_cand"), col("c_ref"))).as(s"m_$sfx"))
    // |grams| = max(|tokens| − n + 1, 0), computed directly — no second
    // gram materialization just to take its size
    def total(textCol: String, out: String): Column =
      greatest(size(TextFunctions.tokens(col(textCol))) - (n - 1), lit(0))
        .cast("long").as(out)
    val totals = pairs.select(col("pair_id"),
      total("cand_text", s"t_cand_$sfx"), total("ref_text", s"t_ref_$sfx"))
    totals.join(m, Seq("pair_id"), "left")
      .withColumn(s"m_$sfx", coalesce(col(s"m_$sfx"), lit(0L)))
  }

  /** ROUGE-1 and ROUGE-2 per pair. `pairs` must have
    * (pair_id: Long, cand_text: String, ref_text: String); emits the
    * clipped matches, gram totals, and recall/F1 in ppm (floor). The
    * `greatest(…, 1)` guards keep zero-gram texts at score 0 instead of
    * a division error — identically in the oracle. */
  def rouge12(pairs: DataFrame): DataFrame =
    overlapN(pairs, 1, "1").join(overlapN(pairs, 2, "2"), Seq("pair_id"))
      .select(col("pair_id"), col("m_1"), col("t_cand_1"), col("t_ref_1"),
        expr("(1000000 * m_1) div greatest(t_ref_1, 1)").as("rouge1_r_ppm"),
        expr("(2000000 * m_1) div greatest(t_ref_1 + t_cand_1, 1)")
          .as("rouge1_f_ppm"),
        col("m_2"), col("t_cand_2"), col("t_ref_2"),
        expr("(1000000 * m_2) div greatest(t_ref_2, 1)").as("rouge2_r_ppm"),
        expr("(2000000 * m_2) div greatest(t_ref_2 + t_cand_2, 1)")
          .as("rouge2_f_ppm"))
}
