package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-construction step of
  * an LLM data pipeline, run relationally.
  *
  * Classic BPE (Sennrich et al. 2016): pre-tokenize the corpus into
  * words, represent each word as a sequence of symbols (initially
  * characters), then repeatedly (a) count adjacent symbol pairs weighted
  * by word frequency, (b) merge the most frequent pair into a new symbol.
  *
  * Scale shape: the only corpus-sized operation is the word-frequency
  * aggregate (one shuffle over the tokenized corpus). Everything after —
  * symbol sequences, pair counts, merges — runs over the DISTINCT-word
  * table, which is vocabulary-sized (Heaps' law: ~10⁶ rows for a 100 TB
  * crawl), so per-round cost is independent of corpus size. The selected
  * merge per round is a 1-row artifact collected to the driver, exactly
  * like a centroid table.
  *
  * Determinism: ties on pair count break lexicographically; the merge
  * rewrite is literal string replacement on the space-delimited symbol
  * string, applied twice — a single left-to-right `replace` pass misses
  * every second occurrence in a run of back-to-back pairs (the shared
  * delimiter is consumed), and one repeat provably catches the stragglers
  * (missed occurrences are never adjacent). No end-of-word marker is
  * used (a simplification over Sennrich's `</w>`; merges still never
  * cross word boundaries). The whole construction is exact
  * integer/string arithmetic, replayable in any engine.
  */
object Bpe {

  /** Space-delimited initial symbol sequence (one symbol per character). */
  private def charSeq(word: org.apache.spark.sql.Column) =
    array_join(expr("filter(split(word, ''), x -> x != '')"), " ")

  /** Adjacent-pair explosion of the symbol string, weighted by `freq`. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .withColumn("l", split(col("seq"), " "))
      .filter(size(col("l")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(l) - 1), i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("cnt"))

  /** Two-pass non-overlapping literal merge of `pair` into `merged`. */
  private def mergeSeq(seq: org.apache.spark.sql.Column, pair: String, merged: String) = {
    // symbols are interpolated into a SQL expression — reject quoting
    // metacharacters rather than merging a corrupted literal
    require(!pair.contains("'") && !pair.contains("\\"),
      s"unsupported symbol characters in pair '$pair'")
    val find = s" $pair "
    val repl = s" $merged "
    trim(expr(s"replace(replace(concat(' ', seq, ' '), '$find', '$repl'), '$find', '$repl')"))
  }

  /** Train `rounds` BPE merges over the corpus' whitespace tokens.
    * Returns one row per merge: (round, pair, merged, cnt). */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seq", charSeq(col("word")))
      .localCheckpoint() // vocabulary-sized; reused every round
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((r, pair, merged, cnt))
        vocab = vocab
          .withColumn("seq", mergeSeq(col("seq"), pair, merged))
          .localCheckpoint()
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq.map {
        case (rd, p, m, c) => Row(rd.toLong, p, m, c)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("round", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("pair", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("merged", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, false))))
  }

  /** Re-tokenize text with a learned merge table: every merge applied in
    * round order to each word's symbol sequence, entirely row-local (one
    * nested expression, no shuffle, no UDF). Returns the input with an
    * added `bpe_symbols` array column (per-word symbol arrays flattened
    * in document order). */
  def applyMerges(docs: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    // the per-word symbol string with the merge chain folded in textually:
    // round k's rewrite wraps round k-1's output
    require(merges.forall { case (p, _) => !p.contains("'") && !p.contains("\\") },
      "unsupported symbol characters in merge table")
    val inner = "array_join(filter(split(w, ''), x -> x != ''), ' ')"
    val mergedExpr = merges.foldLeft(inner) { case (acc, (p, m)) =>
      s"trim(replace(replace(concat(' ', $acc, ' '), ' $p ', ' $m '), ' $p ', ' $m '))"
    }
    docs
      .withColumn("__words", TextFunctions.tokens(col(textCol)))
      .withColumn("bpe_symbols",
        flatten(expr(s"transform(__words, w -> split($mergedExpr, ' '))")))
      .drop("__words")
  }
}
