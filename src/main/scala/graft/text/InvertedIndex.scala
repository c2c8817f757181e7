package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index (posting-list) construction and positional phrase
  * search — the lexical-search physical structure that scales the way
  * IVF inverted lists scale vectors: per-term posting lists are the
  * unit of pruning, so a term-keyed layout turns any term query into a
  * fraction-of-corpus read instead of a full scan. The reference's
  * Redis backend queries exactly such a structure through
  * `FT.SEARCH` (/root/reference/dynamic_script_redis.py:65-82 — its
  * text-index sibling); BM25/TF-IDF (graft.text.TextRank) are the
  * scoring layer that consumes these lists.
  *
  * Everything is exact integer arithmetic over the engine's standard
  * whitespace tokens ([[TextFunctions.tokens]]), so a SQL engine
  * replays the whole build bit-for-bit.
  *
  * Scale notes (100 TB): `positions` is a pure row-local explode (no
  * shuffle); `postings` is two hash aggregations keyed by (term, doc)
  * then term — map-side partial aggregation bounds the shuffle at
  * vocabulary × partition count, and posting-list heads are capped at
  * `sampleK` so no aggregate state is corpus-sized. `phraseSearch`
  * joins per-term position lists on (doc, adjacent position) — each
  * stage is a hash equi-join on doc_id whose build side holds only the
  * (typically rare) phrase terms' postings, never the corpus.
  */
object InvertedIndex {

  /** Token positions: one row per (doc_id, pos, term), pos 1-based —
    * the raw material of a positional inverted index. */
  def positions(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos0", "term")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("term"))

  /** Posting-list build: per term — document frequency, collection
    * frequency, and the head of the ascending posting list (joined as a
    * string so the artifact is engine-portable). Terms below `minDf`
    * are dropped (the long-tail cut every real index applies).
    *
    * The head is selected by the bounded-heap aggregate
    * ([[graft.functions.GraftFunctions.topKByDist]] with the doc id as
    * its own rank) — O(sampleK) state per term, where a
    * collect-then-slice would buffer the FULL posting list per term
    * (corpus-sized state on frequent terms at 100 TB). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L, sampleK: Int = 5): DataFrame =
    positions(docs, idCol, textCol)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        array_join(graft.functions.GraftFunctions.topKByDist(
          col("doc_id"), col("doc_id").cast("double"), sampleK), ",")
          .as("posting_head"))
      .filter(col("df") >= minDf)

  /** Positional phrase search: documents containing `phrase` as
    * consecutive tokens, with occurrence counts. Each phrase word joins
    * its postings to the running match set on (doc_id, start+offset) —
    * the standard positional-intersection algorithm, expressed as a
    * chain of hash equi-joins. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val pos = positions(docs, idCol, textCol)
    val first = pos.filter(col("term") === phrase.head).select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      val nxt = pos.filter(col("term") === w)
        .select(col("doc_id").as(s"__d$i"), col("pos").as(s"__p$i"))
      acc.join(nxt,
          acc("doc_id") === col(s"__d$i") && col(s"__p$i") === acc("pos") + i)
        .drop(s"__d$i", s"__p$i")
    }
    matches.groupBy(col("doc_id")).agg(count(lit(1)).as("n_occurrences"))
  }
}
