package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-hashed (hashing-trick) bag-of-words document embeddings —
  * the text→vector bridge that needs no trained model: bucket =
  * PolyHash(token) mod dim, value = token count (Weinberger et al. 2009,
  * "Feature Hashing for Large Scale Multitask Learning"). This gives the
  * corpus a DERIVED embedding column (unlike the fixture `embeddings`
  * table) and makes documents first-class citizens of the similarity
  * operators.
  *
  * Representation is SPARSE — (doc, bucket, cnt) rows, never a dense
  * width-`dim` array — so storage scales with corpus tokens, not
  * docs × dim, and similarity is the classic sparse dot-product join:
  * shared-bucket equi-join + Σ products. At fixture scale (dim 4096)
  * the posting lists are still corpus-sized fractions; at 100 TB the
  * same plan runs with dim 2¹⁸, where each bucket's posting list holds
  * corpus_tokens/dim entries and the join IS the pruning —
  * no separate index structure needed. All arithmetic is exact int64
  * until one shared fixed-shape double expression (mul, div, sqrt,
  * floor — each correctly rounded in IEEE, so any engine replays the
  * ppm score bit-for-bit).
  */
object HashEmbed {

  /** Sparse hashed vectors: one (id, bucket, cnt) row per occupied
    * bucket. One explode pass + one map-combined groupBy. */
  def sparseVectors(docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("bucket",
        pmod(graft.functions.PolyHash.column(col("tok"), 257L, 1000000007L), lit(dim.toLong)))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Cosine top-k over the hashed vectors for the `isQuery` split:
    * sparse dot-product join on shared buckets, exact int64 dots and
    * norms, cosine emitted in integer ppm (floor(1e6·dot/√(na·nb))),
    * rank by (ppm desc, id) so ties are deterministic. */
  def cosineTopK(docs: DataFrame, idCol: String, textCol: String,
      isQuery: Column, dim: Int, k: Int): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // materialized once: queries, base, and norms all read the same
    // sparse pass; localCheckpoint (not cache) so the blocks are
    // released by the ContextCleaner after the query
    val sv = sparseVectors(docs, idCol, textCol, dim).localCheckpoint()
    // docs-sized (one row per doc) and read twice (qn, bn) — materialize
    // so the sum-of-squares aggregation runs once, not per consumer
    val norms = sv.groupBy(col(idCol)).agg(sum(col("cnt") * col("cnt")).as("nrm"))
      .localCheckpoint()
    val q = sv.filter(isQuery)
      .select(col(idCol).as("query_id"), col("bucket"), col("cnt").as("qcnt"))
      // pin the posting-join partitioning: the join AMPLIFIES ~100x, so
      // AQE's coalesce-by-input-bytes (which sees only the tiny sparse
      // vectors) would funnel the amplified row generation through 1-2
      // tasks; an explicit by-key repartition is exempt from coalescing
      // and is also the co-partitioned shape the 100 TB join wants
      .repartition(par, col("bucket"))
    val dots = q.join(sv.filter(!isQuery).repartition(par, col("bucket")), Seq("bucket"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("qcnt") * col("cnt")).as("dot"))
    val qn = norms.filter(isQuery).select(col(idCol).as("query_id"), col("nrm").as("qnrm"))
    val bn = norms.filter(!isQuery).select(col(idCol), col("nrm").as("bnrm"))
    val scored = dots
      .join(broadcast(qn), Seq("query_id"))
      .join(bn, Seq(idCol))
      .withColumn("cos_ppm",
        // norms multiply in DOUBLE space: each factor is < 2⁵³ so the
        // product is IEEE-exact, while the int64 product would silently
        // wrap past ~55k-token documents (tfidfCosineTopK's rule)
        floor(lit(1000000.0) * col("dot")
          / sqrt(col("qnrm").cast("double") * col("bnrm").cast("double"))).cast("long"))
    // per-query candidates are bounded by the posting-list intersection
    // (≈ corpus_tokens/dim per bucket), so the window partition is small
    // by construction at real dim — the heap aggregate isn't needed here
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_ppm").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"), col("cos_ppm"))
  }

  /** TF-IDF-weighted cosine top-k over the RAW token space — the
    * classic vector-space-model retrieval next to BM25's probabilistic
    * ranking: w(doc, tok) = tf · idf, idf as the integer digit-log
    * surrogate (1 + digits(N) − digits(df), ≥ 1 — frozen, exactly
    * replayable). The sparse join key is the token itself (the corpus
    * vocabulary IS the dimension space); tokens whose document
    * frequency exceeds `maxDfBps`/10000 of the corpus are pruned BEFORE
    * the join (their idf weight is noise and their posting lists are
    * the join's only unbounded rows — champion-list pruning, Manning et
    * al. IIR §7; 5000 bp = the classic "more than half the corpus"
    * rule, but a stopword-dense corpus needs a looser cut to retain any
    * vocabulary at all). Norms stay int64 (w ≤ tf·maxIdf keeps
    * Σw² < 2⁶³); the norm PRODUCT crosses 2⁶³ so it multiplies in
    * double space — exact per IEEE since each factor is < 2⁵³. */
  def tfidfCosineTopK(docs: DataFrame, idCol: String, textCol: String,
      isQuery: Column, k: Int, maxDfBps: Int = 5000): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val tf = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val nDocs = docs.select(col(idCol)).distinct().count()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") * 10000 < lit(nDocs) * maxDfBps)
    val digitsN = nDocs.toString.length.toLong
    // weighted feeds FOUR consumers (norms x2 via qn/bn, q, dots' base
    // side); materialize it once or each action replays the tf ⋈ df join
    val weighted = tf.join(df, Seq("tok"))
      .withColumn("w",
        col("tf") * (lit(1L + digitsN) - length(col("df").cast("string"))))
      .localCheckpoint()
    val norms = weighted.groupBy(col(idCol)).agg(sum(col("w") * col("w")).as("nrm"))
      .localCheckpoint()
    val q = weighted.filter(isQuery)
      .select(col(idCol).as("query_id"), col("tok"), col("w").as("qw"))
      // pinned for the same amplification reason as [[cosineTopK]]'s
      // posting join — AQE sees MBs in, but the join fans out ~100x
      .repartition(par, col("tok"))
    val dots = q.join(weighted.filter(!isQuery).repartition(par, col("tok")), Seq("tok"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("qw") * col("w")).as("dot"))
    val qn = norms.filter(isQuery).select(col(idCol).as("query_id"), col("nrm").as("qnrm"))
    val bn = norms.filter(!isQuery).select(col(idCol), col("nrm").as("bnrm"))
    val scored = dots
      .join(broadcast(qn), Seq("query_id"))
      .join(bn, Seq(idCol))
      .withColumn("cos_ppm",
        floor(lit(1000000.0) * col("dot")
          / sqrt(col("qnrm").cast("double") * col("bnrm").cast("double"))).cast("long"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_ppm").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"), col("cos_ppm"))
  }
}
