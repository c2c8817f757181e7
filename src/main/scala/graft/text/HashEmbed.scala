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
  * shared-bucket equi-join + Σ products. At fixture scale (dim 256) the
  * posting lists are dense and the join degenerates to brute force; at
  * 100 TB the same plan runs with dim 2¹⁸, where each bucket's posting
  * list holds corpus_tokens/dim entries and the join IS the pruning —
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
    // materialized once: queries, base, and norms all read the same
    // sparse pass; localCheckpoint (not cache) so the blocks are
    // released by the ContextCleaner after the query
    val sv = sparseVectors(docs, idCol, textCol, dim).localCheckpoint()
    val norms = sv.groupBy(col(idCol)).agg(sum(col("cnt") * col("cnt")).as("nrm"))
    val q = sv.filter(isQuery)
      .select(col(idCol).as("query_id"), col("bucket"), col("cnt").as("qcnt"))
    val dots = q.join(sv.filter(!isQuery), Seq("bucket"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("qcnt") * col("cnt")).as("dot"))
    val qn = norms.filter(isQuery).select(col(idCol).as("query_id"), col("nrm").as("qnrm"))
    val bn = norms.filter(!isQuery).select(col(idCol), col("nrm").as("bnrm"))
    val scored = dots
      .join(broadcast(qn), Seq("query_id"))
      .join(bn, Seq(idCol))
      .withColumn("cos_ppm",
        floor(lit(1000000.0) * col("dot") / sqrt((col("qnrm") * col("bnrm")).cast("double")))
          .cast("long"))
    // per-query candidates are bounded by the posting-list intersection
    // (≈ corpus_tokens/dim per bucket), so the window partition is small
    // by construction at real dim — the heap aggregate isn't needed here
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_ppm").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"), col("cos_ppm"))
  }
}
