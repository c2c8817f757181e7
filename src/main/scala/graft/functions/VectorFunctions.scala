package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity kernels over `ArrayType(FloatType)` columns.
  *
  * The reference computes L2 distance inside FAISS/hnswlib C++ kernels
  * (`/root/reference/dynamic_script_faiss.py:53-60`); here the kernels are
  * Catalyst higher-order functions (`zip_with` + `aggregate`), which stay
  * inside whole-stage codegen — no UDF/boxing on the hot path.
  *
  * All arithmetic is promoted to double so results are bit-comparable with
  * the DuckDB oracle (which computes list functions in double).
  */
object VectorFunctions {

  /** Squared L2 distance. Squared form is order-equivalent to L2 (the
    * reference's FAISS backend also returns squared L2) and avoids a sqrt
    * per candidate pair. Native fused-loop codegen ([[L2SquaredDistance]]);
    * bit-identical to the HOF formulation in [[l2sqHof]]. */
  def l2sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      L2SquaredDistance(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** Reference HOF formulation of [[l2sq]] (used to cross-check codegen). */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2sq(a, b))

  /** Dot product (native fused-loop codegen, see [[DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      DotProduct(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** Reference HOF formulation of [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — fused single-pass kernel ([[CosineSimilarity]]);
    * bit-identical to `dot(a,b) / (norm2(a) * norm2(b))`. For self-joins
    * where one side's norm can be precomputed per row, compose `dot` with
    * cached norm columns instead (see Dedup.embeddingNearDup). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      CosineSimilarity(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  /** Composed formulation of [[cosine]] (cross-check reference). */
  def cosineComposed(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))
}
