package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable polynomial string hash:
  *
  *   h = fold(codepoints(s)) { (acc, c) => (acc * base + c) mod m },  h₀ = 0
  *
  * Every intermediate stays below 2⁶³ (m < 2³², base < 2⁹, codepoint <
  * 2²¹), so the SAME value is computable in exact int64 arithmetic in any
  * engine — unlike xxhash64/murmur3, whose implementations are
  * Spark-specific. The DuckDB equivalent is
  *
  *   list_reduce(list_prepend(0, [unicode(s[i]) for i in
  *     generate_series(1, length(s))]), (acc, c) -> (acc * base + c) % m)
  *
  * which is what makes MinHash/SimHash/winnowing pipelines built on this
  * hash fully oracle-checkable. Iterates codepoints (not UTF-16 units or
  * UTF-8 bytes) because that is the unit SQL engines' `unicode()` exposes.
  *
  * Used as the candidate-generation hash for the dedup family; quality is
  * ample for bucketing (the verify step — exact Jaccard / hamming /
  * distance — never depends on hash quality). Codegen keeps it inside
  * whole-stage codegen next to the band/bucket arithmetic.
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  require(base > 0 && base < 512, s"base must be in (0, 512), got $base")
  require(mod > 0 && mod <= (1L << 32), s"mod must be in (0, 2^32], got $mod")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hash($c.toString(), ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** The shared fold, callable from interpreted eval, codegen, and plain
    * Scala (mapPartitions pipelines). */
  def hash(s: String, base: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-level entry point. */
  def column(c: Column, base: Long = 257L, mod: Long = 1000000007L): Column =
    bridge.column(PolyHash(bridge.expression(c), base, mod))
}
