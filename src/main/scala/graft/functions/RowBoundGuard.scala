package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Runtime tripwire for the bounded-window allowlist (r10 verdict item
  * 5): `WindowAuditSpec`'s allowlist is build-time prose — each entry
  * CLAIMS its unpartitioned window reads a metadata-sized input
  * (calendar/domain/constant cardinality), and nothing at runtime
  * checked the claim. This predicate counts the rows that actually flow
  * through the task it runs in and throws past `bound`, turning every
  * allowlist justification into an enforced contract.
  *
  * Placement contract: apply as a `filter` DIRECTLY ABOVE the global
  * window (all allowlisted window functions — lag, row_number, running
  * sums, share-of-total — are 1:1, so output rows = input rows). The
  * expression is [[Nondeterministic]], which Catalyst never pushes
  * through or reorders past other operators, so the count runs in the
  * window's own single-partition stage and therefore sees the window's
  * TOTAL row flow — a per-partition count anywhere else would
  * undercount. Always-true on healthy inputs: plans, values, and oracle
  * hashes are unchanged.
  */
case class UnderRowBound(bound: Long, tag: String)
    extends LeafExpression with Nondeterministic with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "under_row_bound"

  @transient private[this] var seen: Long = 0L

  override protected def initializeInternal(partitionIndex: Int): Unit =
    seen = 0L

  override protected def evalInternal(input: InternalRow): Any = {
    seen += 1
    if (seen > bound)
      throw new IllegalStateException(
        s"[window-guard:$tag] bounded-window contract violated: more than " +
          s"$bound rows reached an allowlisted global window — the input " +
          "is no longer metadata-sized; de-globalize it via " +
          "Eval.withGlobalRowNumber or re-justify the bound in " +
          "WindowAuditSpec")
    true
  }
}

/** Column-level surface of [[UnderRowBound]]. */
object Guards {
  import org.apache.spark.sql.{Column, DataFrame}

  /** Default ceiling for "metadata-sized": generous against every
    * allowlisted cardinality (days, domains, constant shortlists — all
    * ≤ 10⁴ on any input this engine targets) while 60× under the
    * sf0.1 corpus, so a data-sized regression trips long before it
    * degrades a bench draw. */
  val MaxBoundedWindowRows: Long = 100000L

  def underRowBound(bound: Long, tag: String): Column =
    org.apache.spark.sql.graft.bridge.column(UnderRowBound(bound, tag))

  /** Guard an allowlisted global window: call on the window's OUTPUT
    * (1:1 window functions only — see [[UnderRowBound]]'s placement
    * contract). */
  def boundedWindow(df: DataFrame, tag: String,
      bound: Long = MaxBoundedWindowRows): DataFrame =
    df.filter(underRowBound(bound, tag))
}
