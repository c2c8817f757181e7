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
  *
  * The contract is surfaced at runtime (ADVICE r11): rows flowing on a
  * partitionIndex > 0 log the per-partition weakening once per task.
  * Logged, not thrown, because the weakening can be a healthy plan: a
  * consumer that reads none of the window's output (a bare `count()`)
  * lets the optimizer prune the global window entirely, and the guard
  * then evaluates over the raw multi-partition input with nothing left
  * to protect.
  */
case class UnderRowBound(bound: Long, tag: String)
    extends LeafExpression with Nondeterministic with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "under_row_bound"

  @transient private[this] var seen: Long = 0L
  @transient private[this] var pid: Int = 0

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    seen = 0L
    pid = partitionIndex
  }

  override protected def evalInternal(input: InternalRow): Any = {
    // Placement contract surfaced at runtime (ADVICE r11's "record"
    // option): a ROW FLOWING on partitionIndex > 0 means the guard is
    // evaluating over a partitioned input, where the task-local count
    // bounds only bound × numPartitions. This is NOT always a bug —
    // when nothing downstream reads the window's output (e.g. a bare
    // `count()`, the bench's timed action) the optimizer legitimately
    // PRUNES the global window and the guard then sits over the raw
    // multi-partition input with nothing left to protect — so the
    // weakening is logged once per task, not failed: a real misplaced
    // call site shows up in the logs of every run, while pruned-window
    // plans (and the bench) keep working.
    if (seen == 0L && pid > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"[window-guard:$tag] rows flowing on partition $pid — bound " +
          s"$bound is per-partition here (window pruned, or guard not " +
          "above a single-partition window)")
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
