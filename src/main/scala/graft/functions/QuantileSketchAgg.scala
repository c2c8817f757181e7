package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.operators.QuantileSketch

/** Per-GROUP quantile summary as a native aggregate — the
  * [[graft.operators.QuantileSketch]] Munro–Paterson builder wired into
  * Spark's `TypedImperativeAggregate` machinery (the same harness as
  * [[TopKByDistance]]): map-side partial sketches per group, level-wise
  * serialized across the shuffle, merged associatively-in-bounds on the
  * reduce side. One `groupBy(...).agg(...)` replaces a per-group global
  * sort; each group's state is O(k·log(n/k)) longs however large the
  * group.
  *
  * Eval emits (n, err_bound, estimates[]) for the requested quantiles.
  * The concrete estimates depend on the partition/merge layout (as all
  * mergeable-summary contents do); the CARRIED GUARANTEE — each
  * estimate's true rank within ±err_bound of its target — holds for
  * every layout, which is what the checked query asserts.
  */
case class QuantileSketchAgg(
    value: Expression,
    k: Int,
    qBps: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Builder]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")
  require(qBps.nonEmpty, "at least one quantile")

  override def createAggregationBuffer(): QuantileSketch.Builder =
    new QuantileSketch.Builder(k)

  override def update(buf: QuantileSketch.Builder, input: InternalRow): QuantileSketch.Builder = {
    val v = value.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: QuantileSketch.Builder, other: QuantileSketch.Builder): QuantileSketch.Builder = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: QuantileSketch.Builder): Any = {
    val s = buf.result()
    val ests: Array[Any] =
      if (s.n == 0) Array.fill[Any](qBps.length)(null)
      else qBps.map(q => s.query((s.n - 1) * q / 10000): Any).toArray
    InternalRow(s.n, s.errBound, new GenericArrayData(ests))
  }

  override def serialize(buf: QuantileSketch.Builder): Array[Byte] = {
    val levels = buf.levelSnapshot
    val total = levels.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + levels.length * 4 + total * 8)
    bb.putInt(buf.k).putLong(buf.count).putLong(buf.errBound)
    bb.putInt(levels.length)
    levels.foreach { lv =>
      bb.putInt(lv.length)
      lv.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketch.Builder = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new QuantileSketch.Builder(bb.getInt())
    val n = bb.getLong(); val err = bb.getLong()
    val nLevels = bb.getInt()
    var i = 0
    while (i < nLevels) {
      val len = bb.getInt()
      val arr = new Array[Long](len)
      var j = 0
      while (j < len) { arr(j) = bb.getLong(); j += 1 }
      b.loadLevel(i, arr)
      i += 1
    }
    b.loadCounts(n, err)
    b
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err_bound", LongType, nullable = false),
    StructField("ests", ArrayType(LongType, containsNull = true), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def child: Expression = value
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(value = newChild)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}
