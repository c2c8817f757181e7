package graft.index

import org.apache.spark.sql.Column

/** Test-side door into `private[index]` helpers. */
object PqTestAccess {
  def adcTable(qv: Column, cb: Array[Array[Array[Long]]], dsub: Int): Column =
    PqFlat.adcTable(qv, cb, dsub)
}
