package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: every registered query must run and
  * produce rows at the smoke scale factor (the driver's t1/t2 behavior),
  * and the oracle map must stay consistent with the query map. */
class ContractSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("every declared query is oracle-checked (no rows-only entries)") {
    // The entire declared contract hash-matches DuckDB: portable
    // PolyHash dedup family, double-codec SQ8, hash-sign LSH, and the
    // integer-Lloyd IvfFlat/PqFlat (which replace the MLlib-KMeans
    // variants in the contract — those stay in the library, spec-tested
    // in KnnSpec, but float-summed iterative training cannot be
    // replayed by a SQL oracle).
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only queries crept in: $rowsOnly")
  }

  test("every registered query runs and returns rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        if (fn(spark, dir).count() > 0) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
