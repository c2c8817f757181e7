package graft.tools

/** Dump the rendered `SparkEntry.oracleSql` map (sorted by name) to a
  * text file — the A/B harness for oracle refactors: render at HEAD and
  * at the working tree, `diff` the two dumps, and any refactor that was
  * supposed to be text-preserving (constant extraction, s-interpolation)
  * must show an empty diff. Used to prove the round-9 BitextK
  * parameterization byte-identical. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val w = new java.io.PrintWriter(args(0))
    graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (k, v) =>
      w.println("===== " + k)
      w.println(v)
    }
    w.close()
  }
}
