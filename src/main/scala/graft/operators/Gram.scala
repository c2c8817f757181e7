package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Gram-matrix sketch over a vector column — the single-pass
  * matrix summary behind PCA/whitening/covariance monitoring of an
  * embedding corpus (MLlib's `RowMatrix.computeGramianMatrix` shape, the
  * reference's `xb` matrix statistics recast as a mergeable aggregate).
  *
  * Scale design: each partition folds its rows into ONE d·(d+1)/2 long
  * array (the upper triangle of Σ vᵢ·vᵀᵢ) and only those model-sized
  * partials move — a treeReduce of ~2 KB·d²/8 buffers, never a shuffle
  * of the data. At 100 TB the cost is one scan plus log(#partitions)
  * combine rounds; the driver materializes only the d×d triangle
  * (4,160 longs at d=64), which is artifact-sized, not data-sized.
  *
  * Components are grid-quantized to integers before multiplication so
  * the fold is exact int64 arithmetic: engine-order immune and replayable
  * bit-for-bit by any engine (the DuckDB oracle). With |v| ≤ ~8 and
  * scale 1024, each product is ≤ ~2²⁶ and int64 holds sums over ~10¹¹
  * rows per (i,j) cell with headroom.
  */
object Gram {

  /** Upper-triangle Gram matrix of `vecCol` (array&lt;float&gt;), components
    * quantized by `floor(v·scale + 0.5)`. Output: one row per (dim_i ≤
    * dim_j) pair, 1-based dims, `gram = Σ_rows g_i·g_j` exact int64. */
  def upperTriangle(spark: SparkSession, vectors: DataFrame, vecCol: String,
      scale: Long): DataFrame = {
    import spark.implicits._
    val quantized = vectors
      .select(transform(col(vecCol),
        v => floor(v.cast("double") * scale + lit(0.5)).cast("long")).as("g"))
      .as[Array[Long]]
    val partials = quantized.rdd.mapPartitions { it =>
      var buf: Array[Long] = null
      var d = 0
      it.foreach { v =>
        if (buf == null) { d = v.length; buf = new Array[Long](d * (d + 1) / 2) }
        require(v.length == d,
          s"gram: ragged vector column ($d vs ${v.length} elements)")
        var k = 0
        var i = 0
        while (i < d) {
          val vi = v(i)
          var j = i
          while (j < d) { buf(k) += vi * v(j); j += 1; k += 1 }
          i += 1
        }
      }
      if (buf == null) Iterator.empty else Iterator.single(buf)
    }
    // treeAggregate, not treeReduce: the empty-array zero makes an empty
    // input legal (one scan either way — no extra isEmpty job)
    val merge = (a: Array[Long], b: Array[Long]) =>
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a.length == b.length, "gram: partials of different dimension")
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    val tri = partials.treeAggregate(Array.emptyLongArray)(merge, merge, depth = 2)
    if (tri.isEmpty) return spark.range(0)
      .select(lit(0).as("dim_i"), lit(0).as("dim_j"), lit(0L).as("gram"))
    // solve d from the triangle size d·(d+1)/2
    val d = ((math.sqrt(8.0 * tri.length + 1) - 1) / 2).round.toInt
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield (i + 1, j + 1, tri(i * d - i * (i - 1) / 2 + (j - i)))
    rows.toDF("dim_i", "dim_j", "gram")
  }

  /** PCA-style projection onto the (unnormalized) dominant spectral
    * direction, ALL in exact integer arithmetic: the Gram matrix is
    * computed distributed ([[upperTriangle]]), `iters` power-iteration
    * rounds run on the driver over the d×d triangle (model-sized — µs
    * of work), each matrix-vector entry divided by 2^`shift` (truncating) to
    * keep magnitudes bounded, and the resulting direction broadcasts
    * back into a codegen'd `zip_with`/`aggregate` dot product over the
    * corpus — one extra scan, no shuffle. Power iteration converges
    * geometrically to the top eigenvector (the PSD Gram's dominant
    * direction is the top principal axis of the uncentered data);
    * truncating int64 division matches integer `//` in any engine, so a fixed
    * iteration count replays bit-for-bit (the DuckDB oracle unrolls the
    * same two rounds as joins over the triangle).
    *
    * Output: (id, proj) with proj = Σ_dim g_dim · v_dim in int64. */
  def topComponentProject(spark: SparkSession, vectors: DataFrame, idCol: String,
      vecCol: String, scale: Long, iters: Int = 2, shift: Int = 20): DataFrame = {
    val tri = upperTriangle(spark, vectors.select(col(vecCol)), vecCol, scale)
      .collect()
    if (tri.isEmpty) return spark.range(0)
      .select(lit(0L).as(idCol), lit(0L).as("proj"))
    val d = tri.iterator.map(_.getInt(1)).max
    val g = Array.ofDim[Long](d, d)
    tri.foreach { r =>
      val (i, j, v) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getLong(2))
      g(i)(j) = v
      g(j)(i) = v
    }
    var v = Array.fill(d)(1L)
    for (_ <- 1 to iters) {
      val next = new Array[Long](d)
      var i = 0
      while (i < d) {
        var s = 0L
        var j = 0
        while (j < d) { s += g(i)(j) * v(j); j += 1 }
        next(i) = s / (1L << shift) // truncate toward zero: matches int `//`
        i += 1
      }
      v = next
    }
    val vLit = array(v.map(lit(_)): _*)
    vectors.select(col(idCol),
      aggregate(
        zip_with(
          transform(col(vecCol),
            x => floor(x.cast("double") * scale + lit(0.5)).cast("long")),
          vLit, (gq, vv) => gq * vv),
        lit(0L), (acc, x) => acc + x).as("proj"))
  }
}
