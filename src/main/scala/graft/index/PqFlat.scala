package graft.index

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.GraftFunctions.topKByDist
import graft.functions.VectorFunctions.l2sq

/** Deterministic integer-arithmetic product quantizer — the
  * oracle-checkable member of the PQ family next to [[PqIndex]] (MLlib
  * KMeans codebooks). Same construction as [[IvfFlat]], lifted to
  * subspaces: vectors quantize to the 2²⁰ grid, split into `m` 4-d
  * subvectors, and ALL `m` codebooks train in ONE relational Lloyd chain
  * with (sub_id, cid) as the grouping key — integer sums, floor-div
  * means, ties by cid. A SQL engine replays the entire training, the
  * encoding, the ADC scan, and the rerank bit-for-bit.
  *
  * Scale shape: training is two explode-aggregates keyed by
  * (sub_id, cid, pos); the ADC scan is an equi-join of the encoded base
  * (m rows per vector) against the per-query distance table on
  * (sub_id, code) followed by a sum keyed by (query, vec). The
  * lookup-kernel variant ([[PqIndex]] with `PqAdcDistance`) remains the
  * raw-throughput path; this is the reproducibility-grade one.
  */
object PqFlat {

  final case class Model(m: Int, ksub: Int, dsub: Int,
      centroids: DataFrame, // (sub_id, cid, cvec: array<long>[dsub])
      encodedBase: DataFrame, // (vec_id, sub_id, code)
      codes: DataFrame) { // (vec_id, codes: array<int>[m]) — pivoted once at fit
    /** Codebooks on the driver `[sub_id][code] → cvec` (m·ksub·dsub ints
      * — model parameters, literal-broadcast size). */
    lazy val codebookArray: Array[Array[Array[Long]]] =
      collectCodebooks(centroids, m, ksub)
  }

  /** Collect `(sub_id, cid, cvec)` codebook rows into `[sub_id][cid]`. */
  private[index] def collectCodebooks(centroids: DataFrame,
      m: Int, ksub: Int): Array[Array[Array[Long]]] = {
    val arr = Array.ofDim[Array[Long]](m, ksub)
    centroids.collect().foreach { r =>
      arr(r.getAs[Number]("sub_id").intValue)(r.getAs[Number]("cid").intValue) =
        r.getAs[scala.collection.Seq[Long]]("cvec").toArray
    }
    arr
  }

  /** Flat int64 ADC table (entry `sub_id·ksub + code`) computed by the
    * fused [[graft.functions.AdcTableLong]] kernel from an integer
    * vector column and the collected codebooks — the shuffle-free,
    * codegen equivalent of an explode ⋈ codebooks → pivot chain (same
    * values: exact int64 distances, same idx order — residuals and
    * grid points are < 2²¹, so double and int64 accumulation agree
    * exactly). Table construction becomes a map over the query stream,
    * so a 10k-query batch never exchanges to build tables. */
  private[index] def adcTable(qv: Column, cb: Array[Array[Array[Long]]],
      dsub: Int): Column = {
    val ksub = cb(0).length
    val flat = cb.flatMap(_.flatMap(identity))
    org.apache.spark.sql.graft.bridge.column(
      graft.functions.AdcTableLong(
        org.apache.spark.sql.graft.bridge.expression(qv),
        flat, cb.length, ksub, dsub))
  }

  /** Subvector rows (id, sub_id, sv) from quantized vectors. */
  private def subRows(qdf: DataFrame, m: Int, dsub: Int): DataFrame =
    qdf.select(col("vec_id"), col("qv"),
        explode(sequence(lit(0), lit(m - 1))).as("sub_id"))
      .select(col("vec_id"), col("sub_id"),
        expr(s"slice(qv, sub_id * $dsub + 1, $dsub)").as("sv"))

  /** Nearest-centroid assignment within each subspace, ties by cid —
    * the winner is `min(struct(dist, cid))` per (vec_id, sub_id): struct
    * ordering is lexicographic, so the minimum is exactly the window
    * formulation's (dist, cid) head row. A hash aggregate does PARTIAL
    * map-side combining, so the exchange carries n·m winner rows instead
    * of the join's n·m·ksub fan-out through a sort-window (guide §2.3:
    * aggregate before you shuffle); `sv` rides in the group key (it is
    * functionally dependent on (vec_id, sub_id)). */
  private def assign(rows: DataFrame, centroids: DataFrame): DataFrame =
    rows.join(centroids, Seq("sub_id"))
      .select(col("vec_id"), col("sub_id"), col("sv"),
        struct(l2sq(col("sv"), col("cvec")).as("dist"), col("cid").as("cid")).as("dc"))
      .groupBy(col("vec_id"), col("sub_id"), col("sv"))
      .agg(min(col("dc")).as("w"))
      .select(col("vec_id"), col("sub_id"), col("sv"), col("w.cid").as("cid"))

  /** One Lloyd step over every subspace at once: exact integer mean per
    * (sub_id, cid, pos), floor-div rounded; empty cells keep their
    * centroid. */
  private def lloydStep(rows: DataFrame, centroids: DataFrame): DataFrame = {
    val updated = assign(rows, centroids)
      .select(col("sub_id"), col("cid"), posexplode(col("sv")).as(Seq("pos", "e")))
      .groupBy(col("sub_id"), col("cid"), col("pos"))
      .agg(sum(col("e")).as("s"), count(lit(1)).as("cnt"))
      .select(col("sub_id"), col("cid"), col("pos"),
        expr("(2*s + cnt - (((2*s + cnt) % (2*cnt) + 2*cnt) % (2*cnt))) div (2*cnt)").as("c"))
      .groupBy(col("sub_id"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        p => p.getField("c")).as("cvec"))
    centroids.as("p")
      .join(updated.as("u"), Seq("sub_id", "cid"), "left")
      .select(col("sub_id"), col("cid"),
        coalesce(col("u.cvec"), col("p.cvec")).as("cvec"))
  }

  /** Train all m codebooks: quantize → per-subspace init from the ksub
    * smallest Knuth-mixed ids → `iters` joint Lloyd steps → encode. */
  def fit(base: DataFrame, m: Int = 16, ksub: Int = 32, iters: Int = 2): Model = {
    val dim = base.select(size(col("embedding"))).first().getInt(0)
    val bq = base
      .select(col("vec_id"), IvfFlat.quantize(col("embedding")).as("qv"))
      .localCheckpoint()
    fitQuantized(bq, dim, m, ksub, iters)
  }

  /** Train on already-integer vectors `(vec_id, qv: array<long>[dim])` —
    * the entry point [[IvfPq]] uses to train codebooks on IVF residuals
    * (which are integer by construction: grid point − grid centroid). */
  private[index] def fitQuantized(bq: DataFrame, dim: Int,
      m: Int, ksub: Int, iters: Int): Model = {
    require(dim % m == 0,
      s"dim $dim is not divisible by m=$m subspaces — trailing dims would be silently dropped")
    val dsub = dim / m
    val rows = subRows(bq, m, dsub).localCheckpoint()
    // init: same ksub seed vectors for every subspace (id-hash pick)
    val seedIds = bq.select(col("vec_id"),
        graft.operators.Sampling.idBucket(col("vec_id"), 1000000007).as("__mix"))
      .orderBy(col("__mix"), col("vec_id")).limit(ksub)
      .select(col("vec_id")).collect().map(_.getLong(0))
    val rankByIdLit = map(seedIds.toIndexedSeq.zipWithIndex.flatMap { case (id, r) =>
      Seq(lit(id), lit(r))
    }: _*)
    var centroids = rows
      .filter(col("vec_id").isin(seedIds.toIndexedSeq: _*))
      .select(col("sub_id"), rankByIdLit(col("vec_id")).as("cid"), col("sv").as("cvec"))
      .localCheckpoint()
    (0 until iters).foreach { _ =>
      centroids = lloydStep(rows, centroids).localCheckpoint()
    }
    val encoded = assign(rows, centroids)
      .select(col("vec_id"), col("sub_id"), col("cid").as("code"))
      .localCheckpoint()
    Model(m, ksub, dsub, centroids, encoded, codesArray(encoded).localCheckpoint())
  }

  /** Model persistence — the index-DDL artifact: codebooks and encoded
    * base as parquet. Integer model ⇒ round-trips exactly. */
  def save(model: Model, path: String): Unit = {
    model.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    model.codes.write.mode("overwrite").parquet(s"$path/codes")
  }

  def load(spark: SparkSession, path: String, m: Int = 16, ksub: Int = 32, dim: Int = 64): Model = {
    val centroids = spark.read.parquet(s"$path/centroids").localCheckpoint()
    val codes = spark.read.parquet(s"$path/codes").localCheckpoint()
    val encoded = codes.select(col("vec_id"),
        posexplode(col("codes")).as(Seq("sub_id", "code")))
    Model(m, ksub, dim / m, centroids, encoded, codes)
  }

  /** Codes pivoted to one array per vector (index = sub_id) — the
    * compact layout the ADC lookup kernel scans. */
  private[index] def codesArray(encoded: DataFrame): DataFrame =
    encoded.groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("code")))),
        p => p.getField("code").cast("int")).as("codes"))

  /** ADC search with exact rerank: per-query integer distance table
    * (query subvector → every centroid) flattened to an array, scanned
    * against the pivoted base codes with the fused int64 lookup kernel
    * ([[graft.functions.PqAdcDistanceLong]]), bounded-heap shortlist —
    * then exact float top-k on the shortlist. Same integer values as the
    * relational equi-join formulation (which the DuckDB oracle replays),
    * at 1/m the rows through the scan. */
  def searchRerank(model: Model, queries: DataFrame, base: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    val qq = queries.select(col("query_id").as("vec_id"),
      IvfFlat.quantize(col("q_embedding")).as("qv"))
    val qarr = qq.select(col("vec_id").as("query_id"),
      adcTable(col("qv"), model.codebookArray, model.dsub).as("qd"))
    val shortAgg = topKByDist(col("vec_id"), col("adist"), shortlist)
    val short = model.codes
      .crossJoin(broadcast(qarr))
      .select(col("query_id"), col("vec_id"),
        graft.functions.GraftFunctions.pqAdcLong(col("qd"), col("codes"), model.ksub)
          .cast("double").as("adist"))
      .groupBy(col("query_id"))
      .agg(shortAgg.as("cand"))
      .select(col("query_id"), explode(col("cand")).as("vec_id"))
    val topk = topKByDist(col("vec_id"), col("dist"), k)
    short
      .join(base, Seq("vec_id"))
      .join(queries, Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        l2sq(col("q_embedding"), col("embedding")).as("dist"))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))
  }
}
