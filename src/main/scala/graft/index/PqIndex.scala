package graft.index

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{GraftFunctions, PqAdcDistance}

/** Product quantization — the PQ half of FAISS `IndexIVFPQ` (SURVEY §2.2
  * I2; `/root/reference/multi_tenant_script.py:94-99`: m=16 subquantizers ×
  * 8 bits, trained on the `xt` sample).
  *
  * Split the d-dim vector into `m` subvectors of d/m dims; per subspace,
  * k-means `ksub` centroids form a codebook; a vector's code is its m
  * nearest-centroid ids (m bytes at ksub=256 — a 32× compression of the
  * 64-dim float fixture). Search uses ADC: the query precomputes a
  * (m × ksub) table of subvector-to-centroid distances, and each
  * candidate's approximate distance is m table lookups
  * ([[graft.functions.PqAdcDistance]]).
  *
  * Codebook training runs Lloyd's iterations on a bounded driver-side
  * sample — the same regime as the reference (FAISS trains on the 100k
  * `xt` sample, not the base set); encoding and search are fully
  * distributed (mapPartitions over a broadcast codebook + codegen ADC).
  */
final case class PqModel(
    m: Int, ksub: Int, dsub: Int,
    // codebooks(j)(c) = centroid c of subspace j, length dsub
    codebooks: Array[Array[Array[Float]]],
    encodedBase: DataFrame) // (vec_id, codes: array<int>)

object PqIndex {

  /** Deterministic Lloyd's k-means for one subspace on a driver-side
    * sample. Seeded init by stable hash order; empty clusters re-seeded
    * from the farthest points. */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Float]] = {
    val d = points(0).length
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(points.indices.toVector).take(k)
      .map(i => points(i).clone()).toArray
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < points.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var j = 0
          while (j < d) { val t = points(i)(j) - centroids(c)(j); dist += t * t; j += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      i = 0
      while (i < points.length) {
        val a = assign(i); counts(a) += 1
        var j = 0
        while (j < d) { sums(a)(j) += points(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { centroids(c)(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
        } else {
          centroids(c) = points(rnd.nextInt(points.length)).clone()
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** Train codebooks on (a sample of) `train` and encode `base`.
    * Both inputs: (vec_id, embedding: array<float>). */
  def fit(train: DataFrame, base: DataFrame, m: Int = 8, ksub: Int = 16,
      sampleSize: Int = 20000, iters: Int = 12, seed: Long = 42L): PqModel = {
    val spark = train.sparkSession
    val sample = train.select("embedding").limit(sampleSize).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty train set")
    val d = sample(0).length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val dsub = d / m
    val codebooks = Array.tabulate(m) { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(sub, math.min(ksub, sub.length), iters, seed + j)
    }
    PqModel(m, ksub, dsub, codebooks, encode(base, m, ksub, dsub, codebooks))
  }

  /** Distributed encoding: one partition-local pass, primitive loops over
    * the broadcast codebook. Output: (vec_id, codes: array<int>). */
  def encode(df: DataFrame, m: Int, ksub: Int, dsub: Int,
      codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col("vec_id"), col("embedding")).mapPartitions { rows =>
      val cb = bc.value
      rows.map { r =>
        val v = r.getSeq[Float](1)
        val codes = new Array[Int](m)
        var j = 0
        while (j < m) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cb(j).length) {
            var dist = 0.0; var i = 0
            while (i < dsub) { val t = v(j * dsub + i) - cb(j)(c)(i); dist += t * t; i += 1 }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          codes(j) = best
          j += 1
        }
        Row(r.getLong(0), codes)
      }
    }(enc)
  }

  /** Per-query ADC tables: (query_id, table: array<float>[m·ksub]). */
  def queryTables(model: PqModel, queries: DataFrame): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(model.codebooks)
    val (m, ksub, dsub) = (model.m, model.ksub, model.dsub)
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("table", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    queries.select(col("query_id"), col("q_embedding")).mapPartitions { rows =>
      val cb = bc.value
      rows.map { r =>
        val v = r.getSeq[Float](1)
        val table = new Array[Float](m * ksub)
        var j = 0
        while (j < m) {
          var c = 0
          while (c < cb(j).length) {
            var dist = 0.0; var i = 0
            while (i < dsub) { val t = v(j * dsub + i) - cb(j)(c)(i); dist += t * t; i += 1 }
            table(j * ksub + c) = dist.toFloat
            c += 1
          }
          j += 1
        }
        Row(r.getLong(0), table)
      }
    }(enc)
  }

  private def adc(table: Column, codes: Column, ksub: Int): Column =
    org.apache.spark.sql.graft.bridge.column(PqAdcDistance(
      org.apache.spark.sql.graft.bridge.expression(table),
      org.apache.spark.sql.graft.bridge.expression(codes), ksub))

  /** PQ-approximate kNN: broadcast the query tables against the encoded
    * base; distance = m table lookups per pair; bounded-heap top-k.
    * Output: (query_id, neighbor_id, rank). */
  def search(model: PqModel, queries: DataFrame, k: Int): DataFrame = {
    val tables = queryTables(model, queries)
    val topk = GraftFunctions.topKByDist(col("vec_id"), col("dist"), k)
    model.encodedBase
      .crossJoin(broadcast(tables))
      .withColumn("dist", adc(col("table"), col("codes"), model.ksub))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** ADC shortlist + exact re-rank — the standard PQ accuracy recovery:
    * retrieve `shortlist` candidates by compressed-domain ADC, then score
    * only those with exact L2 on the raw vectors. The exact pass touches
    * shortlist·|queries| rows instead of |base|·|queries|. */
  def searchRerank(model: PqModel, queries: DataFrame, base: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    val candidates = search(model, queries, shortlist)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
    val topk = GraftFunctions.topKByDist(col("vec_id"), col("dist"), k)
    candidates
      .join(base, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("dist", graft.functions.VectorFunctions.l2sq(col("q_embedding"), col("embedding")))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF+PQ+rerank — the full IndexIVFPQ search pipeline: cluster pruning
    * (nprobe), compressed-domain ADC shortlist, exact rerank. */
  def searchIvfRerank(ivf: IvfModel, model: PqModel, queries: DataFrame, base: DataFrame,
      k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val candidates = searchIvf(ivf, model, queries, shortlist, nprobe)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
    val topk = GraftFunctions.topKByDist(col("vec_id"), col("dist"), k)
    candidates
      .join(base, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("dist", graft.functions.VectorFunctions.l2sq(col("q_embedding"), col("embedding")))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF+ADC: prune candidates to the query's nprobe clusters (IvfIndex),
    * then PQ-approximate distances within — the full IndexIVFPQ analog. */
  def searchIvf(ivf: IvfModel, model: PqModel, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = IvfIndex.probe(ivf, queries, nprobe)
      .select(col("query_id"), col("cluster_id"))
    val tables = queryTables(model, queries)
    val probedTables = probed.join(tables, Seq("query_id"))
    val assignedCodes = ivf.assignedBase.select(col("vec_id"), col("cluster_id"))
      .join(model.encodedBase, Seq("vec_id"))
    val topk = GraftFunctions.topKByDist(col("vec_id"), col("dist"), k)
    assignedCodes
      .join(broadcast(probedTables), Seq("cluster_id"))
      .withColumn("dist", adc(col("table"), col("codes"), model.ksub))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))
  }
}
