package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.topKByDist
import graft.functions.VectorFunctions._

/** IVF (inverted-file) index — the Spark re-expression of FAISS `IndexIVFPQ`
  * (SURVEY §2.2 I2; `/root/reference/multi_tenant_script.py:94-99`:
  * nlist=100, nprobe=10, trained on `xt`).
  *
  * Physical design: `KMeans(nlist)` over a train split; the base table is
  * augmented with a `cluster_id` column and (at scale) written partitioned /
  * bucketed by it. A query probes only its `nprobe` nearest centroids, so
  * the candidate join is an **equi-join on cluster_id** (hash join, prunable
  * partitions) instead of the brute-force nested loop — the reference's
  * inverted-list pruning becomes Catalyst partition pruning.
  *
  * The centroid table is tiny (nlist rows) and always broadcast; the big
  * base table is never shuffled by the query — only its pruned candidate
  * subset flows into the per-query top-k aggregate.
  */
final case class IvfModel(
    centroids: DataFrame, // (cluster_id: Int, centroid: Array[Double])
    assignedBase: DataFrame) // base columns + cluster_id

object IvfIndex {

  /** Fit KMeans(nlist) on `train` and assign every base row a cluster_id.
    *
    * `train` / `base`: (vec_id: Long, embedding: Array[Float]).
    */
  def fit(train: DataFrame, base: DataFrame, nlist: Int, seed: Long = 42L): IvfModel = {
    val spark = train.sparkSession
    import org.apache.spark.ml.functions.array_to_vector
    val kmeans = new KMeans()
      .setK(nlist)
      .setSeed(seed)
      .setMaxIter(10) // k-means|| init kept: random init costs ~0.09 recall
      .setFeaturesCol("features")
      .setPredictionCol("cluster_id")
    val model = kmeans.fit(train.withColumn("features", array_to_vector(col("embedding"))))
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("cluster_id", "centroid")
    val assigned = model
      .transform(base.withColumn("features", array_to_vector(col("embedding"))))
      .drop("features")
    IvfModel(centroids, assigned)
  }

  /** Assign each query its `nprobe` nearest centroids:
    * (query_id, q_embedding, cluster_id) with nprobe rows per query. */
  def probe(model: IvfModel, queries: DataFrame, nprobe: Int): DataFrame = {
    val probeTopK = topKByDist(col("cluster_id"), col("cdist"), nprobe)
    queries
      .crossJoin(broadcast(model.centroids))
      .withColumn("cdist", l2sq(col("centroid"), col("q_embedding")))
      .groupBy(col("query_id"), col("q_embedding"))
      .agg(probeTopK.as("probed"))
      .select(col("query_id"), col("q_embedding"), explode(col("probed")).as("probed_id"))
      .select(col("query_id"), col("q_embedding"), col("probed_id").cast("int").as("cluster_id"))
  }

  /** IVF pruned kNN over a persisted partitioned layout
    * ([[graft.sources.Layout.writeIvfPartitioned]]): the probe side joins
    * the layout on its partition column, so Catalyst's **dynamic partition
    * pruning** restricts the scan to the probed cluster directories — at
    * cluster scale this reads nprobe/nlist of the files, nothing else.
    * Same output contract as [[search]]. */
  def searchPartitioned(model: IvfModel, layoutPath: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val probed = probe(model, queries, nprobe)
    val topk = topKByDist(col("vec_id"), col("dist"), k)
    graft.sources.Layout.readIvfPartitioned(spark, layoutPath)
      .join(broadcast(probed), Seq("cluster_id"))
      .withColumn("dist", l2sq(col("q_embedding"), col("embedding")))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF pruned kNN: equi-join the probed queries with the assigned base on
    * cluster_id, then the same bounded-heap top-k as exact search.
    * Output: (query_id, neighbor_id, rank). */
  def search(model: IvfModel, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probed = probe(model, queries, nprobe)
    val topk = topKByDist(col("vec_id"), col("dist"), k)
    model.assignedBase
      .join(broadcast(probed), Seq("cluster_id"))
      .withColumn("dist", l2sq(col("q_embedding"), col("embedding")))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))
  }
}
