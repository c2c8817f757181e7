package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A/B/C harness for the cosine-adjacency hot loop (r9 verdict item 2):
  * the all-pairs degree-16 cosine adjacency build over the sf base,
  * measured warm, one variant per plan:
  *
  *   A  fused 3-accumulator cosine kernel over the raw float vectors
  *      (the r9 shipped plan),
  *   B  pre-normalized DOUBLE unit vectors ranked by -dot (1 FMA/dim,
  *      but 2x bytes/vector on the scan and a UnaryMinus node),
  *   C  pre-normalized unit vectors rounded to FLOAT, query side negated
  *      at normalize time (dist = the bare DotProduct kernel, same scan
  *      bytes as A, 1 FMA/dim, no extra expression node).
  *
  * Usage: runMain graft.tools.CosKernelAB <sfDir> <reps>
  */
object CosKernelAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.{cosine, dot}
    import graft.functions.GraftFunctions.topKByDist

    val base = Tables.embeddingBase(spark, dir).cache()
    base.count()

    def adj(vecs: DataFrame, distOf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): DataFrame = {
      val q = vecs.select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      vecs.crossJoin(broadcast(q))
        .groupBy(col("query_id"))
        .agg(topKByDist(col("vec_id"), distOf(col("q_embedding"), col("embedding")), 17).as("nn"))
        .select(col("query_id"), explode(col("nn")).as("neighbor_id"))
    }

    val unitD = base.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") / col("nrm")).as("embedding"))
    val unitFPos = base.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      .select(col("vec_id"),
        transform(col("embedding"), x => (x.cast("double") / col("nrm")).cast("float")).as("embedding"))

    def time(name: String, df: => DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[ab] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }

    time("A_fused_cosine", adj(base, (a, b) => -cosine(a, b)))
    time("B_unitD_negdot", adj(unitD, (a, b) => -dot(a, b)))
    // C: the query side's unit vectors carry the negation (x / -nrm), so
    // the per-pair dist is the bare DotProduct kernel
    val negQ = base.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => (x.cast("double") / -col("nrm")).cast("float")).as("q_embedding"))
    val cDf = unitFPos.crossJoin(broadcast(negQ))
      .groupBy(col("query_id"))
      .agg(topKByDist(col("vec_id"), dot(col("q_embedding"), col("embedding")), 17).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("neighbor_id"))
    time("C_unitF_negq_dot", cDf)
    // D: same math as C, but the kernel is evaluated in a PROJECTION
    // between the join and the aggregate (the rankTop shape): the dot
    // runs inside the whole-stage-codegen'd join stage and the
    // ObjectHashAggregate boundary materializes (query_id, vec_id, dist)
    // — 24 B/pair — instead of rows carrying both 64-float embeddings
    // (~520 B/pair) evaluated through the agg's own projection.
    val dDf = unitFPos.crossJoin(broadcast(negQ))
      .select(col("query_id"), col("vec_id"),
        dot(col("q_embedding"), col("embedding")).as("dist"))
      .groupBy(col("query_id"))
      .agg(topKByDist(col("vec_id"), col("dist"), 17).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("neighbor_id"))
    time("D_unitF_negq_dot_proj", dDf)
    spark.stop()
  }
}
