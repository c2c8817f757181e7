package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * `randomSplit` re-rolls across retries and cluster re-runs; production
  * pipelines split by a **hash of the row id** instead, so a row's
  * assignment is a pure function of its identity — stable across runs,
  * machines, and engine versions. The Knuth multiplicative mix below is
  * exact 64-bit arithmetic, so the split is reproducible in any engine
  * (and DuckDB-oracle-checkable, unlike engine-specific hash functions).
  */
object Sampling {

  /** Bucket in [0, buckets) from the id — Knuth multiplicative hashing
    * computed as (id · 2654435761) mod 2³², with the multiply split into
    * 16-bit halves so no intermediate exceeds 2⁴⁹: a naive `id * K`
    * overflows int64 for ids above ~3.5e9 (a runtime error under ANSI
    * mode — Spark 4's default — and in DuckDB), which a 100 TB id space
    * absolutely reaches. Every step stays in exact wrap-free int64
    * arithmetic, so the bucket is reproducible in any engine. */
  /** Rendezvous (highest-random-weight) shard assignment — the
    * deterministic router that moves the MINIMUM of keys when the shard
    * count changes: key k goes to argmax_s weight(k, s), so adding shard
    * S relocates exactly the keys whose new argmax IS S (≈ 1/(S+1) of
    * them) and never shuffles a key between two old shards. Row-local
    * integer arithmetic (Knuth-mix per (key, shard), mod a prime), so
    * any engine replays the assignment bit-for-bit and a 100 TB table
    * routes with zero shuffle — the expression IS the partitioner.
    * Ties break to the lowest shard id (first position of the max). */
  def withRendezvousShard(df: org.apache.spark.sql.DataFrame, idCol: String,
      shards: Int, outCol: String): org.apache.spark.sql.DataFrame = {
    // weight(k, s) must MIX s through the multiply — an additive-only
    // (h + s·c) % p is linear in s, so argmax follows the mod wrap and
    // a scale-out moves ~2/S of keys instead of ~1/(S+1)
    val p = 1000000007L
    val ms = s"transform(sequence(0, ${shards - 1}), " +
      s"s -> ((pmod($idCol, ${p}L) + (s + 1) * 97003999L) % ${p}L * 2654435761L) % ${p}L)"
    df.withColumn(outCol, expr(s"array_position($ms, array_max($ms)) - 1"))
  }

  def idBucket(id: Column, buckets: Int): Column = {
    val k = 2654435761L // Knuth's 2^32 / phi
    val a = pmod(id.cast("long"), lit(4294967296L)) // id mod 2^32
    val hi = shiftright(a, 16) // top 16 bits
    val lo = a.bitwiseAND(lit(65535L)) // low 16 bits
    // (hi·2^16 + lo)·K mod 2^32 = ((hi·K mod 2^16)·2^16 + lo·K) mod 2^32
    val mixed = pmod(pmod(hi * lit(k), lit(65536L)) * lit(65536L) + lo * lit(k),
      lit(4294967296L))
    pmod(mixed, lit(buckets.toLong))
  }

  /** Deterministic train/test split: rows with bucket < trainPct go to
    * train. Returns the input with a `split` column ("train"/"test"). */
  def trainTestSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(idBucket(col(idCol), 100) < trainPct, lit("train")).otherwise(lit("test")))

  /** Deterministic weighted Bernoulli sampling: keep a row with
    * probability `weightBps`/10000, decided by the row's id hash — the
    * data-mixing primitive (up/down-weight sources by quality or length)
    * as a pure map-side filter: no shuffle, no RNG state, identical
    * keep-set on every run, engine, and retry. The weight column may be
    * any deterministic expression of the row. */
  def weightedSample(df: DataFrame, idCol: String, weightBps: Column): DataFrame =
    df.filter(idBucket(col(idCol), 10000) < weightBps)

  /** Stratified cap: at most n rows per stratum, deterministic order. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
