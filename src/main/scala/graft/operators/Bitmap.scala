package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Roaring-style block bitmap index over an int64 id column — the
  * compressed id-set representation OLAP engines use for predicate
  * caching and filtered vector search (Milvus/Weaviate pre-filter
  * bitmaps; Druid/Pinot inverted-index posting bitmaps).
  *
  * Layout: ids are grouped into 32-id blocks (`block = id >> 5`) and
  * each block stores one int64 word whose low 32 bits mark the present
  * ids (`bit = id & 31`). A predicate's id set of n rows compresses to
  * ≤ n (usually ≪ n) block rows; set algebra (AND/OR/ANDNOT) becomes a
  * block-aligned equi-join + a single bitwise op per word — no row-level
  * join ever touches the original ids. At 100 TB the bitmap is built
  * with one groupBy shuffle of (block, bit) pairs and intersecting two
  * predicates costs a join over blocks (32× smaller than the id space),
  * with `bit_count` popcounts giving cardinalities without expanding a
  * single id back out.
  *
  * 32-bit words inside int64 keep every shift in non-negative range so
  * the words replay identically in any engine (DuckDB's `<<`/`bit_or`
  * aggregate produce the same two's-complement values).
  */
object Bitmap {

  /** Block bitmap of `idCol` under `pred`: one row per non-empty block,
    * `word` = OR of `1 << (id & 31)`. */
  def build(df: DataFrame, idCol: String, pred: Column): DataFrame =
    df.filter(pred)
      .select(shiftrightunsigned(col(idCol).cast("long"), 5).as("block"),
        expr(s"shiftleft(1L, int($idCol % 32))").as("bit"))
      .groupBy(col("block"))
      .agg(expr("bit_or(bit)").as("word"))

  /** Intersect two block bitmaps: inner join on block (absent block =
    * empty word ⇒ empty intersection), AND the words, drop empty
    * results, popcount survivors. */
  def and(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("block"), col("word").as("word_a"))
      .join(b.select(col("block"), col("word").as("word_b")), Seq("block"))
      .withColumn("word_both", col("word_a").bitwiseAND(col("word_b")))
      .filter(col("word_both") =!= 0L)
      .withColumn("n_both", bit_count(col("word_both")).cast("long"))
}
