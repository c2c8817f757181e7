package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond the built-in surface:
  *
  *  - [[asOf]]: temporal as-of join — for each left row, the latest right
  *    row with `right.ts <= left.ts` per key. Composed from built-ins
  *    (union + last-value window), per the extension preference order
  *    (compose before custom plans): one shuffle on (key), no range
  *    cross-product, scales as a sort within key partitions.
  *  - [[salted]]: skew-safe inner equi-join — explodes the build side into
  *    `saltFactor` replicas and salts the probe side's keys, so one hot
  *    key spreads over saltFactor reducers. Result-identical to the plain
  *    join (asserted in JoinsSpec).
  *  - [[bandPairs]]: range (band) join — pairs within a time band. The
  *    naive plan is a cross join with a theta predicate (quadratic, and
  *    Catalyst can only BroadcastNestedLoop it); the scale plan buckets
  *    both sides into band-width cells and equi-joins each left row's
  *    {cell−1, cell, cell+1} against the right cell — a hash join with
  *    3× fan-out whose per-cell cost is bounded by local density, then
  *    the exact band predicate. Each qualifying pair matches exactly
  *    once (the right row's single cell is in the left row's 3-cell
  *    candidate list iff the band can overlap).
  */
object Joins {

  /** As-of join. `left`/`right` must share `keyCol` and `tsCol`; right
    * columns in `payloadCols` are carried to the matched left row (null if
    * no earlier right row exists). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select((keyCol +: tsCol +: payloadCols).map(col): _*)
      .withColumn("__side", lit(0))
    val leftCols = left.columns.toIndexedSeq
    // align schemas: left payload columns null on the right side rows
    val allCols = (leftCols ++ payloadCols.map("__p_" + _)).distinct
    val lAligned = payloadCols.foldLeft(l)((df, c) => df.withColumn("__p_" + c, lit(null)))
      .select((allCols :+ "__side").map(col): _*)
    val rAligned = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(payloadCols.foldLeft(r)((df, c) => df.withColumnRenamed(c, "__p_" + c)))(
        (df, c) => df.withColumn(c, lit(null)))
      .select((allCols :+ "__side").map(col): _*)
    // order right rows (side 0) before left rows (side 1) at equal ts so
    // a right row at exactly left.ts matches (ASOF >= semantics)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloadCols.foldLeft(lAligned.unionByName(rAligned)) { (df, c) =>
      df.withColumn("__p_" + c, last(when(col("__side") === 0, col("__p_" + c)), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payloadCols.map(c => col("__p_" + c).as(c))): _*)
  }

  /** Salted inner equi-join on `keyCol`: `big` gets a random-but-
    * deterministic salt (hash of a row id), `small` is exploded
    * saltFactor×. */
  def salted(big: DataFrame, small: DataFrame, keyCol: String, saltFactor: Int,
      bigIdCol: String): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(bigIdCol)), lit(saltFactor)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((saltFactor - 1).toLong))))
    saltedBig.join(explodedSmall, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Band join via bucketed co-location: all (left, right) pairs with
    * `|left.msCol − right.msCol| <= widthMs`. Both inputs need a BIGINT
    * millisecond column `msCol` (non-negative). Returns the left rows
    * joined to matching right rows; right columns arrive prefixed with
    * `rPrefix`. Pairs where the exact predicate fails are dropped; left
    * rows with no match are dropped (wrap in a count-with-default for
    * outer semantics). */
  def bandPairs(left: DataFrame, right: DataFrame, msCol: String,
      widthMs: Long, rPrefix: String = "r_"): DataFrame = {
    require(widthMs > 0, "band width must be positive")
    // integer div, not Column./ (floating-point): a double quotient at an
    // exact cell boundary can truncate to cell−1 and silently drop pairs
    val lCell = expr(s"$msCol div $widthMs")
    val l = left.withColumn("__cell",
      explode(array(lCell - 1, lCell, lCell + 1)))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, rPrefix + c))
      .withColumn("__cell", expr(s"$rPrefix$msCol div $widthMs"))
    l.join(r, Seq("__cell"))
      .filter(abs(col(msCol) - col(rPrefix + msCol)) <= widthMs)
      .drop("__cell")
  }

  // Portable Bloom filter: k=3 positions per key, 30 bits per int64 word
  // (bit 63 is never touched, so shifts behave identically in every
  // engine — DuckDB raises on 1<<63 where Java wraps). The multiply is
  // wrap-free: key is first reduced mod 2^31, coefficients are < 2^31,
  // so products stay under 2^62 — no ANSI overflow at any key range.
  private val BloomA = Seq(1103515245L, 1299709L, 15485863L)
  private val BloomB = Seq(12345L, 7919L, 104729L)
  val BloomBitsPerWord = 30

  /** The k bit positions for a key (shared by build and probe). */
  private def bloomPositions(key: Column, numBits: Long): Seq[Column] =
    BloomA.zip(BloomB).map { case (a, b) =>
      pmod(pmod(pmod(key.cast("long"), lit(2147483648L)) * lit(a) + lit(b),
        lit(1000000007L)), lit(numBits))
    }

  /** Build a Bloom filter over `keys` as `numWords` 30-bit words. The
    * build is one aggregation over the (small) key side; the returned
    * array is numWords·8 bytes — broadcast-as-literal to the probe, the
    * runtime-filter pattern: the big side is pruned map-side BEFORE any
    * shuffle or join, which is the entire point at 100 TB. */
  def bloomFilterWords(keys: DataFrame, keyCol: String, numWords: Int): Array[Long] = {
    val numBits = numWords.toLong * BloomBitsPerWord
    val rows = keys
      // a NULL key has no bit positions; dropping it here matches the
      // probe, where a NULL key's test is NULL → filtered out
      .filter(col(keyCol).isNotNull)
      .select(explode(array(bloomPositions(col(keyCol), numBits): _*)).as("pos"))
      .select(expr(s"pos div $BloomBitsPerWord").as("widx"),
        pmod(col("pos"), lit(BloomBitsPerWord.toLong)).as("bit"))
      .groupBy("widx")
      .agg(expr("bit_or(shiftleft(1L, int(bit)))").as("word"))
      .collect()
    val words = new Array[Long](numWords)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Keep only `big` rows whose `keyCol` passes the Bloom filter — no
    * false negatives, deterministic false-positive set (fixed hashes),
    * zero shuffle: the test is a pure map-side expression over a literal
    * word array. */
  def bloomProbe(big: DataFrame, keyCol: String, words: Array[Long]): DataFrame = {
    val numBits = words.length.toLong * BloomBitsPerWord
    val withPos = bloomPositions(col(keyCol), numBits).zipWithIndex
      .foldLeft(big.withColumn("__bloom_words", typedlit(words.toSeq))) {
        case (df, (pos, i)) => df.withColumn(s"__pos$i", pos)
      }
    val test = (0 until BloomA.size).map { i =>
      s"(shiftright(element_at(__bloom_words, int(__pos$i div $BloomBitsPerWord) + 1), " +
        s"int(__pos$i % $BloomBitsPerWord)) & 1) = 1"
    }.mkString(" AND ")
    withPos.filter(expr(test))
      .drop("__bloom_words" +: (0 until BloomA.size).map(i => s"__pos$i"): _*)
  }
}
