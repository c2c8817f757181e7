package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TEXMEX `.fvecs` / `.ivecs` readers (SURVEY §2.1 S1/S2) — the reference's
  * on-disk input format: repeated records of little-endian `int32 d`
  * followed by `d` payload words (float32 for fvecs, int32 for ivecs);
  * decoder at `/root/reference/dynamic_script_faiss.py:9-15`.
  *
  * Spark mapping: `binaryRecords` with the fixed record length `4*(d+1)`
  * (dimension self-described by the first record) + a `mapPartitions`
  * decode. Row ids are positional (`np.arange` in the reference) —
  * derived here from the record offset via `zipWithIndex`, which preserves
  * file order across partitions.
  */
object Fvecs {

  /** Read the self-described dimension from the first 4 bytes (of the
    * lexicographically first shard, if `path` is a sharded directory). */
  def readDim(spark: SparkSession, path: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val target =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).filterNot(n =>
          n.getName.startsWith("_") || n.getName.startsWith("."))
          .minBy(_.getName)
      else p
    val in = fs.open(target)
    try {
      val buf = new Array[Byte](4)
      in.readFully(0L, buf)
      ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  /** Positionally-id'd records of `path` (a file, or a sharded
    * directory). For a directory, ids are assigned per shard in
    * LEXICOGRAPHIC NAME ORDER with offsets derived from file sizes —
    * Hadoop's split enumeration order across multiple files is not
    * guaranteed, so a global zipWithIndex would shuffle ids between
    * shards. Within one file, fixed-length splits enumerate in offset
    * order, so per-file zipWithIndex is stable. */
  private def readRecords(spark: SparkSession, path: String,
      recLen: Int): org.apache.spark.rdd.RDD[(Long, Array[Byte])] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith(".")).sortBy(_.getPath.getName)
      else Array(st)
    val rdds = files.scanLeft(0L -> Option.empty[org.apache.spark.rdd.RDD[(Long, Array[Byte])]]) {
      case ((offset, _), f) =>
        require(f.getLen % recLen == 0,
          s"${f.getPath}: length ${f.getLen} is not a multiple of the $recLen-byte record")
        val base = offset
        val rdd = spark.sparkContext.binaryRecords(f.getPath.toString, recLen)
          .zipWithIndex().map { case (bytes, i) => (base + i, bytes) }
        (offset + f.getLen / recLen, Some(rdd))
    }.flatMap(_._2)
    spark.sparkContext.union(rdds.toIndexedSeq)
  }

  /** `.fvecs` → (id: Long, vector: Array[Float]). `path` may be a single
    * file or a [[writeFvecsSharded]] directory. */
  def readFvecs(spark: SparkSession, path: String): DataFrame = {
    val d = readDim(spark, path)
    val rows = readRecords(spark, path, 4 * (d + 1)).map { case (idx, bytes) =>
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dim = bb.getInt
      require(dim == d, s"inconsistent dimension $dim at record $idx (expected $d)")
      val v = new Array[Float](d)
      var i = 0
      while (i < d) { v(i) = bb.getFloat; i += 1 }
      Row(idx, v)
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false))))
  }

  /** `.ivecs` → (id: Long, ids: Array[Int]) — the ground-truth format. */
  def readIvecs(spark: SparkSession, path: String): DataFrame = {
    val d = readDim(spark, path)
    val rows = readRecords(spark, path, 4 * (d + 1)).map { case (idx, bytes) =>
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dim = bb.getInt
      require(dim == d, s"inconsistent dimension $dim at record $idx (expected $d)")
      val v = new Array[Int](d)
      var i = 0
      while (i < d) { v(i) = bb.getInt; i += 1 }
      Row(idx, v)
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ids", ArrayType(IntegerType, containsNull = false), nullable = false))))
  }

  /** Distributed sharded export — the 100 TB form of [[writeFvecs]]:
    * range-sort by id, then each partition streams its records straight
    * to one `part-NNNNN.fvecs` shard through the Hadoop FS API (local /
    * HDFS / object store). Shard names sort in id order, so reading the
    * DIRECTORY with [[readFvecs]] reassigns the same positional ids —
    * the round-trip contract the fixture-scale writer has, without ever
    * collecting vectors to the driver. */
  def writeFvecsSharded(df: DataFrame, path: String, numShards: Int = 0): Unit = {
    val pathStr = path
    val cols = df.select("id", "vector")
    val ranged =
      if (numShards > 0) cols.repartitionByRange(numShards, org.apache.spark.sql.functions.col("id"))
      else cols.repartitionByRange(org.apache.spark.sql.functions.col("id"))
    ranged.sortWithinPartitions("id").rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        if (rows.isEmpty) Iterator.empty
        else {
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(pathStr), new org.apache.hadoop.conf.Configuration())
          val shard = new org.apache.hadoop.fs.Path(pathStr, f"part-$pid%05d.fvecs")
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(fs.create(shard, true)))
          var n = 0L
          try rows.foreach { r =>
            val v = r.getAs[scala.collection.Seq[Float]](1)
            val bb = ByteBuffer.allocate(4 * (v.length + 1)).order(ByteOrder.LITTLE_ENDIAN)
            bb.putInt(v.length)
            v.foreach(bb.putFloat)
            out.write(bb.array())
            n += 1
          } finally out.close()
          Iterator.single(n)
        }
      }.count(): Unit
  }

  /** Writer (test fixture generation + export parity with the reference's
    * format). Single-file, driver-side — fixtures only. */
  def writeFvecs(path: String, vectors: Seq[Array[Float]]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try vectors.foreach { v =>
      val bb = ByteBuffer.allocate(4 * (v.length + 1)).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putFloat)
      out.write(bb.array())
    } finally out.close()
  }

  def writeIvecs(path: String, vectors: Seq[Array[Int]]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try vectors.foreach { v =>
      val bb = ByteBuffer.allocate(4 * (v.length + 1)).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putInt)
      out.write(bb.array())
    } finally out.close()
  }
}
