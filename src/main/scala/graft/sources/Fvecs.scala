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

  /** Read the self-described dimension from the first 4 bytes. */
  def readDim(spark: SparkSession, path: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    try {
      val buf = new Array[Byte](4)
      in.readFully(0L, buf)
      ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN).getInt
    } finally in.close()
  }

  /** `.fvecs` → (id: Long, vector: Array[Float]). */
  def readFvecs(spark: SparkSession, path: String): DataFrame = {
    val d = readDim(spark, path)
    val records = spark.sparkContext.binaryRecords(path, 4 * (d + 1))
    val rows = records.zipWithIndex().map { case (bytes, idx) =>
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
    val records = spark.sparkContext.binaryRecords(path, 4 * (d + 1))
    val rows = records.zipWithIndex().map { case (bytes, idx) =>
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
