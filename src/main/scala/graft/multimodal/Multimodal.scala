package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, decoded/featurized in
  * batched partition-local passes.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * environment): [[stubDecode]] derives a deterministic fake feature vector
  * from the payload bytes. Everything around it — schema, binary payload
  * handling, batch shape (one partition-local pass, constant memory per
  * row), partitioning preservation — is the real production plumbing: swap
  * `stubDecode` for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  val FeatureDim = 8

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Wrap any table with a string column into a media table: the string
    * bytes become the opaque payload (the fixtures ship no real media, so
    * text bytes stand in for an encoded image). */
  def asMediaTable(df: DataFrame, idCol: String, payloadStrCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      encode(col(payloadStrCol), "UTF-8").as("payload"),
      lit(mediaType).as("media_type"),
      octet_length(encode(col(payloadStrCol), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decoder ??? — stands in for e.g. JPEG decode + CNN featurize.
    * Deterministic: feature j = byte-sum of every FeatureDim-th byte,
    * normalized. Replace with a real codec to productionize. */
  private[multimodal] def stubDecode(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** Partition-local batched feature extraction: mapPartitions over the
    * binary payloads — the Scala analog of a pandas-UDF `mapInPandas`
    * pass. Output schema: (media_id, media_type, n_bytes, features). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("media_type"), col("n_bytes"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), r.getString(1), r.getLong(2), stubDecode(r.getAs[Array[Byte]]("payload")))
        }
      }(enc)
  }

  /** Integer feature extraction — the ORACLE-CHECKABLE variant of
    * [[extractFeatures]]: feature j = exact int64 sum of byte values at
    * payload positions ≡ j (mod dim). Same partition-local batch shape
    * as the float stub; being integer, a SQL engine replays it exactly
    * (over ASCII-sanitized payloads where byte == codepoint). Swap the
    * byte-sum for a real codec + quantized featurizer and the plumbing
    * — schema, batching, partitioning — is unchanged. */
  def extractIntFeatures(media: DataFrame, dim: Int = FeatureDim): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(LongType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val p = r.getAs[Array[Byte]](1)
          val acc = new Array[Long](dim)
          var i = 0
          while (i < p.length) { acc(i % dim) += (p(i) & 0xFF).toLong; i += 1 }
          Row(r.getLong(0), acc.toSeq)
        }
      }(enc)
  }

  /** Frame sampling: overlapping byte windows over the payload — the
    * video/audio frame-extraction shape (stub "decode" = identity byte
    * slicing; a real codec would decode then stride over frames, same
    * plumbing). One row per frame with its digest; row-local flatMap, no
    * shuffle, constant memory per frame. */
  def frameSample(media: DataFrame, frameBytes: Int = 256, stride: Int = 192): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val p = r.getAs[Array[Byte]](1)
          val n = p.length
          val smax = if (n <= frameBytes) 0 else ((n - frameBytes + stride - 1) / stride) * stride
          (0 to smax by stride).iterator.map { st =>
            Row(r.getLong(0), st / stride,
              java.util.Arrays.copyOfRange(p, st, math.min(n, st + frameBytes)))
          }
        }
      }(enc)
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_digest"))
  }

  /** Audio-style fixed-window energy analysis — the VAD
    * (voice-activity-detection) shape over a sample stream: the payload
    * strides into NON-overlapping windows ([[frameSample]] strides
    * overlapping frames), each emitting its exact int64 energy (Σ
    * sample value) and an active verdict (mean sample ≥ threshold,
    * compared cross-multiplied in integers — no division). Row-local
    * flatMap, no shuffle, constant memory per window; a real build
    * swaps byte values for decoded PCM samples and keeps the plumbing. */
  def audioWindows(media: DataFrame, windowBytes: Int = 128,
      meanThreshold: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("win_idx", IntegerType, nullable = false),
      StructField("win_bytes", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("active", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val p = r.getAs[Array[Byte]](1)
          val n = p.length
          val nw = (n + windowBytes - 1) / windowBytes
          (0 until nw).iterator.map { w =>
            val from = w * windowBytes
            val until = math.min(n, from + windowBytes)
            var energy = 0L
            var i = from
            while (i < until) { energy += (p(i) & 0xFF).toLong; i += 1 }
            Row(r.getLong(0), w, until - from, energy,
              energy >= meanThreshold.toLong * (until - from))
          }
        }
      }(enc)
  }

  /** Metadata pass (fully oracle-checkable — no stub involved): payload
    * size + content digest per media row. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      col("n_bytes"),
      md5(col("payload")).as("digest"))
}
