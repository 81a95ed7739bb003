package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §7.5): media as opaque
  * `binary` columns with typed metadata, partition-wise feature
  * extraction, and a clearly-stubbed decode seam.
  *
  * The Spark-side mechanics — schema, batch iteration shape,
  * deterministic partitioning — are real and tested; the actual
  * image/audio decode is NOT (no codec libs in this environment) and
  * is stubbed behind [[decodeMedia]]. At scale the extraction runs
  * one partition per task with zero shuffle; budget
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits
  * executor memory.
  */
object Multimodal {

  /** Metadata struct carried beside every media blob. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime_type", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("checksum_md5", StringType, nullable = false)))

  /** Wrap a string column as a binary media column + metadata struct
    * (in production the blob arrives from object storage; here the
    * bytes come from the fixture's text so tests are deterministic). */
  def packMedia(df: DataFrame, idCol: String, payloadCol: String,
                mimeType: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol),
      encode(col(payloadCol), "UTF-8").as("media"),
      struct(
        lit(mimeType).as("mime_type"),
        length(encode(col(payloadCol), "UTF-8")).cast(LongType).as("size_bytes"),
        md5(encode(col(payloadCol), "UTF-8")).as("checksum_md5")).as("media_meta"))

  /** REAL DECODE SEAM — intentionally unimplemented: decoding
    * image/audio/video requires codec libraries absent from this
    * environment. Callers use [[fakeDecodeFeatures]] (deterministic
    * byte statistics with the same signature/shape) until a codec is
    * wired here. */
  def decodeMedia(mimeType: String, bytes: Array[Byte]): Array[Float] = ???

  /** Deterministic stand-in for decode+featurize: an `nBuckets`-dim
    * byte-histogram (L1-normalized) — same output shape a real
    * embedding model would produce, fully reproducible. */
  def fakeDecodeFeatures(bytes: Array[Byte], nBuckets: Int = 16): Array[Float] = {
    val counts = new Array[Float](nBuckets)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) * nBuckets / 256) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    counts.map(_ / n)
  }

  /** Frame sampling over the media column: fixed-size byte windows at
    * a stride — the Spark-side plumbing of video frame-sampling (one
    * output row per frame, ids + frame indices preserved, zero
    * shuffle). The window slicer stands in for a real container
    * demuxer, which would slot in behind [[decodeMedia]]; the
    * partition-iterator shape, output schema and ordering contract are
    * the real ones. Empty payloads produce zero frames. */
  def sampleFrames(df: DataFrame, idCol: String = "doc_id",
                   mediaCol: String = "media", frameBytes: Int = 256,
                   stride: Int = 128): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false),
      StructField("frame_bytes", LongType, nullable = false)))
    val input = df.select(col(idCol).cast(LongType), col(mediaCol))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Iterator.range(0, bytes.length, stride).zipWithIndex.map {
          case (off, idx) =>
            val frame = java.util.Arrays.copyOfRange(
              bytes, off, math.min(off + frameBytes, bytes.length))
            Row(id, idx.toLong, frame, frame.length.toLong)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic nearest-neighbor byte resample to `targetBytes` —
    * the resize stage's plumbing (a real image resize would decode via
    * [[decodeMedia]] first; the schema/partitioning/determinism
    * contract here is the real one). Empty payloads resize to zeros. */
  def resizeMedia(df: DataFrame, idCol: String = "doc_id",
                  mediaCol: String = "media", targetBytes: Int = 64): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("resized", BinaryType, nullable = false),
      StructField("orig_bytes", LongType, nullable = false)))
    val input = df.select(col(idCol).cast(LongType), col(mediaCol))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val out = new Array[Byte](targetBytes)
        if (bytes.length > 0) {
          var i = 0
          while (i < targetBytes) {
            out(i) = bytes((i.toLong * bytes.length / targetBytes).toInt)
            i += 1
          }
        }
        Row(id, out, bytes.length.toLong)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Perceptual near-dup over binary media columns — the image/audio
    * dedup lane: byte-level SimHash (hex-pair shingles over the raw
    * bytes stand in for decoded-frame features; a production pHash
    * would decode via [[decodeMedia]] first and feed frame features
    * into the SAME signature/banding machinery) banded and
    * hamming-verified exactly like text SimHash
    * ([[Dedup.simhashPairsFromSigs]]). Blobs that differ by a few
    * bytes land within `maxHamming`; unrelated blobs don't. Scale
    * shape: one scan computes every signature (no shuffle), then the
    * band posting-list join — identical cost profile to q32 at
    * corpus scale. */
  def binaryNearDup(df: DataFrame, idCol: String = "doc_id",
                    mediaCol: String = "media", shingleHexChars: Int = 16,
                    maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairsFromSigs(
      Dedup.simhashSigsOf(df, idCol,
        graft.functions.TextFunctions.charShingles(
          lower(hex(col(mediaCol))), shingleHexChars)),
      maxHamming)

  /** Partition-wise feature extraction over the media column: one
    * pass per partition, rows streamed through an iterator (the batch
    * shape a Python `mapInPandas`/Arrow pipeline would use — here a
    * JVM mapPartitions, no serialization hop at all). Output:
    * (id, features array<float>, size_bytes). */
  def extractFeatures(df: DataFrame, idCol: String = "doc_id",
                      mediaCol: String = "media",
                      nBuckets: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("size_bytes", LongType, nullable = false)))
    val input = df.select(col(idCol).cast(LongType), col(mediaCol))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, fakeDecodeFeatures(bytes, nBuckets).toSeq, bytes.length.toLong)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
