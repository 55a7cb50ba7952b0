package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched feature extraction.
  *
  * The decode step is STUBBED (no image/audio libraries in this container):
  * `fakeDecodeFeatures` derives a deterministic feature vector from the raw
  * bytes so the Spark-side plumbing — schema, partition-preserving
  * mapPartitions batching, column pruning before the wide binary scan — is
  * real and testable. Swap `decodeStub` for a JNI/Java decoder (or a
  * `mapInPandas` stage on PySpark) in production.
  */
object Multimodal {

  /** Typed metadata schema attached to every binary asset. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_hash", StringType),
    StructField("format", StringType)))

  /** Cheap container-format sniff from magic bytes (real logic — works on
    * actual image bytes too). */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(expr("substring(asset, 1, 3)") === lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), "jpeg")
      .when(expr("substring(asset, 1, 4)") === lit(Array[Byte](0x89.toByte, 'P', 'N', 'G')), "png")
      .when(expr("substring(asset, 1, 4)") === lit("RIFF".getBytes("UTF-8")), "riff")
      .otherwise("unknown")

  /** Attach typed metadata to a frame with a binary `asset` column. Pure
    * Column expressions — runs at scan speed, binary stays columnar. */
  def withMetadata(df: DataFrame): DataFrame =
    df.withColumn("meta", struct(
      length(col("asset")).cast("long").as("byte_len"),
      md5(col("asset")).as("content_hash"),
      sniffFormat(col("asset")).as("format")))

  /** Feature schema produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Deterministic fake decode: "dimensions" and an 8-dim feature vector
    * derived from the bytes. Stands in for a real image decode +
    * feature-extract; the batch shape (iterator-in/iterator-out per
    * partition, no driver collect) is the production shape. */
  def decodeStub(df: DataFrame, idCol: String = "asset_id",
                 binCol: String = "asset"): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        // ??? real decoder goes here; deterministic stand-in below
        val w = 1 + (math.abs(bytes.length) % 64)
        val h = 1 + (math.abs(if (bytes.isEmpty) 0 else bytes(0).toInt) % 64)
        val feats = Array.tabulate(8) { k =>
          (bytes.drop(k).take(16).foldLeft(0)((acc, b) => acc + (b & 0xFF)) % 256).toFloat / 256f
        }
        Row(id, w, h, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
