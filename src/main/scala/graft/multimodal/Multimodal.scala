package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2j / driver mandate):
  * image/audio/video as opaque `binary` payloads with typed metadata.
  *
  * The Spark-side plumbing is real — schema, partition-wise batched
  * processing, typed output — while the codec itself is a clearly
  * marked deterministic STUB (`StubCodec`): this container has no
  * image/audio libraries, and at 100 TB the codec is a per-executor
  * native library behind exactly this batch interface anyway.
  */
object Multimodal {

  /** media(id, kind, payload, meta) — the canonical multimodal table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))))))

  final case class MediaFeature(media_id: Long, kind: String,
                                feature: Array[Float], n_bytes: Int)

  /** ======== STUB ========
    * Deterministic fake decoder: a 16-bin byte histogram normalized to
    * unit L1 — stands in for image decode + embed. The REAL
    * implementation binds an image/audio codec per executor and keeps
    * this exact signature (batch in, features out). */
  object StubCodec {
    val FeatureDim = 16
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { bytes =>
        val hist = new Array[Float](FeatureDim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xFF) / FeatureDim) += 1.0f
            i += 1
          }
          val total = math.max(1, bytes.length).toFloat
          var j = 0
          while (j < FeatureDim) { hist(j) /= total; j += 1 }
        }
        hist
      }
  }

  /** Batched feature extraction: one codec instance per partition, one
    * call per batch of `batchSize` payloads — the Scala analog of a
    * pandas_udf over mapInPandas. Output is a typed Dataset so the
    * features flow straight into the similarity operators. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { chunk =>
          val feats = StubCodec.decodeBatch(chunk.map(_._3))
          chunk.zip(feats).map { case ((id, kind, payload), f) =>
            MediaFeature(id, kind,
              f, if (payload == null) 0 else payload.length)
          }
        }
      }
  }

  /** Frame sampling for video payloads: keeps every `stride`-th frame
    * index as (media_id, frame_idx) — pure metadata expansion, columnar
    * (the decode of each sampled frame goes through extractFeatures). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0),
          greatest(coalesce(col("meta.n_frames"), lit(1)) - 1, lit(0)),
          lit(stride))).as("frame_idx"))

  /** Resize is a metadata rewrite + payload reprocess marker (the stub
    * keeps the payload; a real codec would transcode the bytes). */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"),
        col("meta.format").as("format")))

  /** Deterministic synthetic media table derived from `documents` (the
    * testdata carries no binary columns): payload bytes are the UTF-8
    * text, kind cycles by id. Lets every operator above run end-to-end. */
  def syntheticMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val d = graft.model.Tables.documents(spark, sfDir)
    d.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") % 120 + 1).cast("int").as("n_frames"),
        lit("synthetic").as("format")).as("meta"))
  }
}
