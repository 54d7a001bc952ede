package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // =====================================================================
  // Real public-format header parsing — PNG, WAV (RIFF), GIF. These are
  // fixed-offset headers, so the parse is pure columnar arithmetic over
  // the binary payload (substring + hex + conv): whole-stage codegen,
  // no UDF, no library. Given any genuine PNG/WAV/GIF file bytes these
  // expressions extract the true dimensions / sample rate (asserted in
  // MultimodalSpec against hand-written real headers).
  // =====================================================================

  private def byteHex(bin: Column, pos: Int, len: Int): Column =
    hex(substring(bin, pos, len))

  /** Big-endian uint32 at 1-based byte offset `pos` (PNG). */
  private def beU32(bin: Column, pos: Int): Column =
    conv(byteHex(bin, pos, 4), 16, 10).cast("long")

  /** Little-endian uint16 at `pos` (GIF, WAV) — swap the two hex byte
    * pairs, then parse. */
  private def leU16(bin: Column, pos: Int): Column = {
    val h = byteHex(bin, pos, 2) // always 4 hex chars for 2 bytes
    conv(concat(substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("long")
  }

  /** Little-endian uint32 at `pos` (WAV). */
  private def leU32(bin: Column, pos: Int): Column = {
    val h = byteHex(bin, pos, 4)
    conv(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("long")
  }

  /** Decode format + header metadata from the binary `payload` column:
    * PNG signature + IHDR (width/height big-endian at 17/21), RIFF/WAVE
    * fmt chunk (channels LE16 at 23, sample rate LE32 at 25), GIF87a/89a
    * logical screen (width/height LE16 at 7/9). Unknown magics decode
    * to fmt='unknown' with null metadata — never an error row. */
  def decodeHeaders(media: DataFrame): DataFrame = {
    val p = col("payload")
    val isPng = byteHex(p, 1, 8) === "89504E470D0A1A0A" &&
      byteHex(p, 13, 4) === "49484452" // "IHDR"
    val isWav = byteHex(p, 1, 4) === "52494646" && // "RIFF"
      byteHex(p, 9, 4) === "57415645" // "WAVE"
    val isGif = byteHex(p, 1, 6).isin("474946383961", "474946383761")
    media
      .withColumn("fmt",
        when(isPng, lit("png")).when(isWav, lit("wav"))
          .when(isGif, lit("gif")).otherwise(lit("unknown")))
      .withColumn("width",
        when(isPng, beU32(p, 17)).when(isGif, leU16(p, 7)).cast("int"))
      .withColumn("height",
        when(isPng, beU32(p, 21)).when(isGif, leU16(p, 9)).cast("int"))
      .withColumn("sample_rate", when(isWav, leU32(p, 25)).cast("int"))
      .withColumn("channels", when(isWav, leU16(p, 23)).cast("int"))
  }

  // ---- synthesis of REAL format headers (columnar, hex -> unhex) ------

  private def be32hex(c: Column): Column = format_string("%08x", c)
  private def byteOf(c: Column, i: Int): Column =
    shiftright(c, 8 * i).bitwiseAND(lit(255L))
  private def le16hex(c: Column): Column =
    format_string("%04x", shiftleft(byteOf(c, 0), 8) + byteOf(c, 1))
  private def le32hex(c: Column): Column =
    be32hex(shiftleft(byteOf(c, 0), 24) + shiftleft(byteOf(c, 1), 16) +
      shiftleft(byteOf(c, 2), 8) + byteOf(c, 3))

  /** PNG byte-length of the synthesized header (sig + IHDR chunk). */
  val PngHeaderLen = 33
  /** Canonical 44-byte WAV header (RIFF + fmt + data chunk header). */
  val WavHeaderLen = 44
  /** GIF signature + logical screen width/height. */
  val GifHeaderLen = 10

  /** Media table with REAL format headers: image rows carry a genuine
    * PNG signature + IHDR (width/height), audio rows a canonical RIFF/
    * WAVE fmt chunk (sample rate, channels), video rows a GIF89a
    * logical-screen header; the document's UTF-8 bytes follow as the
    * body. Built entirely with columnar hex assembly + unhex — the
    * synthesis is itself distributed and deterministic. */
  def syntheticMediaBinary(spark: SparkSession, sfDir: String): DataFrame = {
    val d = graft.model.Tables.documents(spark, sfDir)
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val width = (col("n_chars") % 640 + 1).cast("long")
    val height = (col("n_chars") % 480 + 1).cast("long")
    val rate = lit(16000L)
    val chans = (col("doc_id") % 2 + 1).cast("long")
    val body = encode(col("text"), "UTF-8")
    val bodyLen = length(body).cast("long")
    val pngHex = concat(
      lit("89504e470d0a1a0a"), // signature
      lit("0000000d49484452"), // IHDR chunk length 13 + type
      be32hex(width), be32hex(height),
      lit("0802000000"), // bit depth 8, truecolor, deflate, none, none
      lit("00000000")) // CRC placeholder (parser does not verify)
    val wavHex = concat(
      lit("52494646"), le32hex(bodyLen + lit(36L)), lit("57415645"), // RIFF size WAVE
      lit("666d7420"), lit("10000000"), lit("0100"), // "fmt " len=16 PCM
      le16hex(chans), le32hex(rate),
      le32hex(rate * chans * 2L), le16hex(chans * 2L), lit("1000"), // byte rate, align, 16-bit
      lit("64617461"), le32hex(bodyLen)) // "data" + size
    val gifHex = concat(lit("474946383961"), le16hex(width), le16hex(height))
    val headerHex = when(kind === "image", pngHex)
      .when(kind === "audio", wavHex).otherwise(gifHex)
    d.select(
      col("doc_id").as("media_id"), kind.as("kind"),
      unhex(concat(headerHex, hex(body))).as("payload"))
  }

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
