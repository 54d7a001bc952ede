package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media table conforms to the canonical schema") {
    val m = Multimodal.syntheticMedia(spark, sf0001)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    assert(m.count() == 500)
    assert(m.select("kind").distinct().count() == 3)
  }

  test("extractFeatures: batched, typed, deterministic, unit-L1 stub features") {
    implicit val s = spark
    val m = Multimodal.syntheticMedia(spark, sf0001).limit(100)
    val f = Multimodal.extractFeatures(m, batchSize = 16)
    val rows = f.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.feature.length == Multimodal.StubCodec.FeatureDim))
    // histogram is L1-normalized over payload bytes
    rows.foreach(r => assert(math.abs(r.feature.map(_.toDouble).sum - 1.0) < 1e-3))
    // deterministic across runs
    val again = Multimodal.extractFeatures(m, batchSize = 32).collect()
      .map(r => r.media_id -> r.feature.toSeq).toMap
    rows.foreach(r => assert(again(r.media_id) == r.feature.toSeq))
  }

  test("features flow into the similarity operators (dot product on stub features)") {
    implicit val s = spark
    val m = Multimodal.syntheticMedia(spark, sf0001).limit(50)
    val f = Multimodal.extractFeatures(m).toDF()
      .select(col("media_id"), col("feature").cast("array<double>").as("v"))
    val self = f.select(graft.expr.ColumnOps.dotProduct(col("v"), col("v")).as("d"))
    assert(self.filter(col("d") <= 0).count() == 0)
  }

  test("sampleFrames: stride sampling of video frame indices") {
    val m = Multimodal.syntheticMedia(spark, sf0001)
    val frames = Multimodal.sampleFrames(m, stride = 10)
    val one = frames.filter(col("media_id") === 2).collect().map(_.getInt(1))
    assert(one.headOption.contains(0))
    assert(one.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 10))
    // only video rows expand
    val kinds = m.filter(col("kind") =!= "video").select("media_id")
      .join(frames, "media_id")
    assert(kinds.count() == 0)
  }

  test("decodeHeaders parses REAL format bytes (not just its own synthesis)") {
    // a genuine 1x1 truecolor PNG header (sig + IHDR + true CRC), the
    // canonical 44-byte WAV header for 16-bit mono 44.1 kHz, and a
    // GIF89a 320x200 logical screen — hand-written from the public
    // specs, not produced by syntheticMediaBinary
    val png = "89504e470d0a1a0a0000000d4948445200000001000000010802000000907753de"
    val wav = "5249464624000000" + "57415645" + "666d7420" + "10000000" +
      "0100" + "0100" + "44ac0000" + "88580100" + "0200" + "1000" +
      "64617461" + "00000000"
    val gif = "4749463839614001c800"
    val junk = "deadbeef00112233"
    val df = Seq((1L, png), (2L, wav), (3L, gif), (4L, junk))
      .toDF("media_id", "hx")
      .select(col("media_id"), unhex(col("hx")).as("payload"))
    val got = Multimodal.decodeHeaders(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(2) == "png")
    assert(got(1L).getInt(3) == 1 && got(1L).getInt(4) == 1)
    assert(got(2L).getString(2) == "wav")
    assert(got(2L).getInt(5) == 44100 && got(2L).getInt(6) == 1)
    assert(got(3L).getString(2) == "gif")
    assert(got(3L).getInt(3) == 320 && got(3L).getInt(4) == 200)
    assert(got(4L).getString(2) == "unknown")
    assert(got(4L).isNullAt(3) && got(4L).isNullAt(5))
  }

  test("syntheticMediaBinary round-trips through the header parser") {
    val media = Multimodal.syntheticMediaBinary(spark, sf0001)
    val dec = Multimodal.decodeHeaders(media)
    assert(dec.filter(col("fmt") === "unknown").count() == 0)
    // every image/video width matches the generator's arithmetic
    val d = graft.model.Tables.documents(spark, sf0001)
      .select(col("doc_id").as("media_id"),
        (col("n_chars") % 640 + 1).cast("int").as("w_exp"))
    val bad = dec.filter(col("fmt").isin("png", "gif"))
      .join(d, Seq("media_id")).filter(col("width") =!= col("w_exp"))
    assert(bad.count() == 0)
    assert(dec.filter(col("fmt") === "wav" &&
      col("sample_rate") =!= 16000).count() == 0)
  }

  test("resizeMeta rewrites dimensions, preserves the rest") {
    val m = Multimodal.syntheticMedia(spark, sf0001)
    val r = Multimodal.resizeMeta(m, 224, 224)
    val row = r.select("meta.width", "meta.height", "meta.format").distinct().collect()
    assert(row.forall(x => x.getInt(0) == 224 && x.getInt(1) == 224 && x.getString(2) == "synthetic"))
  }
}
