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

  test("resizeMeta rewrites dimensions, preserves the rest") {
    val m = Multimodal.syntheticMedia(spark, sf0001)
    val r = Multimodal.resizeMeta(m, 224, 224)
    val row = r.select("meta.width", "meta.height", "meta.format").distinct().collect()
    assert(row.forall(x => x.getInt(0) == 224 && x.getInt(1) == 224 && x.getString(2) == "synthetic"))
  }
}
