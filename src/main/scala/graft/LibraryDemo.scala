package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** User-facing sample: the library surface a reference user would
  * touch after switching — SQL-registered custom expressions,
  * streaming sessionization, multimodal feature extraction feeding
  * similarity search. Run: sbt "runMain graft.LibraryDemo [sfDir]". */
object LibraryDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. custom expressions through the SQL surface
    graft.expr.GraftFunctions.register(spark)
    val sqlRow = spark.sql(
      """SELECT next_birthday(DATE '1992-02-29', DATE '2026-08-12') AS nb,
        |       dot_product(array(1.0d,2.0d,3.0d), array(4.0d,5.0d,6.0d)) AS dp""".stripMargin)
      .collect()(0)
    println(s"sql: next_birthday=${sqlRow.getDate(0)} dot_product=${sqlRow.getDouble(1)}")

    // 2. streaming-shaped sessionization on the real events table
    val sessions = streaming.EventStreams.sessionWindows(
      model.Tables.events(spark, sfDir), "30 minutes", "1 hour")
    println(s"sessions: n=${sessions.count()} " +
      s"maxEvents=${sessions.agg(max("n_events")).collect()(0).get(0)}")

    // 3. multimodal: binary payloads -> batched stub decode -> ANN input
    val media = multimodal.Multimodal.syntheticMedia(spark, sfDir)
    val feats = multimodal.Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("feature").cast("array<double>").as("v"))
    val sims = feats.as("a").join(feats.as("b"),
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id"), col("b.media_id"),
        graft.expr.ColumnOps.dotProduct(col("a.v"), col("b.v")).as("sim"))
      .orderBy(desc("sim")).limit(3)
    sims.collect().foreach(r =>
      println(f"sim: ${r.getLong(0)}%d ~ ${r.getLong(1)}%d = ${r.getDouble(2)}%.4f"))

    spark.stop()
  }
}
