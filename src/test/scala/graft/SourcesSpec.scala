package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("csv: explicit schema, malformed rows quarantined not dropped") {
    val dir = Files.createTempDirectory("graft-csv-")
    val f = dir.resolve("data.csv")
    Files.writeString(f,
      "id,name,amount\n1,alpha,10.5\n2,beta,20.0\nnot-a-number,gamma,x\n3,delta,30.25\n")
    val (clean, bad) = Sources.quarantine(
      Sources.csv(spark, f.toString, schema))
    assert(clean.count() == 3)
    assert(clean.agg(sum("amount")).collect()(0).getDouble(0) == 60.75)
    assert(bad.count() == 1)
    assert(bad.select(Sources.CorruptCol).collect()(0).getString(0).contains("gamma"))
  }

  test("jsonl: explicit schema round-trips parquet-written data") {
    val dir = Files.createTempDirectory("graft-json-")
    val f = dir.resolve("data.jsonl")
    Files.writeString(f,
      """{"id":1,"name":"a","amount":1.5}
        |{"id":2,"name":"b","amount":2.5}
        |{"id":"oops"}
        |""".stripMargin)
    val (clean, bad) = Sources.quarantine(Sources.jsonl(spark, f.toString, schema))
    assert(clean.count() == 2 && bad.count() == 1)
  }

  test("partitioned write prunes directories on partition-key filters") {
    val dir = Files.createTempDirectory("graft-part-").toString
    val e = model.Tables.events(spark, sf0001)
      .withColumn("event_date", to_date(col("ts")))
    Sources.writePartitioned(e, s"$dir/events", Seq("event_date"))
    // layout: one dir per date
    val dirs = new java.io.File(s"$dir/events").listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
    assert(dirs.length >= 5 && dirs.head == "event_date=2024-01-01")
    // read back with a partition filter → PartitionFilters prunes dirs
    val q = spark.read.parquet(s"$dir/events")
      .filter(col("event_date") === "2024-01-03")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*event_date[^\\]]*\\].*"),
      s"no partition pruning:\n$plan")
    // only the one date's rows come back
    val dates = q.select("event_date").distinct().collect().map(_.get(0).toString)
    assert(dates.sameElements(Array("2024-01-03")))
  }

  test("alignToSchema: drifted frames align to the expected shape") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val expected = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    // drifted: id as int, score missing, extra column present
    val drifted = Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "name", "junk")
    val aligned = sources.Sources.alignToSchema(drifted, expected)
    assert(aligned.schema.map(f => f.name -> f.dataType) ==
      expected.map(f => f.name -> f.dataType))
    assert(aligned.collect().forall(_.isNullAt(2))) // score null-filled
    // keepExtra retains the unexpected column at the end
    val kept = sources.Sources.alignToSchema(drifted, expected, keepExtra = true)
    assert(kept.columns.toSeq == Seq("id", "name", "score", "junk"))
    // unioning heterogeneous partitions works by construction
    val other = Seq((3L, "c", 0.5)).toDF("id", "name", "score")
    assert(aligned.unionByName(sources.Sources.alignToSchema(other, expected))
      .count() == 3)
  }

  test("orc round-trip preserves the table") {
    val dir = Files.createTempDirectory("graft-orc-").toString
    val src = model.Tables.customer(spark, sf0001)
    src.write.mode("overwrite").orc(s"$dir/customer")
    val back = Sources.orc(spark, s"$dir/customer")
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
  }
}
