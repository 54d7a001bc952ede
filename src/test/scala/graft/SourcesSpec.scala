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

  test("orc round-trip preserves the table") {
    val dir = Files.createTempDirectory("graft-orc-").toString
    val src = model.Tables.customer(spark, sf0001)
    src.write.mode("overwrite").orc(s"$dir/customer")
    val back = Sources.orc(spark, s"$dir/customer")
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
  }
}
