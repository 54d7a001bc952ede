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

  test("jdbc: warehouse read pushes filters to the database and reads in parallel") {
    // embedded Derby stands in for the warehouse (the reference's
    // BigQuery read, main.py:534-549) — same JDBC path a real database
    // would use, no network needed
    val url = "jdbc:derby:memory:graftsrc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE patients (id BIGINT, name VARCHAR(40), updated_ms BIGINT)")
      val ins = conn.prepareStatement("INSERT INTO patients VALUES (?, ?, ?)")
      for (i <- 1 to 100) {
        ins.setLong(1, i.toLong); ins.setString(2, s"p$i")
        ins.setLong(3, 1000L * i); ins.addBatch()
      }
      ins.executeBatch()

      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      // the reference's delta read: WHERE updated >= watermark — here a
      // DataFrame filter that must reach the database, not the executor
      val delta = Sources.jdbc(spark, url, "patients",
          partitionCol = Some("id"), lowerBound = 1L, upperBound = 101L,
          numPartitions = 4, props = props)
        .filter(col("updated_ms") >= 60000L)
        .select("id", "name")
      assert(delta.count() == 41)
      assert(delta.rdd.getNumPartitions == 4) // range-split parallel read
      val plan = delta.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.contains("GreaterThanOrEqual(UPDATED_MS,60000)"), plan)
      // column pruning reaches the database too: the generated SQL
      // selects only the projected + filter columns, never SELECT *
      assert(plan.contains("ReadSchema:") && !plan.toLowerCase.contains("select *"))
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftsrc;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" with 08006 on success
    }
  }

  test("jdbc: sessionInitStatement runs per connection; quoteTable handles reserved names") {
    val url = "jdbc:derby:memory:graftdialect;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // "Order" is a reserved word AND mixed-case: unreadable without
      // dialect quoting
      st.execute("""CREATE TABLE "Order" (id BIGINT, label VARCHAR(10))""")
      st.execute("""INSERT INTO "Order" VALUES (1, 'a'), (2, 'b')""")
      st.execute("CREATE TABLE init_log (hit INT)")
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

      // unquoted read of a reserved/mixed-case name must fail at the db
      intercept[Exception] {
        Sources.jdbc(spark, url, "Order", props = props).count()
      }
      // quoted read resolves it via the URL's dialect quoting rules,
      // and the session-init statement fires before the read on each
      // connection (observable as rows in the side table)
      val df = Sources.jdbc(spark, url, "Order",
        sessionInitStatement = Some("INSERT INTO init_log VALUES (1)"),
        quoteTable = true, props = props)
      assert(df.count() == 2)
      val rs = conn.createStatement().executeQuery("SELECT count(*) FROM init_log")
      rs.next()
      assert(rs.getInt(1) >= 1, "sessionInitStatement never reached the connection")

      // fetchsize is plumbed to the real Statement: Derby rejects a
      // negative fetch size at read time, proving the option is honored
      // end to end rather than silently dropped
      intercept[Exception] {
        Sources.jdbc(spark, url, "Order", fetchSize = -7,
          quoteTable = true, props = props).count()
      }
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftdialect;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" with 08006 on success
    }
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
