package graft

import graft.pipeline.EtlLog

class EtlLogSpec extends SparkSpec {

  test("PHI-named fields are hashed; others pass through; JSON stays valid") {
    val l = EtlLog.line("upsert",
      "job_type" -> "patients",
      "email" -> "jo@example.com",
      "first_name" -> "Jo",
      "read_count" -> 42L,
      "note" -> "line1\nline2 \"quoted\"")
    assert(!l.contains("jo@example.com") && !l.contains("\"Jo\""))
    assert(l.contains("\"job_type\":\"patients\""))
    assert(l.contains("\"read_count\":42"))
    // redaction is deterministic (correlatable across lines)
    assert(l.contains("\"email\":\"" + EtlLog.redactValue("jo@example.com") + "\""))
    // the emitted line parses as JSON (via Spark's own parser)
    import spark.implicits._
    val parsed = spark.read.json(Seq(l).toDS())
    assert(parsed.columns.contains("event"))
    assert(parsed.select("note").collect()(0).getString(0) == "line1\nline2 \"quoted\"")
  }
}
