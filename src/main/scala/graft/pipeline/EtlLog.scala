package graft.pipeline

/** PHI-redacting structured logging (reference: JSON log lines whose
  * name/email/address/dob/phone/gender-named fields are hashed before
  * emission — main.py:84-89). The dataflow-side analog is
  * `Scalars.redactProjection`; this is the driver-side log surface.
  *
  * Output is one JSON object per line: stable key order, redacted
  * values replaced by their 8-hex sha256 prefix (so correlating a key
  * across lines still works without exposing the value). */
object EtlLog {

  private val PhiName =
    "(?i).*(name|email|address|dob|birth|phone|gender).*"

  def redactValue(v: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(v.getBytes("UTF-8"))
    d.take(4).map("%02x".format(_)).mkString
  }

  /** JSON string-content escaping (backslash, quote, all control chars)
    * — shared with the webhook poster. */
  def escape(s: String): String = esc(s)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Render one structured event; PHI-named fields are hashed. */
  def line(event: String, fields: (String, Any)*): String = {
    val parts = ("event" -> (event: Any)) +: fields
    parts.map { case (k, v) =>
      val rendered = v match {
        case null => "null"
        case s: String if k.matches(PhiName) => "\"" + redactValue(s) + "\""
        case s: String => "\"" + esc(s) + "\""
        case n @ (_: Int | _: Long | _: Double | _: Boolean) => n.toString
        case other if k.matches(PhiName) => "\"" + redactValue(String.valueOf(other)) + "\""
        case other => "\"" + esc(String.valueOf(other)) + "\""
      }
      "\"" + esc(k) + "\":" + rendered
    }.mkString("{", ",", "}")
  }

  def info(event: String, fields: (String, Any)*): Unit =
    System.out.println(line(event, fields: _*))

  def error(event: String, fields: (String, Any)*): Unit =
    System.err.println(line(event, fields: _*))
}
