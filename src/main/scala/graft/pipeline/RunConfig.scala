package graft.pipeline

/** Driver-side configuration/secret source (SURVEY.md §2a S10;
  * main.py:227-256). The reference pulls its API key from a secret
  * manager and caches it in a module global; here the resolution chain
  * is explicit and the cache is a lazy val per key.
  *
  * Resolution order: explicit overrides → JVM system properties →
  * environment. Secret *values* never appear in toString/logs. */
final class RunConfig(overrides: Map[String, String] = Map.empty) {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  def get(key: String): Option[String] =
    cache.computeIfAbsent(key, k =>
      overrides.get(k)
        .orElse(sys.props.get(k))
        .orElse(sys.env.get(k.toUpperCase.replace('.', '_'))))

  def require(key: String): String =
    get(key).getOrElse(throw new IllegalStateException(
      s"missing required config '$key' (checked overrides, -D$key, " +
        s"env ${key.toUpperCase.replace('.', '_')})"))

  /** Redacted view — names only, matching the reference's posture of
    * never logging secret material. */
  override def toString: String =
    s"RunConfig(keys=${overrides.keys.toSeq.sorted.mkString(",")})"
}
