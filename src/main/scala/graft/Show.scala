package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a registered query's result rows. Usage:
  *   runMain graft.Show <sfDir> <name> [maxRows]
  */
object Show {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).show(maxRows, truncate = false)
    spark.stop()
  }
}
