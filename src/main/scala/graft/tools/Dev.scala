package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utilities: smoke-run the flagship entry, or explain/run any named
  * query from SparkEntry.queries.
  *
  * Usage:
  *   tools/run.sh graft.tools.Dev entry
  *   tools/run.sh graft.tools.Dev explain <name> [sfDir]
  *   tools/run.sh graft.tools.Dev show <name> [sfDir]
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.nanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    args(0) match {
      case "entry" =>
        val df = graft.SparkEntry.entry(spark)
        println(s"ENTRY ROWS: ${df.count()}")
        df.show(5, truncate = false)
      case "explain" =>
        graft.SparkEntry.queries(args(1))(spark, dir).explain("formatted")
      case "show" =>
        val df = graft.SparkEntry.queries(args(1))(spark, dir)
        df.show(20, truncate = false)
        println(s"ROWS: ${df.count()}")
    }
    spark.stop()
  }
}
