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
      case "audit" =>
        // plan red-flag sweep over every registered query: cartesians
        // (outside the documented bounded grid), nested-loop joins, and
        // scans that read every column (pruning regression)
        graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val plan = fn(spark, dir).queryExecution.executedPlan.toString
            val flags = Seq(
              "CartesianProduct" -> plan.contains("CartesianProduct"),
              "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
              "fullScanOfLineitem" -> plan.linesIterator.exists(l =>
                l.contains("ReadSchema") && l.contains("l_comment"))
            ).collect { case (f, true) => f }
            println(s"$name ${if (flags.isEmpty) "ok" else flags.mkString("FLAG:", ",", "")}")
          } catch { case e: Throwable =>
            println(s"$name ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(80)}")
          }
          spark.catalog.clearCache()
        }
    }
    spark.stop()
  }
}
