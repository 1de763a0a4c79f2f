package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utilities: smoke-run the flagship entry, explain/run any named
  * query from SparkEntry.queries, or sweep every plan for red flags.
  *
  * Usage:
  *   tools/run.sh graft.tools.Dev entry
  *   tools/run.sh graft.tools.Dev explain <name> [sfDir]
  *   tools/run.sh graft.tools.Dev show <name> [sfDir]
  *   tools/run.sh graft.tools.Dev audit [_] [sfDir]
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
        // unpruned scans — a scan reading EVERY column of a wide table
        // means projection pruning regressed (small dims like nation /
        // region legitimately read whole rows, hence the width floor)
        graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val plan = fn(spark, dir).queryExecution.sparkPlan
            val unpruned = plan.collect {
              case sc: org.apache.spark.sql.execution.FileSourceScanExec
                  if sc.relation.dataSchema.length > 6 &&
                    sc.requiredSchema.length == sc.relation.dataSchema.length =>
                sc.requiredSchema.length
            }
            val text = plan.toString
            val flags = Seq(
              "CartesianProduct" -> text.contains("CartesianProduct"),
              "BroadcastNestedLoopJoin" -> text.contains("BroadcastNestedLoopJoin"),
              s"unprunedWideScan(${unpruned.mkString(",")})" -> unpruned.nonEmpty
            ).collect { case (f, true) => f }
            println(s"$name ${if (flags.isEmpty) "ok" else flags.mkString("FLAG:", ",", "")}")
          } catch { case e: Throwable =>
            println(s"$name ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(80)}")
          }
          spark.catalog.clearCache()
        }
      case other =>
        System.err.println(s"unknown mode '$other' — usage: entry | explain <q> [sfDir] | show <q> [sfDir] | audit [_] [sfDir]")
    }
    spark.stop()
  }
}
