package graft

import graft.config.YamlConfig
import graft.source.HttpTables
import org.apache.spark.sql.SparkSession

/** Config-driven SQL runner — the shipped binary's behavior (reference:
  * /root/reference/src/main.rs:22-49): read YAML, register every source as
  * a table, and for each source with a `sql:` run it and pretty-print up
  * to 20 rows.
  *
  * Usage: graft.Main <config.yaml> [master]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Main <config.yaml> [master]")
      sys.exit(2)
    }
    val cfg = YamlConfig.load(java.nio.file.Paths.get(args(0)))
    val master = if (args.length > 1) args(1)
      else s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"
    val spark = SparkSession.builder()
      .appName("graft")
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try
      cfg.sources.foreach { src =>
        HttpTables.register(spark, src)
        src.getSql.foreach(sql => spark.sql(sql).show(20, truncate = true))
      }
    finally spark.stop()
  }
}
