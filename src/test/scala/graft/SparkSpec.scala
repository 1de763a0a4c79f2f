package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for specs — one JVM-wide session (Spark's
  * getOrCreate) so the suite doesn't pay session startup per spec class.
  */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sfDir: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf, "true")
      .config("spark.ui.enabled", "false")
      // deterministic codegen-cache keys across AQE stage-number jitter
      // (see Bench.scala) — cuts warm-run Janino recompile storms
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
