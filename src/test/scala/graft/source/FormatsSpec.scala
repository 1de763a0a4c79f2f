package graft.source

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** File-format round trips beyond parquet: the reference compiles in
  * csv/json readers without reaching them (SURVEY §2b "Scans"); here
  * both are first-class — write each test table out, read it back with
  * an explicit schema, and prove value equality and pushdown.
  *
  * Schema note: JSON/CSV carry no type system, so production reads pin
  * an explicit `StructType` (inference is a convenience, not a
  * contract) — that is what these round trips exercise. */
class FormatsSpec extends AnyFunSuite with SparkSpec {

  test("documents round-trips through csv with explicit schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv").toString
    val docs = graft.Tables.t(spark, sfDir, "documents")
    docs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == docs.count())
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("events round-trips through json lines; filters still prune rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-json").toString
    val events = graft.Tables.t(spark, sfDir, "events")
      // micros-precision ts survives the ISO string form losslessly
      .withColumn("ts", date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    events.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == events.count())
    assert(back.except(events).isEmpty && events.except(back).isEmpty)
    // a selective read over the json source still projects/filters early
    val clicks = back.filter($"event_type" === "click").select($"event_id")
    assert(clicks.count() == events.filter($"event_type" === "click").count())
  }

  test("json schema inference recovers the long/double/string split") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-json2").toString
    graft.Tables.t(spark, sfDir, "events").drop("ts").write
      .mode("overwrite").json(dir)
    val inferred = spark.read.json(dir).schema
    val types = inferred.fields.map(f => f.name -> f.dataType).toMap
    assert(types("event_id") == LongType && types("user_id") == LongType)
    assert(types("value") == DoubleType)
    assert(types("event_type") == StringType && types("props") == StringType)
  }

  test("orc round-trips lineitem with predicate pushdown intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString
    val li = graft.Tables.t(spark, sfDir, "lineitem")
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == li.count())
    assert(back.schema == li.schema, "orc is typed: schema survives exactly")
    assert(back.except(li).isEmpty && li.except(back).isEmpty)
    // pushdown reaches the ORC scan like it does the parquet one
    val q = back.filter($"l_quantity" > 45.0).select($"l_orderkey")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter must reach the orc scan:\n$scan")
    assert(q.count() == li.filter($"l_quantity" > 45.0).count())
  }

  test("parquet schema evolution: mergeSchema widens, old files read nulls") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // batch 1: v1 schema (no quality column) — yesterday's ingestion
    graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang").limit(50)
      .write.parquet(s"$dir/b=1")
    // batch 2: v2 schema adds a column — today's pipeline version
    graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang", lit(0.5).as("quality")).limit(30)
      .write.parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/b=1", s"$dir/b=2")
    assert(merged.schema.fieldNames.contains("quality"),
      "union schema must include the new column")
    assert(merged.count() == 80)
    // rows from v1 files surface NULL for the late column, not an error
    assert(merged.filter($"quality".isNull).count() == 50)
    assert(merged.filter($"quality" === 0.5).count() == 30)
  }
}
