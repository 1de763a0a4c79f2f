package graft.source

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned-sink round trip: the read-back plan must PRUNE partitions
  * (PartitionFilters at the scan), not filter rows post-scan. */
class SinksSpec extends AnyFunSuite with SparkSpec {

  test("partitionBy(lang) write → lang filter prunes partitions at the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sink").toString
    val docs = graft.Tables.t(spark, sfDir, "documents")
    Sinks.writePartitioned(docs, dir, "lang")
    // hive-style layout on disk
    val langDirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("lang=")).sorted
    assert(langDirs.nonEmpty && langDirs.forall(_.matches("lang=[a-z]+")))

    val back = spark.read.parquet(dir).filter($"lang" === "en")
    val scan = back.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec"))
    assert(scan.partitionFilters.nonEmpty,
      "lang predicate must become a partition filter")
    // only the lang=en directory's rows are produced by the scan
    val expected = docs.filter($"lang" === "en").count()
    assert(back.count() == expected)
    assert(scan.metadata.get("Location").forall(_.contains(dir)))
  }

  test("round trip preserves values and schema modulo partition column position") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sink2").toString
    val docs = graft.Tables.t(spark, sfDir, "documents")
    Sinks.writePartitioned(docs, dir, "source")
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq == docs.columns.sorted.toSeq)
    val a = docs.select($"doc_id", $"n_chars", $"source").orderBy($"doc_id").collect()
    val b = back.select($"doc_id", $"n_chars", $"source").orderBy($"doc_id").collect()
    assert(a.sameElements(b))
  }
}
