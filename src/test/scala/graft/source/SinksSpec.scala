package graft.source

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.min
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

  test("join-driven filter prunes partitions dynamically (DPP)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    val docs = graft.Tables.t(spark, sfDir, "documents")
    Sinks.writePartitioned(docs.drop("text"), dir, "lang")
    // dim side: per-lang doc counts filtered on the NON-join-key count
    // column — the fact's surviving partitions are only known at
    // RUNTIME, after the dim aggregate runs, so the optimizer can't
    // rewrite this to a static partition filter (a join-key predicate
    // would propagate through the equi-join constraint instead). This
    // is the star-join shape DPP exists for: at 100 TB the fact scan
    // opens only the surviving langs' directories, not scan-then-join.
    val keepLangs = docs.groupBy($"lang")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .filter($"n_docs" >= 1)
    val fact = spark.read.parquet(dir)
    val joined = fact.join(keepLangs, "lang")
    // DPP filters are inserted when the physical plan is BUILT, so
    // assert on the un-executed adaptive plan, where scans are still
    // plain FileSourceScanExec nodes — after execution AQE swallows
    // them into materialized QueryStageExec leaves that tree traversal
    // does not enter
    val planned = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // pre-execution: the current (initial) plan
      case p => p
    }
    val scans = planned.collect {
      case f: FileSourceScanExec if f.metadata.get("Location").exists(_.contains(dir)) => f
    }
    assert(scans.nonEmpty, "no scan over the partitioned fact")
    assert(scans.exists(_.partitionFilters.exists(
        _.toString.contains("dynamicpruning"))),
      s"fact scan must carry a dynamicpruning partition filter; got: " +
        scans.map(_.partitionFilters.mkString(",")).mkString(" | "))
    // and the runtime-pruned result equals the unpartitioned join
    val expected = docs.drop("text").join(keepLangs, "lang").count()
    assert(joined.count() == expected)
  }

  test("compacting write sizes the file count to the data, not the input tasks") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, sfDir, "documents").repartition(16)
    def partFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    // huge target → everything collapses to one file despite 16 input tasks
    val one = Files.createTempDirectory("graft-compact1").toString
    assert(Sinks.writeCompacted(docs, one, targetBytes = 1L << 40) == 1)
    assert(partFiles(one) == 1)
    // small target → several files, count matches the returned plan
    val many = Files.createTempDirectory("graft-compactN").toString
    val n = Sinks.writeCompacted(docs, many, targetBytes = 16L << 10)
    assert(n > 1)
    assert(partFiles(many) == n)
    // values survive the round trip
    assert(spark.read.parquet(one).count() == docs.count())
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

  test("sorted range-partitioned write: disjoint per-file key ranges, sorted row groups, values preserved") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dir = Files.createTempDirectory("graft-sorted").toString
    val events = graft.Tables.t(spark, sfDir, "events")
    Sinks.writeSorted(events, dir, "user_id", files = 8)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length > 1, "range partitioning must produce multiple files")
    // footer stats: per-file [min,max] of the layout key, per row group
    val ranges = parts.map { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        val schema = rd.getFooter.getFileMetaData.getSchema
        val idx = schema.getFieldIndex("user_id")
        val stats = rd.getFooter.getBlocks.asScala.map(_.getColumns.get(idx).getStatistics)
        val mins = stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue)
        val maxs = stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        // sorted within the file: row-group ranges are themselves ordered
        mins.zip(maxs).toList.sliding(2).foreach {
          case List((_, aMax), (bMin, _)) =>
            assert(aMax <= bMin, s"row groups out of order in ${f.getName}")
          case _ =>
        }
        (mins.min, maxs.max)
      } finally rd.close()
    }
    // data skipping precondition: file key ranges are pairwise disjoint,
    // so a point/range predicate opens only the files whose stats admit it
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"file ranges overlap: $aMax vs $bMin")
      case _ =>
    }
    // round trip: values preserved, predicate pushed to the scan
    val k = events.select(min($"user_id")).head.getLong(0)
    val back = spark.read.parquet(dir).filter($"user_id" === k)
    val scan = back.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec"))
    assert(scan.metadata("PushedFilters").contains("EqualTo(user_id"),
      "key predicate must reach the parquet reader for stats-based skipping")
    assert(back.count() == events.filter($"user_id" === k).count())
    assert(spark.read.parquet(dir).count() == events.count())
  }

  test("z-ordered write clusters BOTH columns; sorted write only one") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    // per-file [min,max] of `col` across all files in `dir`, as doubles
    def fileRanges(dir: String, col: String): Seq[(Double, Double)] =
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
            new Path(f.getAbsolutePath), new Configuration()))
          try {
            val idx = rd.getFooter.getFileMetaData.getSchema.getFieldIndex(col)
            val st = rd.getFooter.getBlocks.asScala
              .map(_.getColumns.get(idx).getStatistics)
            (st.map(_.genericGetMin.asInstanceOf[Number].doubleValue).min,
              st.map(_.genericGetMax.asInstanceOf[Number].doubleValue).max)
          } finally rd.close()
        }
    def avgSpanFrac(rs: Seq[(Double, Double)]): Double = {
      val (glo, ghi) = (rs.map(_._1).min, rs.map(_._2).max)
      rs.map { case (lo, hi) => (hi - lo) / math.max(ghi - glo, 1e-300) }
        .sum / rs.length
    }
    val events = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"value")
    val zDir = Files.createTempDirectory("graft-z").toString
    val sDir = Files.createTempDirectory("graft-s").toString
    Sinks.writeZOrdered(events, zDir, "user_id", "value", files = 8)
    Sinks.writeSorted(events, sDir, "user_id", files = 8)
    // both dims narrow under z-order…
    val zU = avgSpanFrac(fileRanges(zDir, "user_id"))
    val zV = avgSpanFrac(fileRanges(zDir, "value"))
    assert(zU <= 0.75 && zV <= 0.75,
      s"z-order must narrow both dims: user=$zU value=$zV")
    // …while the single-key sort leaves the secondary column unclustered
    val sV = avgSpanFrac(fileRanges(sDir, "value"))
    assert(zV < sV,
      s"z-order secondary-dim span ($zV) must beat sorted write's ($sV)")
    // round trip: same multiset of rows
    val back = spark.read.parquet(zDir)
    assert(back.count() == events.count())
    assert(back.except(events).isEmpty && events.except(back).isEmpty)
  }

  test("dynamic partition overwrite replaces only the partitions in the batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dynover").toString
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val before = spark.read.parquet(dir)
    val langs = before.select($"lang").distinct().as[String].collect().sorted
    assert(langs.length >= 2, "need multiple partitions to prove selectivity")
    val target = langs.head
    val untouched = before.filter($"lang" =!= target)
      .collect().map(_.toString).sorted.toSeq
    // the incremental-backfill shape: re-deliver ONE partition, corrected
    val corrected = docs.filter($"lang" === target)
      .withColumn("n_chars", $"n_chars" + 1000000L)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try corrected.write.mode("overwrite").partitionBy("lang").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(dir)
    // target partition fully replaced with the corrected rows…
    assert(after.filter($"lang" === target && $"n_chars" < 1000000L).count() == 0)
    assert(after.filter($"lang" === target).count() ==
      docs.filter($"lang" === target).count())
    // …and every other partition byte-identical (static mode would have
    // dropped them all)
    val afterUntouched = after.filter($"lang" =!= target)
      .collect().map(_.toString).sorted.toSeq
    assert(afterUntouched == untouched)
  }
}
