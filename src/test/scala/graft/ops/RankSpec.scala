package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** The distributed total-order primitive: value equality against the
  * naive single-partition window on real data, and plan proofs that
  * the converted global-rank queries carry no SinglePartition window
  * (the 100 TB single-reducer class the primitive exists to kill). */
class RankSpec extends AnyFunSuite with SparkSpec {

  private def events = graft.Tables.t(spark, sfDir, "events")

  test("orderedPrefix row number equals the single-window row_number") {
    import spark.implicits._
    val df = events.select($"event_id", $"event_type", $"value")
    val got = Rank.orderedPrefix(df,
        order = Seq($"value", $"event_id"),
        rnOut = Some("rn"), countOut = Some("nn"))
      .select($"event_id", $"rn", $"nn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(lit(0)).orderBy($"value", $"event_id"))
        .cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(lit(0))))
      .select($"event_id", $"rn", $"nn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref)
  }

  test("inclusive + exclusive running sums and totals match the window") {
    import spark.implicits._
    val d = events.groupBy($"value".as("v"))
      .agg(count(lit(1)).as("c"))
    val got = Rank.orderedPrefix(d, order = Seq($"v"),
        cums = Seq(Rank.Cum($"c", "inc"), Rank.Cum($"c", "exc", exclusive = true)),
        totals = Seq(($"c", "tot")))
      .select($"v", $"inc", $"exc", $"tot")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val wCum = Window.partitionBy(lit(0)).orderBy($"v")
    val ref = d
      .withColumn("inc", sum($"c").over(
        wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("exc", coalesce(sum($"c").over(
        wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum($"c").over(Window.partitionBy(lit(0))))
      .select($"v", $"inc", $"exc", $"tot")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == ref)
  }

  test("descending order ranks from the top") {
    import spark.implicits._
    val d = events.groupBy($"value".as("v")).agg(count(lit(1)).as("c"))
    val got = Rank.orderedPrefix(d, order = Seq($"v"),
        rnOut = Some("rn"), descending = true)
      .select($"v", $"rn")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    val ref = d.withColumn("rn", row_number().over(
        Window.partitionBy(lit(0)).orderBy($"v".desc)).cast("long"))
      .select($"v", $"rn")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(got == ref)
  }

  test("heavy-tie primary keeps ties in one bucket and ranks correctly") {
    import spark.implicits._
    // one value carries half the frame — the adversarial case for
    // quantile bucketing (bounds collapse onto the heavy value)
    val df = spark.range(1000)
      .select($"id", when($"id" % 2 === 0, lit(7.0))
        .otherwise($"id".cast("double")).as("v"))
    val got = Rank.orderedPrefix(df, order = Seq($"v", $"id"),
        rnOut = Some("rn"), numParts = 8)
      .select($"id", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = df.withColumn("rn", row_number().over(
        Window.partitionBy(lit(0)).orderBy($"v", $"id")).cast("long"))
      .select($"id", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref)
  }

  test("empty input yields an empty result, not a crash") {
    import spark.implicits._
    val df = events.filter(lit(false))
      .select($"event_id", $"value")
    assert(Rank.orderedPrefix(df, order = Seq($"value", $"event_id"),
      rnOut = Some("rn"), countOut = Some("nn")).count() == 0)
  }

  /** A foldable-only partitionSpec is exactly what
    * `Window.partitionBy(lit(0))` / `partitionBy()` plans to: an
    * Exchange SinglePartition + one-task sort of the whole child —
    * unless the child subtree passed a global limit, which bounds the
    * frame by construction (the Dev-audit rule). */
  private def singlePartitionWindows(
      df: org.apache.spark.sql.DataFrame): Seq[WindowExec] = {
    import org.apache.spark.sql.execution.{CollectLimitExec,
      GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def limitBounded(p: SparkPlan): Boolean = p.exists {
      case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
          _: CollectLimitExec => true
      case _ => false
    }
    plan.collect {
      case w: WindowExec if w.partitionSpec.forall(_.foldable) &&
        !limitBounded(w.child) => w
    }
  }

  test("converted global-rank queries plan no SinglePartition window") {
    val converted = Seq(
      "q_stat_cvm", "q_stat_siegel_tukey", "q_stat_ks_uniform",
      "q_sample_systematic", "q_stat_hodges_lehmann", "q_sample_pps",
      "q_stat_mannwhitney", "q_stat_kruskal", "q_stat_wilson",
      "q_stat_effect_size", "q_stat_dunn", "q_stat_brunner_munzel",
      "q_stat_moods_median", "q_stat_jonckheere", "q_shard_range_bounds")
    converted.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val bad = singlePartitionWindows(df)
      assert(bad.isEmpty,
        s"$name still plans a SinglePartition window: ${bad.mkString(";")}")
    }
  }

  test("orderedPrefix leaves no cached RDDs behind after its action (r13 verdict item 2)") {
    import spark.implicits._
    spark.catalog.clearCache() // isolate from other suites' session state
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Rank.orderedPrefix(
      events.select($"event_id", $"value"),
      order = Seq($"value", $"event_id"),
      rnOut = Some("rn"), countOut = Some("nn"))
    df.write.format("noop").mode("overwrite").save()
    // the release listener fires asynchronously on the listener bus —
    // poll briefly instead of racing it
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var after = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (after.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      after = spark.sparkContext.getPersistentRDDs.keySet -- before
    }
    assert(after.isEmpty,
      s"orderedPrefix left ${after.size} persisted RDD(s) without a harness clearCache")
  }

  test("two rank frames built before either executes: both correct, nothing outlives the second action (r14 verdict item 3)") {
    import spark.implicits._
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val src = events.select($"event_id", $"value")
    // build BOTH frames before executing EITHER — the first action's
    // query-end drains the whole pending queue (releasing the second
    // frame's cache early is a documented recompute fallback, never a
    // correctness one)
    val a = Rank.orderedPrefix(src, order = Seq($"value", $"event_id"),
      rnOut = Some("rna"))
    val b = Rank.orderedPrefix(src, order = Seq($"event_id"),
      rnOut = Some("rnb"))
    val gotA = a.select($"event_id", $"rna").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotB = b.select($"event_id", $"rnb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wA = Window.partitionBy(lit(0)).orderBy($"value", $"event_id")
    val refA = src.withColumn("rna", row_number().over(wA).cast("long"))
      .select($"event_id", $"rna").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wB = Window.partitionBy(lit(0)).orderBy($"event_id")
    val refB = src.withColumn("rnb", row_number().over(wB).cast("long"))
      .select($"event_id", $"rnb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotA == refA, "first frame")
    assert(gotB == refB, "second frame (cache released early → recompute)")
    // nothing lingers: poll past the async listener bus
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var after = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (after.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      after = spark.sparkContext.getPersistentRDDs.keySet -- before
    }
    assert(after.isEmpty,
      s"${after.size} persisted RDD(s) outlive the second action")
  }

  test("NaN primary keys rank where the sort direction puts them (ADVICE r13)") {
    import spark.implicits._
    val df = spark.range(100)
      .select($"id", when($"id" % 10 === 0, lit(Double.NaN))
        .otherwise($"id".cast("double")).as("v"))
    Seq(false, true).foreach { desc =>
      val got = Rank.orderedPrefix(df, order = Seq($"v", $"id"),
          rnOut = Some("rn"), numParts = 8, descending = desc)
        .select($"id", $"rn")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy(lit(0))
        .orderBy(if (desc) $"v".desc else $"v".asc,
          if (desc) $"id".desc else $"id".asc)
      val ref = df.withColumn("rn", row_number().over(w).cast("long"))
        .select($"id", $"rn")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ref, s"descending=$desc")
    }
  }

  test("estRows small-frame hint keeps values exact and skips no rows") {
    import spark.implicits._
    val d = events.groupBy($"event_type".as("t"))
      .agg(count(lit(1)).as("c"))
    val got = Rank.orderedPrefix(d, order = Seq($"c", $"t"),
        rnOut = Some("rn"), countOut = Some("nn"),
        cums = Seq(Rank.Cum($"c", "cum")), estRows = Some(8L))
      .select($"t", $"rn", $"nn", $"cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val wCum = Window.partitionBy(lit(0)).orderBy($"c", $"t")
    val ref = d
      .withColumn("rn", row_number().over(wCum).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(lit(0))))
      .withColumn("cum", sum($"c").over(
        wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"t", $"rn", $"nn", $"cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == ref)
  }

  test("global scalar lead equals the single-window lead (asc + desc)") {
    import spark.implicits._
    val df = events.select($"event_id", $"value")
    Seq(false, true).foreach { desc =>
      val got = Rank.orderedPrefix(df, order = Seq($"value", $"event_id"),
          leads = Seq(Rank.Lead($"event_id", "nxt")), numParts = 8,
          descending = desc)
        .select($"event_id", $"nxt")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val w = Window.partitionBy(lit(0))
        .orderBy(if (desc) $"value".desc else $"value".asc,
          if (desc) $"event_id".desc else $"event_id".asc)
      val ref = df.withColumn("nxt", lead($"event_id", 1).over(w))
        .select($"event_id", $"nxt")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == ref, s"descending=$desc")
    }
  }

  test("k-lead array returns the next k rows across bucket boundaries") {
    import spark.implicits._
    // 1000 rows over 8 buckets: every bucket boundary exercises the
    // head-patch path; k=5 spans a boundary whenever the in-bucket
    // window runs out
    val df = spark.range(1000).select($"id", ($"id" * 7 % 1000).as("v"))
    val got = Rank.orderedPrefix(df, order = Seq($"v"),
        leads = Seq(Rank.Lead($"v", "nxt", k = 5)), numParts = 8)
      .select($"v", $"nxt")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toMap
    val sorted = (0 until 1000).map(i => (i.toLong * 7) % 1000).sorted
    sorted.zipWithIndex.foreach { case (v, i) =>
      val expect = sorted.slice(i + 1, i + 6).toList
      assert(got(v) == expect, s"v=$v")
    }
  }

  test("struct-valued lead carries multiple columns through the patch") {
    import spark.implicits._
    val df = events.select($"event_id", $"event_type", $"value")
    val got = Rank.orderedPrefix(df, order = Seq($"value", $"event_id"),
        leads = Seq(Rank.Lead(struct($"event_id", $"event_type"), "nb")),
        numParts = 8)
      .select($"event_id", $"nb.event_id".as("nid"), $"nb.event_type".as("nt"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2))).toSet
    val w = Window.partitionBy(lit(0)).orderBy($"value", $"event_id")
    val ref = df
      .withColumn("nid", lead($"event_id", 1).over(w))
      .withColumn("nt", lead($"event_type", 1).over(w))
      .select($"event_id", $"nid", $"nt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "" else r.getString(2))).toSet
    assert(got == ref)
  }

  test("orderedPrefix plan has no SinglePartition window itself") {
    import spark.implicits._
    val df = Rank.orderedPrefix(
      events.select($"event_id", $"value"),
      order = Seq($"value", $"event_id"),
      rnOut = Some("rn"),
      cums = Seq(Rank.Cum(lit(1L), "cumn")))
    assert(singlePartitionWindows(df).isEmpty)
  }
}
