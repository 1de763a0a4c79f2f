package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique proofs: salted aggregation equivalence and bucketed
  * co-located joins (shuffle elimination visible in the plan). */
class ScaleSpec extends AnyFunSuite with SparkSpec {

  test("salted two-stage aggregation equals the direct aggregate") {
    val l = graft.Tables.t(spark, sfDir, "lineitem")
    val direct = Skew.directCountSum(l, "l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(l, "l_returnflag", "l_extendedprice", salt = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct) // decimal partials → exact merge, any split
  }

  test("runtime bloom filter prunes the big join side before the shuffle") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the test tables are tiny — drop the size gates so the rewrite
      // fires at spec scale (at real scale the defaults gate it to
      // big-scan × small-creation-side joins), and disable broadcast so
      // the join is the shuffle join the filter exists to protect
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables.t(spark, sfDir, "lineitem").select($"l_orderkey", $"l_quantity")
      val ord = graft.Tables.t(spark, sfDir, "orders")
        .filter($"o_orderpriority" === "1-URGENT") // selective creation side
        .select($"o_orderkey")
      val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
      // the lineitem side must be pre-filtered by a bloom filter built
      // from the filtered orders keys — rows that can't join never enter
      // the shuffle (the 100 TB win: exchange volume ∝ matching rows)
      assert(joined.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "expected a bloom-filter runtime filter on the scan side")
      // bloom false-positives don't affect results: the join re-checks
      val expected = {
        keys.foreach { case (k, _) => spark.conf.unset(k) }
        try joined.count()
        finally keys.foreach { case (k, v) => spark.conf.set(k, v) }
      }
      assert(joined.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("TopKByScore aggregates partially map-side before the exchange") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    // the ≤k-partial-state claim (TopKByScore doc): each input partition
    // must reduce to a k-element list BEFORE the exchange, so only
    // (#keys × k) rows cross it — provable as a Partial-mode object
    // aggregate sitting below the shuffle in the physical plan
    val df = Similarity.queries("q_similarity_topk")(spark, sfDir)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan // pre-materialization: full tree
      case p => p
    }
    def partialAggs(p: org.apache.spark.sql.execution.SparkPlan) = p.collect {
      case o: ObjectHashAggregateExec if o.aggregateExpressions.exists(_.mode == Partial) => o
      case o: SortAggregateExec if o.aggregateExpressions.exists(_.mode == Partial) => o
    }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected a shuffle in the top-k plan")
    assert(exchanges.exists(e => partialAggs(e.child).nonEmpty),
      "expected a Partial-mode object aggregate BELOW the exchange " +
        "(map-side ≤k state); none found — top-k is shipping every score")
    // and the top-k is NOT a rank window (the 100 TB anti-shape)
    assert(!plan.toString.contains("Window"),
      "top-k must use the bounded aggregator, not a rank window")
    // the proof must describe the plan that actually runs: results stay correct
    assert(df.count() == 100)
  }

  test("recursive CTE: per-iteration base scan is filtered and pruned below the frontier join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, Project}
    import org.apache.spark.sql.execution.UnionLoopExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // Spark 4's WITH RECURSIVE re-plans the loop body each round; pin
    // the body's shape now so a Spark upgrade can't silently regress it
    // into an unpruned full re-scan of the base table per iteration
    val df = graft.queries.Relational.recursiveCte(spark, sfDir)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val loops = plan.collect { case u: UnionLoopExec => u }
    assert(loops.size == 1, s"expected one UnionLoop:\n$plan")
    val rec = loops.head.recursion
    val joins = rec.collect { case j: Join => j }
    assert(joins.size == 1, s"expected one frontier join:\n$rec")
    val j = joins.head
    val base = Seq(j.left, j.right)
      .find(_.collect { case l: LogicalRelation => l }.nonEmpty)
      .getOrElse(fail(s"no base relation under the join:\n$rec"))
    // filter pushed below the join: each round scans only p_partkey < 64
    assert(base.collect { case f: Filter => f }
      .exists(_.condition.toString.contains("p_partkey")),
      s"base-table filter must sit below the per-iteration join:\n$rec")
    // column pruning: the loop body reads one column, not the wide row
    assert(base.collect { case p: Project => p }
      .exists(_.projectList.map(_.name) == Seq("p_partkey")),
      s"base side must prune to p_partkey only:\n$rec")
    // the frontier side must NOT re-scan the base table
    val frontier = if (base eq j.left) j.right else j.left
    assert(frontier.collect { case l: LogicalRelation => l }.isEmpty,
      "frontier side must be the loop ref, not a table scan")
    assert(df.count() == 63) // 6 levels: 1+2+...+32 nodes under 64
  }

  test("bucketed tables join without a shuffle on the join key") {
    import spark.implicits._
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      graft.Tables.t(spark, sfDir, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      graft.Tables.t(spark, sfDir, "lineitem")
        .select($"l_orderkey", $"l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")
      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty"))
      // co-located buckets: the JOIN itself needs no exchange; the only
      // shuffle allowed is the post-join aggregation on o_orderpriority
      joined.collect()
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.length <= 1,
        s"expected only the aggregate exchange, got ${exchanges.length}")
      // and values match the unbucketed join
      val plain = graft.Tables.t(spark, sfDir, "lineitem")
        .join(graft.Tables.t(spark, sfDir, "orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val bucketed = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(bucketed == plain)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{when, concat, lit, lpad}
    val keys = Seq(
      // force the shuffle join AQE skew-handling applies to, and drop
      // the size thresholds so spec-scale data counts as skewed (at
      // real scale the 256 MB default is the right gate)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.5",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one pathological key owns half the fact rows — the canonical
      // hot-key shape that strands a single reducer at 100 TB
      val fact = spark.range(0, 60000)
        .select(
          when($"id" % 2 === 0, 0L).otherwise($"id" % 1000).as("k"),
          concat(lit("x"), lpad($"id".cast("string"), 64, "0")).as("pad"))
      val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 10).as("dv"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe (count() would plan its own query and
      // leave joined's adaptive plan unfinalized), then read the final
      // adaptive plan off the same QueryExecution
      assert(joined.collect().length == 60000,
        "every fact row matches exactly one dim row")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the skewed join (skew=true):\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("shard rebalance: rendezvous moves ~1/17 of keys, mod moves ~16/17, winners match a JVM recompute") {
    val r = Shard.rebalanceQ(spark, "/root/testdata/sf0.001").collect().head
    val n = r.getAs[Long]("n_docs")
    val (mm, mr) = (r.getAs[Long]("moved_mod"), r.getAs[Long]("moved_rdv"))
    // mod-grow reshuffles almost everything; rendezvous only the 1/17 slice
    assert(mr * 5 < mm, s"rendezvous $mr should be far below mod $mm")
    // binomial slack: p = 1/17, allow 4 sigma around np
    val p = 1.0 / 17
    val slack = 4 * math.sqrt(n * p * (1 - p))
    assert(math.abs(mr - n * p) <= slack, s"moved_rdv $mr vs expected ${n * p}")
    assert(r.getAs[Long]("moved_mod_bp") == 10000 * mm / n)
    assert(r.getAs[Long]("moved_rdv_bp") == 10000 * mr / n)

    // JVM recompute of the rendezvous winner for a sample of keys
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(key: String): Long = {
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def winner(id: Long, shards: Int): Int =
      (0 until shards).maxBy(j => (w(s"$id:$j"), j))
    import spark.implicits._
    val got = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id",
        org.apache.spark.sql.functions.expr(
          """array_max(transform(sequence(0, 16), j -> struct(
            |  cast(conv(substring(md5(concat(cast(doc_id as string), ':',
            |    cast(j as string))), 1, 15), 16, 10) as bigint) as w,
            |  j as j))).j""".stripMargin).as("r17"))
      .collect().map(r2 => (r2.getLong(0), r2.getInt(1)))
    got.take(50).foreach { case (id, j) =>
      assert(j == winner(id, 17), s"doc $id winner")
    }
  }

  test("salted join: equals the unsalted join exactly; hot key spread across all 16 salts") {
    import spark.implicits._
    val rows = Skew.saltedJoinQ(spark, sfDir).collect()
    // unsalted twin computed in-test
    val fact = graft.Tables.t(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity")
      .withColumn("k", when($"l_orderkey" % 10 < 7, 0L)
        .otherwise($"l_orderkey" % 64))
    val dim = spark.range(0, 64).select($"id".as("k"), ($"id" * 7 + 3).as("weight"))
    val direct = fact.join(dim, "k").groupBy($"k")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("total_qty"),
        max($"weight").as("weight"))
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("total_qty"),
          r.getAs[Long]("weight")))).toMap
    assert(rows.length == direct.size)
    rows.foreach { r =>
      val (n, q, w) = direct(r.getAs[Long]("k")) : (Long, Double, Long)
      assert(r.getAs[Long]("n_rows") == n)
      assert(math.abs(r.getAs[Double]("total_qty") - q) < 1e-9)
      assert(r.getAs[Long]("weight") == w)
    }
    // the hot key really is hot, and its salt split is balanced
    val hot = rows.find(_.getAs[Long]("k") == 0L).get
    assert(hot.getAs[Long]("n_rows") >
      rows.map(_.getAs[Long]("n_rows")).sum / 2, "~70% on key 0")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val saltCounts = graft.Tables.t(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_linenumber").collect()
      .filter(r => r.getLong(0) % 10 < 7)
      .map(r => h60(s"salt:${r.getLong(0)}:${r.getAs[Number](1).longValue}") % 16)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(saltCounts.size == 16, "all 16 salts used on the hot key")
    assert(saltCounts.values.max < saltCounts.values.min * 2,
      s"hot-key salt balance: $saltCounts")
  }

  test("zcurve: morton keys match a driver bit-interleave replay; z-order beats 1-D sort on the 2-D query") {
    import spark.implicits._
    val r = Shard.zcurveQ(spark, sfDir).collect().head
    val orders = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_totalprice", $"o_orderdate").collect()
      .map { row =>
        val p = BigDecimal(row.getDouble(0)).setScale(2)
        val x = math.min(255L, (p / 2500).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
        val days = row.getAs[java.time.LocalDateTime](1).toLocalDate.toEpochDay -
          java.time.LocalDate.of(1995, 1, 1).toEpochDay
        val y = math.min(255L, days / 10)
        (x, y)
      }
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(j => (((x >> j) & 1) << (2 * j)) +
        (((y >> j) & 1) << (2 * j + 1))).sum
    val marked = orders.map { case (x, y) =>
      (morton(x, y) / 256, x / 2, x >= 64 && x < 128 && y >= 32 && y < 96)
    }
    assert(r.getAs[Long]("n_rows") == orders.length)
    assert(r.getAs[Long]("n_match") == marked.count(_._3))
    assert(r.getAs[Long]("z_blocks_hit") ==
      marked.filter(_._3).map(_._1).distinct.length)
    assert(r.getAs[Long]("x_blocks_hit") ==
      marked.filter(_._3).map(_._2).distinct.length)
    assert(r.getAs[Long]("n_match") > 0, "the audit window must be non-empty")
    // the point of z-ordering: fewer blocks read than a 1-D sort layout
    assert(r.getAs[Long]("z_read_bp") < r.getAs[Long]("x_read_bp"),
      s"z ${r.getAs[Long]("z_read_bp")}bp vs x ${r.getAs[Long]("x_read_bp")}bp")
  }
}
