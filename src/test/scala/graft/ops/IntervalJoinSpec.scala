package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** bucketedIntervalJoin: result ≡ the naive theta join, boundary
  * inclusivity, ranges spanning many buckets, and the plan-shape claim
  * (equi-join, not a nested loop). */
class IntervalJoinSpec extends AnyFunSuite with SparkSpec {

  test("matches the naive theta join exactly (boundaries inclusive)") {
    import spark.implicits._
    val probe = Seq(0.0, 0.5, 1.0, 2.49, 2.5, 7.0, 10.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
    val ranges = Seq(
      (1L, 0.5, 2.5),   // boundaries hit probes 0.5 and 2.5 inclusively
      (2L, 2.5, 2.5),   // degenerate point range
      (3L, 0.0, 9.99),  // spans many 0.25-buckets
      (4L, 11.0, 12.0)  // matches nothing
    ).toDF("rid", "lo", "hi")
    val fast = IntervalJoin.bucketed(probe, $"v", ranges, $"lo", $"hi", 0.25)
      .select($"pid", $"rid")
    val naive = probe.join(ranges, $"v".between($"lo", $"hi"))
      .select($"pid", $"rid")
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
    // no duplicate (probe, range) pairs from the bucket expansion
    assert(fast.count() == fast.distinct().count())
  }

  test("plan is an equi-join on the bucket, not a nested loop") {
    import spark.implicits._
    val probe = graft.Tables.t(spark, sfDir, "lineitem")
      .select(($"l_extendedprice" / $"l_quantity").as("up"))
    val ranges = graft.Tables.t(spark, sfDir, "part")
      .select(($"p_retailprice" - 0.05).as("lo"),
        ($"p_retailprice" + 0.05).as("hi"))
    val plan = IntervalJoin.bucketed(probe, $"up", ranges, $"lo", $"hi", 0.25)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must ride the bucket equi-join:\n$plan")
    assert(plan.contains("Join"), "expected a join operator in the plan")
  }
}
