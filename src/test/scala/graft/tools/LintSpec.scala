package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The output-path FP-parity lint (VERDICT r8 item 2): no registered
  * query may round a double and cast it to DECIMAL after its last
  * aggregation — the shape that produced driver-hash-red rows in
  * correctness rounds 6, 7, and 8. Plan analysis only; nothing runs. */
class LintSpec extends AnyFunSuite with SparkSpec {

  test("lint catches a post-aggregation round→decimal cast (positive control)") {
    import spark.implicits._
    val bad = Seq((1, 3.0), (1, 4.0), (2, 5.0)).toDF("k", "v")
      .groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .select($"k", round($"s" / $"n", 4).cast("decimal(8,4)").as("ratio"))
    assert(Lint.roundDecimalOffenses(bad).nonEmpty,
      "lint must flag the known-fragile shape")
  }

  test("lint allows the per-row exact-sum contract inside aggregates (negative control)") {
    import spark.implicits._
    val ok = Seq((1, 3.0), (2, 5.0)).toDF("k", "v")
      .select($"k", round($"v", 9).cast("decimal(28,9)").as("vd"))
      .groupBy($"k").agg(sum($"vd").as("s"))
    assert(Lint.roundDecimalOffenses(ok).isEmpty,
      "per-row round→decimal feeding an aggregate is the dsum contract")
  }

  test("every registered query's output path is free of round(double)→DECIMAL") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val off = Lint.roundDecimalOffenses(fn(spark, sfDir))
        if (off.nonEmpty) Some(s"$name: ${off.mkString("; ")}") else None
    }
    assert(offenders.isEmpty,
      s"fragile round→decimal output paths:\n${offenders.mkString("\n")}")
  }
}
