package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, RoundBase}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window}
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/** Static output-path lint for the one FP-parity shape that has produced
  * driver-red rows in three separate correctness rounds (r6 repair, r7
  * pagerank/checksum/rfm, r8 retention/transitions/repair):
  * `CAST(ROUND(<double>) AS DECIMAL)` computed AFTER the last
  * aggregation. A post-aggregation quotient is an arbitrary double, and
  * when it lands near the half-tie at the rounding digit, two engines'
  * `round`-on-double (Spark's BigDecimal HALF_UP on the exact binary
  * expansion vs a C-library scaled-nearbyint) disagree — so the hash
  * diverges even though every intermediate was computed identically.
  * Ratios of small integers (retention, transition probabilities) hit
  * exact ties constantly, which is why this class keeps recurring.
  *
  * The PER-ROW round→decimal cast inside an aggregate (`sum(round(x, 9)
  * :: decimal)` — the repo's "dsum" exact-sum contract) is allowed: its
  * inputs are either exact few-decimal parquet values or values whose
  * 9th digit sits far from a tie, and it is the mechanism that makes
  * double sums order-independent. The lint therefore walks only the
  * OUTPUT REGION of the plan — root downward, stopping at the first
  * Aggregate / Window boundary on every branch (inspecting those nodes'
  * own named expressions but never descending into aggregate/window
  * function children or below the node).
  */
object Lint {

  /** Offending `Cast(…Round(double)… as Decimal)` expressions in the
    * final output region of the plan; empty = safe. */
  def roundDecimalOffenses(df: DataFrame): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()

    def containsDoubleRound(e: Expression): Boolean = e match {
      case _: AggregateExpression => false // below the exact-sum boundary
      case r: RoundBase
          if r.children.headOption.exists(c =>
            c.dataType == DoubleType || c.dataType == FloatType) =>
        true
      case other => other.children.exists(containsDoubleRound)
    }

    def scan(e: Expression, ctx: String): Unit = e match {
      case _: AggregateExpression => // per-row contract inside the function
      case c: Cast if c.dataType.isInstanceOf[DecimalType] &&
          containsDoubleRound(c.child) =>
        out += s"$ctx: ${c.sql}"
      case other => other.children.foreach(scan(_, ctx))
    }

    def walk(p: LogicalPlan): Unit = p match {
      case a: Aggregate =>
        a.aggregateExpressions.foreach(scan(_, "aggregate"))
      case w: Window =>
        w.windowExpressions.foreach(scan(_, "window"))
      case other =>
        other.expressions.foreach(scan(_, other.nodeName))
        other.children.foreach(walk)
    }

    walk(df.queryExecution.analyzed)
    out.toList
  }

  /** `CAST(<integral multiply> AS DECIMAL)` anywhere in the plan — the
    * int64-overflow class that broke q_stat_cvm (r12) and q_stat_ad
    * (r13, VERDICT item 1): casting the PRODUCT to decimal says the
    * author knew it needed decimal width, but the multiply itself runs
    * in int64 and wraps (non-ANSI) or throws (ANSI) once a factor
    * passes ~3·10⁹ — i.e. at row scale, exactly the design point. The
    * fix is always the same one-liner: cast the FACTORS to
    * DECIMAL(19,0) BEFORE multiplying. Sites whose factors are bounded
    * by a VALUE DOMAIN (quantity cents, account-balance cents — never
    * row counts) are whitelisted in LintSpec with the bound. */
  def longProductDecimalOffenses(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.Multiply
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val out = scala.collection.mutable.ListBuffer[String]()

    def integralMultiply(e: Expression): Boolean = e match {
      // a nested cast-to-decimal re-enters via scan below; its inner
      // long math is its own (separately reported) offense
      case c: Cast if c.dataType.isInstanceOf[DecimalType] => false
      case m: Multiply
          if m.dataType == LongType || m.dataType == IntegerType => true
      case other => other.children.exists(integralMultiply)
    }

    def scan(e: Expression, ctx: String): Unit = e match {
      case c: Cast if c.dataType.isInstanceOf[DecimalType] &&
          integralMultiply(c.child) =>
        out += s"$ctx: ${c.sql}"
        c.child.children.foreach(scan(_, ctx))
      case other => other.children.foreach(scan(_, ctx))
    }

    df.queryExecution.analyzed.foreach { p =>
      p.expressions.foreach(scan(_, p.nodeName))
    }
    out.toList
  }
}
