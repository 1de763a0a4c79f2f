package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Numeric-distribution profiling — the fixed-size histogram a pipeline
  * publishes per column per ingestion batch (the input to drift checks
  * like [[Drift]] and to human data-quality review).
  *
  * Shape: one bounded min/max aggregate (broadcast back as a 1-row
  * dimension — the [[Drift]] totals pattern, no driver collect), then a
  * map-side-combinable groupBy over ≤ `bins` keys. Two scans of the
  * column at any scale, both at scan speed; the histogram itself is
  * O(bins) rows however large the input. Bin ids come from the same
  * explicit floor((v − lo) · bins / span) formula evaluated identically
  * on both engines (clamped so v = hi lands in the last bin); per-bin
  * min/max are exact values (no FP arithmetic), so the result is
  * hash-stable.
  */
object Profile {

  /** Histogram of `v` into `bins` uniform buckets over its observed
    * [min, max]; emits bin id, count, and exact per-bin extrema. */
  def histogram(df: DataFrame, v: Column, bins: Int): DataFrame = {
    val ext = df.agg(min(v).cast("double").as("graft_lo"),
      max(v).cast("double").as("graft_hi"))
    val span = col("graft_hi") - col("graft_lo")
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((v.cast("double") - col("graft_lo")) * bins / span).cast("long")))
    df.crossJoin(broadcast(ext))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        min(v).as("v_min"), max(v).as("v_max"))
  }

  def histogramQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    histogram(t(s, dir, "events"), $"value", bins = 20)
      .orderBy($"bin")
  }

  val histogramSql: String =
    """WITH ext AS (
      |  SELECT CAST(min(value) AS DOUBLE) AS lo,
      |         CAST(max(value) AS DOUBLE) AS hi FROM events)
      |SELECT
      |  least(19, greatest(0, CAST(floor((value - lo) * 20 / (hi - lo)) AS BIGINT))) AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(value) AS v_min, max(value) AS v_max
      |FROM events, ext GROUP BY 1 ORDER BY bin""".stripMargin

  /** Per-group z-score outlier accounting — the numeric-column anomaly
    * check (|v − μ| > 3σ) a pipeline runs per ingestion batch.
    *
    * Determinism: double sums drift with partition order, so μ and σ
    * derive from EXACT decimal Σv and Σv² (map-side-combinable, integer
    * arithmetic under the hood); the double math that follows is the
    * same expression tree on both engines. Two scan-speed aggregations
    * (moments, then the flag count against the broadcast per-group
    * stats row), never a per-group sort. */
  def zscoreQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val moments = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,6)")).as("s1"),
        // 18,6 × 18,6 → 36/37,12 stays inside both engines' 38-digit cap
        sum($"value".cast("decimal(18,6)") * $"value".cast("decimal(18,6)"))
          .as("s2"))
      .select($"event_type", $"n",
        ($"s1".cast("double") / $"n").as("mu"),
        sqrt(($"s2".cast("double") - $"s1".cast("double") *
          $"s1".cast("double") / $"n") / ($"n" - 1)).as("sigma"))
    ev.join(broadcast(moments), "event_type")
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        round(max($"mu"), 6).as("mu"),
        round(max($"sigma"), 6).as("sigma"),
        sum(when(abs($"value" - $"mu") > $"sigma" * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy($"event_type")
  }

  val zscoreSql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1d,
      |    CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2d
      |  FROM events GROUP BY event_type),
      |st AS (
      |  SELECT event_type, n, s1d / n AS mu,
      |         sqrt((s2d - s1d * s1d / n) / (n - 1)) AS sigma FROM m)
      |SELECT e.event_type, max(st.n) AS n,
      |  round(max(st.mu), 6) AS mu, round(max(st.sigma), 6) AS sigma,
      |  CAST(sum(CASE WHEN abs(e.value - st.mu) > st.sigma * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN st USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Order-independent content checksum — the integrity primitive for
    * validating a copied/migrated/re-partitioned table WITHOUT sorting
    * it: per-row 60-bit md5 of a canonical string encoding, summed as
    * DECIMAL(38,0) (exact, overflow-free, commutative — so any
    * partitioning, engine, or row order yields the identical digest).
    * A single flipped value anywhere changes the sum with probability
    * 1 − 2⁻⁶⁰. One map + one scalar aggregate: scan speed, 1-row
    * output, no exchange beyond the final combine.
    *
    * Canonical encoding pins column order and formatting explicitly
    * (`concat_ws('|', ...)` over string-cast columns) — checksums are a
    * CONTRACT, so the encoding lives in the query, not in engine
    * defaults. Floating-point columns are pinned through a fixed-scale
    * DECIMAL before stringification: a raw double→string cast leaves
    * the digest hostage to two engines' double-formatting agreeing
    * forever, which is exactly the dependence a canonical encoding
    * exists to remove. DECIMAL(12,2)→string is fixed-format ("17.00")
    * in both engines. */
  def checksumQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val canon = concat_ws("|",
      $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
      $"l_quantity".cast("decimal(12,2)").cast("string"), $"l_returnflag")
    t(s, dir, "lineitem")
      .select(Hashing.md5Long60(canon).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum($"h".cast("decimal(38,0)")).as("checksum"))
      // OUTPUT type contract: the 23-digit digest cannot round-trip the
      // driver comparator's float64/int64 client path, so the final
      // column is pinned to its canonical VARCHAR form on both engines
      // (decimal→string is plain digits in Spark and DuckDB alike); the
      // DECIMAL(38,0) arithmetic stays internal where exactness matters.
      .select($"n_rows", $"checksum".cast("decimal(38,0)").cast("string").as("checksum"))
  }

  val checksumSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(CAST(sum(CAST(('0x' || substr(md5(
      |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
      |    || '|' || CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) || '|' || l_returnflag
      |  ), 1, 15))::UBIGINT AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
      |FROM lineitem""".stripMargin

  /** Order-independent whole-table content digest — [[checksumQ]]'s
    * integrity primitive generalized to ANY table: per-row 60-bit md5
    * of the row's canonical JSON encoding (`to_json(struct(*))` — type-
    * generic, deterministic for a fixed Spark version), summed as exact
    * DECIMAL(38,0). Any value change anywhere flips the digest with
    * probability 1 − 2⁻⁶⁰; row order and partitioning never do. Backs
    * the testdata VALUE canary (TablesSpec): a silent driver
    * regeneration of a fixture table is reported as DATA drift by name,
    * instead of surfacing as unexplained oracle mismatches. */
  def contentDigest(df: org.apache.spark.sql.DataFrame): String = {
    val rowJson = to_json(struct(df.columns.map(col).toIndexedSeq: _*))
    df.select(Hashing.md5Long60(rowJson).as("h"))
      .agg(coalesce(sum(col("h").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("d"))
      .head.getDecimal(0).toPlainString
  }

  /** Equal-frequency (quantile) binning — feature discretization /
    * stratum construction: per-group quartile boundaries of a value
    * column, then every row assigned its bin by comparison against the
    * broadcast 3-number-per-group boundary row. The boundary pass
    * reuses the stats2 exact-R-7-percentile shape (window rank +
    * interpolation-weight conditional sum — codegen, one per-group
    * sort, no single-threaded ObjectHashAggregate); the binning pass is
    * a broadcast join + map — scan speed at any scale. Boundaries are
    * rounded to 4 dp so the bin comparisons evaluate on the identical
    * double in both engines. */
  def binsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val wOrd = Window.partitionBy($"l_returnflag").orderBy($"v")
    val wAll = Window.partitionBy($"l_returnflag")
    def interp(p: Double): Column = {
      val idx = lit(p) * ($"cnt" - lit(1)).cast("double")
      val d = abs(idx - ($"rn" - lit(1)).cast("double"))
      round(sum(when(d < 1, $"v" * (lit(1d) - d)).otherwise(lit(0d))), 4)
    }
    val bounds = li.select($"l_returnflag", $"l_extendedprice".as("v"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy($"l_returnflag")
      .agg(interp(0.25).as("p25"), interp(0.5).as("p50"), interp(0.75).as("p75"))
    li.select($"l_returnflag", $"l_extendedprice".as("v"), $"l_quantity")
      .join(broadcast(bounds), "l_returnflag")
      .withColumn("bin",
        when($"v" <= $"p25", 0).when($"v" <= $"p50", 1)
          .when($"v" <= $"p75", 2).otherwise(3))
      .groupBy($"l_returnflag", $"bin")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag", $"bin")
  }

  val binsSql: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |    ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |    ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag,
      |  CASE WHEN l_extendedprice <= p25 THEN 0
      |       WHEN l_extendedprice <= p50 THEN 1
      |       WHEN l_extendedprice <= p75 THEN 2 ELSE 3 END AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem l JOIN b USING (l_returnflag)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-column data-profile overview — the null-ratio / cardinality /
    * range summary a pipeline publishes per table per batch (the
    * at-a-glance sheet reviewers and schema monitors read). TWO
    * scan-speed passes — one for null/distinct accounting, one for
    * ranges — then `stack` pivots the broadcast-joined 1-row result
    * into a row per column; adding a column adds expressions, not
    * passes.
    *
    * Scale note: several exact `countDistinct`s in one aggregate plan
    * via Expand (input ×|columns| into the shuffle) — exact is kept
    * here because the oracle compares cardinalities; at a real 100 TB
    * profile swap `approx_count_distinct` in and the Expand collapses
    * away. Min/max travel as canonical strings with pinned formats
    * (decimal-cast doubles, second-precision dates) so the row is
    * engine-portable. */
  def overviewQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    def nulls(c: String) = count(when(col(c).isNull, 1)).as(s"nn_$c")
    // split the two aggregate families (the stats2 lesson, same reason):
    // exact countDistincts plan via Expand and stay in HashAggregate
    // (pure long buffers), while min/max over STRING columns force a
    // SortAggregate — mixed together, the sort-based path drags the 5×
    // Expand through a wide sort (measured 5.9s → 1.4s at sf0.1 split).
    val distincts = li.agg(
      nulls("l_orderkey"), countDistinct($"l_orderkey").as("nd_l_orderkey"),
      nulls("l_quantity"), countDistinct($"l_quantity").as("nd_l_quantity"),
      nulls("l_returnflag"), countDistinct($"l_returnflag").as("nd_l_returnflag"),
      nulls("l_shipdate"), countDistinct($"l_shipdate").as("nd_l_shipdate"))
    val ranges = li.agg(
      min($"l_orderkey").cast("string").as("mn_l_orderkey"),
      max($"l_orderkey").cast("string").as("mx_l_orderkey"),
      min($"l_quantity").cast("decimal(12,2)").cast("string").as("mn_l_quantity"),
      max($"l_quantity").cast("decimal(12,2)").cast("string").as("mx_l_quantity"),
      min($"l_returnflag").as("mn_l_returnflag"),
      max($"l_returnflag").as("mx_l_returnflag"),
      date_format(min($"l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("mn_l_shipdate"),
      date_format(max($"l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("mx_l_shipdate"))
    val a = distincts.crossJoin(broadcast(ranges)) // two 1-row frames
    a.selectExpr(
      """stack(4,
        |'l_orderkey',  nn_l_orderkey,  nd_l_orderkey,  mn_l_orderkey,  mx_l_orderkey,
        |'l_quantity',  nn_l_quantity,  nd_l_quantity,  mn_l_quantity,  mx_l_quantity,
        |'l_returnflag',nn_l_returnflag,nd_l_returnflag,mn_l_returnflag,mx_l_returnflag,
        |'l_shipdate',  nn_l_shipdate,  nd_l_shipdate,  mn_l_shipdate,  mx_l_shipdate
        |) AS (col_name, n_nulls, n_distinct, min_s, max_s)""".stripMargin)
      .orderBy($"col_name")
  }

  val overviewSql: String =
    """SELECT 'l_orderkey' AS col_name,
      |  COUNT(*) - COUNT(l_orderkey) AS n_nulls,
      |  COUNT(DISTINCT l_orderkey) AS n_distinct,
      |  CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
      |  CAST(MAX(l_orderkey) AS VARCHAR) AS max_s FROM lineitem
      |UNION ALL SELECT 'l_quantity',
      |  COUNT(*) - COUNT(l_quantity), COUNT(DISTINCT l_quantity),
      |  CAST(CAST(MIN(l_quantity) AS DECIMAL(12,2)) AS VARCHAR),
      |  CAST(CAST(MAX(l_quantity) AS DECIMAL(12,2)) AS VARCHAR) FROM lineitem
      |UNION ALL SELECT 'l_returnflag',
      |  COUNT(*) - COUNT(l_returnflag), COUNT(DISTINCT l_returnflag),
      |  MIN(l_returnflag), MAX(l_returnflag) FROM lineitem
      |UNION ALL SELECT 'l_shipdate',
      |  COUNT(*) - COUNT(l_shipdate), COUNT(DISTINCT l_shipdate),
      |  strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
      |  strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') FROM lineitem
      |ORDER BY col_name""".stripMargin

  /** Robust (MAD) outlier accounting — the z-score family's
    * median-based sibling: per group, the median, the median absolute
    * deviation, and the count of rows beyond the standard
    * 3 × 1.4826 × MAD fence. Z-scores move with the outliers they hunt
    * (one 1000× row drags the mean and inflates sigma); the MAD fence
    * is what a curation pipeline uses when the column is heavy-tailed —
    * which at 100 TB, every interesting column is.
    *
    * Two percentile passes (value, then |v − median|), each the same
    * codegen window-rank + interpolation-weight shape as [[binsQ]] —
    * per-group sorts that scale out, no single-threaded
    * ObjectHashAggregate. Medians are rounded to 4 dp before the
    * deviation/fence arithmetic so every downstream comparison
    * evaluates on the identical double in both engines (the
    * interpolation sum itself is exact: ≤2 nonzero terms, and IEEE
    * addition of zeros is exact in any order). */
  def madQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    def interp(v: Column, p: Double, rn: Column, cnt: Column): Column = {
      val idx = lit(p) * (cnt - lit(1)).cast("double")
      val d = abs(idx - (rn - lit(1)).cast("double"))
      round(sum(when(d < 1, v * (lit(1d) - d)).otherwise(lit(0d))), 4)
    }
    val base = t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice".as("v"))
    val wOrd = Window.partitionBy($"l_returnflag").orderBy($"v")
    val wAll = Window.partitionBy($"l_returnflag")
    val med = base
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy($"l_returnflag")
      .agg(interp($"v", 0.5, $"rn", $"cnt").as("med"))
    val dev = base.join(broadcast(med), "l_returnflag")
      .withColumn("d", abs($"v" - $"med"))
    val wDev = Window.partitionBy($"l_returnflag").orderBy($"d")
    val mad = dev
      .withColumn("rn", row_number().over(wDev))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy($"l_returnflag")
      .agg(interp($"d", 0.5, $"rn", $"cnt").as("mad"))
    // two fences: the standard 3× fence (zero on this uniform-ish
    // column — a true finding worth asserting) and the 1× mild fence,
    // nonzero, so the comparison machinery is value-tested too
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        first($"med").as("med"), first($"mad").as("mad"),
        sum(($"d" > lit(1.4826) * $"mad").cast("long")).as("n_mild"),
        sum(($"d" > lit(3d) * lit(1.4826) * $"mad").cast("long"))
          .as("n_extreme"))
      .orderBy($"l_returnflag")
  }

  val madSql: String =
    """WITH med AS (
      |  SELECT l_returnflag, ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med
      |  FROM lineitem GROUP BY l_returnflag),
      |dev AS (
      |  SELECT l.l_returnflag, ABS(l_extendedprice - med) AS d, med
      |  FROM lineitem l JOIN med USING (l_returnflag)),
      |mad AS (
      |  SELECT l_returnflag, ROUND(quantile_cont(d, 0.5), 4) AS mad
      |  FROM dev GROUP BY l_returnflag)
      |SELECT dev.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  ANY_VALUE(dev.med) AS med, ANY_VALUE(mad.mad) AS mad,
      |  CAST(SUM(CASE WHEN d > 1.4826 * mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_mild,
      |  CAST(SUM(CASE WHEN d > 3 * 1.4826 * mad THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_extreme
      |FROM dev JOIN mad USING (l_returnflag)
      |GROUP BY dev.l_returnflag ORDER BY dev.l_returnflag""".stripMargin

  /** q_profile_gini entry: Gini coefficient of order value per priority
    * class — the inequality/concentration profile of a numeric column
    * ("is 90% of the revenue in 1% of the orders?"), the budget-audit
    * companion to [[HeavyHitters]]' categorical concentration and the
    * [[Skew]] report's key-level imbalance.
    *
    * Formula (sorted ascending, 1-based rank): G = 2·Σ(i·xᵢ)/(n·Σxᵢ)
    * − (n+1)/n. One per-group sort (window row_number) + a combinable
    * aggregate. Money follows the exact-decimal contract: xᵢ travels as
    * DECIMAL(18,2) and i·xᵢ sums as DECIMAL(28,2) — both exact, so only
    * the final quotient is IEEE. Tied values: rank order within a tie
    * is engine-dependent but G is tie-invariant (equal xᵢ make Σi·xᵢ
    * independent of which tie takes which rank). */
  def giniQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"x")
    t(s, dir, "orders")
      .select($"o_orderpriority", $"o_totalprice".cast("decimal(18,2)").as("x"))
      .withColumn("i", row_number().over(w))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sum_x"),
        sum(($"i".cast("decimal(18,0)") * $"x").cast("decimal(28,2)"))
          .as("sum_ix"))
      .select($"o_orderpriority", $"n",
        round(lit(2d) * $"sum_ix".cast("double") /
            ($"n".cast("double") * $"sum_x".cast("double")) -
          ($"n" + 1).cast("double") / $"n".cast("double"), 6).as("gini"))
      .orderBy($"o_orderpriority")
  }

  val giniSql: String =
    """WITH r AS (
      |  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS x,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2))) AS i
      |  FROM orders),
      |a AS (
      |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(x) AS sum_x,
      |    SUM(CAST(CAST(i AS DECIMAL(18,0)) * x AS DECIMAL(28,2))) AS sum_ix
      |  FROM r GROUP BY 1)
      |SELECT o_orderpriority, n,
      |  ROUND(2 * CAST(sum_ix AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sum_x AS DOUBLE))
      |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
      |FROM a ORDER BY o_orderpriority""".stripMargin

  /** q_profile_corr entry: pairwise Pearson correlation matrix over the
    * four lineitem numeric measures — the first page of any numeric
    * data profile ("which measures are redundant / which co-move?"),
    * and the input a feature-selection or drift-root-cause pass reads.
    *
    * Scale shape: ONE combinable aggregate computes all 15 sufficient
    * statistics (n, Σx and Σx² per column, Σxy per pair) in a single
    * corpus pass; the 6 matrix cells are scalar expressions over that
    * 1-row frame, exploded to rows. Sums travel as exact decimals
    * (values pinned to DECIMAL(18,2) first), so both engines evaluate
    * the shared corr formula on identical doubles; rounded 6 dp. */
  def corrQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = t(s, dir, "lineitem")
      .select(cols.map(c => col(c).cast("decimal(18,2)").as(c)): _*)
    val sums =
      Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(col(c)).cast("decimal(38,2)").as(s"s_$c")) ++
      cols.map(c => sum((col(c) * col(c)).cast("decimal(38,4)"))
        .cast("decimal(38,4)").as(s"ss_$c")) ++
      cols.combinations(2).map { case Seq(a, b) =>
        sum((col(a) * col(b)).cast("decimal(38,4)"))
          .cast("decimal(38,4)").as(s"sp_${a}_$b") }.toSeq
    val agg = li.agg(sums.head, sums.tail: _*)
    def corr(a: String, b: String): Column = {
      val n = col("n").cast("double")
      val (sa, sb) = (col(s"s_$a").cast("double"), col(s"s_$b").cast("double"))
      val (qa, qb) = (col(s"ss_$a").cast("double"), col(s"ss_$b").cast("double"))
      val p = col(s"sp_${a}_$b").cast("double")
      round((n * p - sa * sb) /
        sqrt((n * qa - sa * sa) * (n * qb - sb * sb)), 6)
    }
    val cells = cols.combinations(2).map { case Seq(a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"), corr(a, b).as("corr"))
    }.toSeq
    agg.select(explode(array(cells: _*)).as("c"))
      .select($"c.col_x", $"c.col_y", $"c.corr")
      .orderBy($"col_x", $"col_y")
  }

  val corrSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val sums =
      Seq("COUNT(*) AS n") ++
      cols.map(c => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s_$c") ++
      cols.map(c => s"CAST(SUM(CAST(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS ss_$c") ++
      cols.combinations(2).map { case Seq(a, b) =>
        s"CAST(SUM(CAST(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sp_${a}_$b" }.toSeq
    val cells = cols.combinations(2).map { case Seq(a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y,
         |  ROUND((CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE)
         |      - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |    / SQRT((CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)
         |        - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |      * (CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)
         |        - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6) AS corr
         |FROM a""".stripMargin }.toSeq
    s"""WITH a AS (SELECT ${sums.mkString(", ")} FROM lineitem)
       |SELECT * FROM (${cells.mkString("\nUNION ALL\n")})
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** q_profile_theil entry: Theil T inequality index of order value,
    * decomposed into BETWEEN-priority and WITHIN-priority components —
    * the decomposition [[giniQ]] cannot give (Gini does not split
    * additively): "is revenue concentration driven by the priority mix
    * or by inequality inside each class?" — for a corpus, "is token
    * concentration a source-mix effect or intra-source?".
    *
    * T = (1/n)Σ(xᵢ/μ)ln(xᵢ/μ); T_between = Σ_g s_g·ln(μ_g/μ);
    * T_within = Σ_g s_g·T_g with s_g = (n_g/n)(μ_g/μ). Identity
    * T = T_between + T_within is spec-checked.
    *
    * Scale shape: group means come from one combinable groupBy (exact
    * DECIMAL(18,2) money sums); per-row log terms join the broadcast
    * ≤|groups| mean frame, are rounded to 9 dp and summed as
    * DECIMAL(28,9) (partition-order-independent), and the final
    * assembly runs on the |groups|-row frame. Two scans total, both at
    * scan speed. */
  def theilQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"o_totalprice".cast("decimal(18,2)")
    val groups = t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_g"), sum(x).as("sx_g"))
    val totals = groups.agg(sum($"n_g").as("n"), sum($"sx_g").as("sx"))
    val withMeans = t(s, dir, "orders")
      .select($"o_orderpriority", x.cast("double").as("v"))
      .join(broadcast(groups), "o_orderpriority")
      .crossJoin(broadcast(totals))
      .withColumn("mu", $"sx".cast("double") / $"n")
      .withColumn("mu_g", $"sx_g".cast("double") / $"n_g")
    val terms = withMeans
      .groupBy($"o_orderpriority", $"n_g", $"mu_g", $"n", $"mu")
      .agg(
        sum(round(($"v" / $"mu") * log($"v" / $"mu"), 9)
          .cast("decimal(28,9)")).as("t_tot_g"),
        sum(round(($"v" / $"mu_g") * log($"v" / $"mu_g"), 9)
          .cast("decimal(28,9)")).as("t_grp_g"))
    terms
      .select($"n", $"mu",
        $"t_tot_g",
        (($"n_g".cast("double") / $"n") * ($"mu_g" / $"mu") *
          log($"mu_g" / $"mu")).as("between_g"),
        (($"n_g".cast("double") / $"n") * ($"mu_g" / $"mu") *
          ($"t_grp_g".cast("double") / $"n_g")).as("within_g"))
      .groupBy($"n", $"mu")
      .agg(
        round(sum($"t_tot_g").cast("double") / $"n", 6).as("theil_total"),
        round(sum(round($"between_g", 9).cast("decimal(28,9)")).cast("double"), 6)
          .as("theil_between"),
        round(sum(round($"within_g", 9).cast("decimal(28,9)")).cast("double"), 6)
          .as("theil_within"))
      .select($"n".cast("long").as("n"), round($"mu", 6).as("mean_value"),
        $"theil_total", $"theil_between", $"theil_within")
  }

  val theilSql: String =
    """WITH g AS (
      |  SELECT o_orderpriority, COUNT(*) AS n_g,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sx_g
      |  FROM orders GROUP BY 1),
      |t AS (SELECT SUM(n_g) AS n, SUM(sx_g) AS sx FROM g),
      |rows_m AS (
      |  SELECT o.o_orderpriority,
      |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v,
      |    g.n_g, CAST(g.sx_g AS DOUBLE) / g.n_g AS mu_g,
      |    t.n, CAST(t.sx AS DOUBLE) / t.n AS mu
      |  FROM orders o JOIN g USING (o_orderpriority) CROSS JOIN t),
      |terms AS (
      |  SELECT o_orderpriority, n_g, mu_g, n, mu,
      |    SUM(CAST(ROUND((v / mu) * ln(v / mu), 9) AS DECIMAL(28,9))) AS t_tot_g,
      |    SUM(CAST(ROUND((v / mu_g) * ln(v / mu_g), 9) AS DECIMAL(28,9))) AS t_grp_g
      |  FROM rows_m GROUP BY 1, 2, 3, 4, 5)
      |SELECT CAST(n AS BIGINT) AS n, ROUND(mu, 6) AS mean_value,
      |  ROUND(CAST(SUM(t_tot_g) AS DOUBLE) / n, 6) AS theil_total,
      |  ROUND(CAST(SUM(CAST(ROUND((CAST(n_g AS DOUBLE) / n) * (mu_g / mu)
      |    * ln(mu_g / mu), 9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS theil_between,
      |  ROUND(CAST(SUM(CAST(ROUND((CAST(n_g AS DOUBLE) / n) * (mu_g / mu)
      |    * (CAST(t_grp_g AS DOUBLE) / n_g), 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
      |    AS theil_within
      |FROM terms GROUP BY n, mu""".stripMargin

  /** q_agg_percentile_disc entry: EXACT discrete percentiles (p25 /
    * p50 / p75 / p90 of `l_quantity`) per return flag — percentile_disc
    * semantics, i.e. the smallest data value whose cumulative rank
    * reaches p. The exact companion to `q_agg_approx_quantiles`: the
    * approx sketch is the 100 TB default, but calibration and spot
    * audits need the true order statistic, and SELECTION is the one
    * percentile definition two engines can agree on byte-for-byte even
    * over doubles (no interpolation arithmetic — the value at row
    * ceil(p·n/100) is emitted verbatim from storage).
    *
    * Scale: one exchange keyed on the group serves the rank window and
    * the final aggregate; the target-row positions are pure integer
    * expressions of the per-group count, folded into conditional MAXes
    * so no second pass and no collect. Groups are domain-bounded (3
    * return flags); within-group sort is the unavoidable cost of exact
    * order statistics (that's WHY the approx twin exists). */
  def percentileDiscQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val byG = Window.partitionBy($"g").orderBy($"v")
    val all = Window.partitionBy($"g")
    val ranked = t(s, dir, "lineitem")
      .select($"l_returnflag".as("g"), $"l_quantity".as("v"))
      .withColumn("rn", row_number().over(byG))
      .withColumn("n", count(lit(1)).over(all))
    ranked
      .groupBy($"g")
      .agg(max($"n").as("n_rows"),
        max(when($"rn" === expr("(25 * n + 99) div 100"), $"v")).as("p25"),
        max(when($"rn" === expr("(50 * n + 99) div 100"), $"v")).as("p50"),
        max(when($"rn" === expr("(75 * n + 99) div 100"), $"v")).as("p75"),
        max(when($"rn" === expr("(90 * n + 99) div 100"), $"v")).as("p90"))
      .orderBy($"g")
  }

  val percentileDiscSql: String =
    """WITH r AS (
      |  SELECT l_returnflag AS g, l_quantity AS v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT g, CAST(MAX(n) AS BIGINT) AS n_rows,
      |  MAX(CASE WHEN rn = (25 * n + 99) // 100 THEN v END) AS p25,
      |  MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN v END) AS p50,
      |  MAX(CASE WHEN rn = (75 * n + 99) // 100 THEN v END) AS p75,
      |  MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN v END) AS p90
      |FROM r GROUP BY g ORDER BY g""".stripMargin

  /** q_agg_weighted_median entry: exact WEIGHTED median per group —
    * the revenue value v* where half the group's QUANTITY sits at or
    * below (lower weighted median: smallest v with 2·cumweight(≤v) ≥
    * total) — the volume-aware center [[percentileDiscQ]]'s unweighted
    * selection misses when row counts and business weight diverge
    * (one 50-unit line ≠ one 1-unit line).
    *
    * Scale shape: the fact table collapses to per-(group, value)
    * weight sums FIRST (combinable, value-bounded), the cumulative
    * runs over the reduced frame, and the answer is one MIN per group
    * — exact integers/decimals throughout, no FP contract. */
  def weightedMedianQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val wv = t(s, dir, "lineitem")
      .select($"l_returnflag".as("g"),
        $"l_extendedprice".cast("decimal(18,2)").as("v"),
        $"l_quantity".cast("long").as("w"))
      .groupBy($"g", $"v").agg(sum($"w").as("cw"))
    val cum = Window.partitionBy($"g").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy($"g")
    wv.withColumn("cum", sum($"cw").over(cum))
      .withColumn("tw", sum($"cw").over(tot))
      .filter($"cum" * 2 >= $"tw")
      .groupBy($"g")
      .agg(max($"tw").cast("long").as("total_weight"),
        // output boundary: exact decimal cast ONCE to double — a
        // DECIMAL-typed output column hash-diverges in the driver
        // whenever str(Decimal) != repr(float), e.g. trailing-zero
        // cents (see Cluster.kmeansQ contract note)
        min($"v").cast("double").as("w_median"))
      .orderBy($"g")
  }

  val weightedMedianSql: String =
    """WITH wv AS (
      |  SELECT l_returnflag AS g, CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
      |    SUM(CAST(l_quantity AS BIGINT)) AS cw
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT g, v,
      |    SUM(cw) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cw) OVER (PARTITION BY g) AS tw
      |  FROM wv)
      |SELECT g, CAST(MAX(tw) AS BIGINT) AS total_weight,
      |  CAST(MIN(v) AS DOUBLE) AS w_median
      |FROM c WHERE cum * 2 >= tw
      |GROUP BY g ORDER BY g""".stripMargin

  /** q_agg_trimmed_mean entry: exact 5%-trimmed mean per event type —
    * DROP the bottom and top 5% of rows by rank and average the
    * interior: the robust center that, unlike
    * [[graft.ops.Repair.winsorizeQ]]'s CLIP (which keeps outlier rows
    * at the fence value), removes their weight entirely — the pair
    * brackets how much of a metric's level is tail-driven.
    *
    * Same exact micro-unit contract as winsorize: ranks over scaled
    * BIGINTs (ties by event_id), the trim count k = ⌈0.05·n⌉ is
    * integer arithmetic, and the interior mean is integer floor
    * division — bit-identical on both engines, no FP anywhere. */
  def trimmedMeanQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ev = t(s, dir, "events").select($"event_id", $"event_type",
      ($"value".cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
    val w = Window.partitionBy($"event_type").orderBy($"vm", $"event_id")
    ev.withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"event_type")))
      .withColumn("k", expr("(5 * n + 99) div 100"))
      .groupBy($"event_type")
      .agg(max($"n").cast("long").as("n"),
        max($"k" * 2).cast("long").as("n_dropped"),
        expr("CAST(sum(vm) DIV count(vm) AS BIGINT)").as("mean_micro"),
        expr("""CAST(sum(CASE WHEN r > k AND r <= n - k THEN vm END)
          | DIV count(CASE WHEN r > k AND r <= n - k THEN vm END)
          | AS BIGINT)""".stripMargin).as("trimmed_mean_micro"))
      .orderBy($"event_type")
  }

  val trimmedMeanSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
      |  FROM events),
      |r AS (
      |  SELECT event_type, vm,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY vm, event_id) AS r,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n,
      |    (5 * COUNT(*) OVER (PARTITION BY event_type) + 99) // 100 AS k
      |  FROM ev)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MAX(k * 2) AS BIGINT) AS n_dropped,
      |  CAST(SUM(vm) // COUNT(vm) AS BIGINT) AS mean_micro,
      |  CAST(SUM(CASE WHEN r > k AND r <= n - k THEN vm END)
      |    // COUNT(CASE WHEN r > k AND r <= n - k THEN vm END)
      |    AS BIGINT) AS trimmed_mean_micro
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q_agg_mode entry: exact per-group MODE (most frequent value,
    * smallest-value tiebreak) of `l_quantity` per return flag plus its
    * multiplicity and the share of the group it covers (basis points).
    * The mode is the one central-tendency statistic SQL engines don't
    * agree on a builtin for (and whose builtins tie-break
    * nondeterministically) — this pins a deterministic contract.
    *
    * Scale: value-frequency table first (combinable groupBy, value-
    * bounded), then the argmax packs into ONE comparable-struct MAX —
    * `max(struct(cnt, -value))` — so the whole query is two combinable
    * aggregates, no window, no second shuffle of fact rows. */
  def modeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val freq = t(s, dir, "lineitem")
      .groupBy($"l_returnflag".as("g"), $"l_quantity".as("v"))
      .agg(count(lit(1)).as("cnt"))
    freq
      .groupBy($"g")
      .agg(sum($"cnt").as("n_rows"),
        max(struct($"cnt", (-$"v").as("nv"))).as("best"))
      .select($"g", (-$"best.nv").as("mode_value"),
        $"best.cnt".as("mode_n"), $"n_rows",
        expr("(10000 * best.cnt) div n_rows").as("mode_share_bp"))
      .orderBy($"g")
  }

  val modeSql: String =
    """WITH f AS (
      |  SELECT l_returnflag AS g, l_quantity AS v, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT g, v, cnt,
      |    row_number() OVER (PARTITION BY g ORDER BY cnt DESC, v) AS rk,
      |    CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n_rows
      |  FROM f)
      |SELECT g, v AS mode_value, cnt AS mode_n, n_rows,
      |  (10000 * cnt) // n_rows AS mode_share_bp
      |FROM r WHERE rk = 1 ORDER BY g""".stripMargin

  /** q_profile_abc entry: ABC / Pareto revenue classification — rank
    * customers by lifetime revenue and cut the ranking at 80% / 95% of
    * cumulative revenue: class A carries the first 80%, B the next 15%,
    * C the tail. The inventory-management classic, and in a data
    * pipeline the "which keys deserve a cache/special-casing" report.
    *
    * All-integer contract: revenue travels as CENTS (BIGINT, exact from
    * the DECIMAL source), class thresholds are integer
    * cross-multiplications (100·cum < 80·total), shares are integer
    * basis points.
    *
    * Distributed shape — the two-level prefix again, not one global
    * sort: per-customer revenues cumulate within fixed-width revenue
    * BUCKETS (bucket-keyed exchange, descending), bucket totals
    * cumulate across the ≤(max_rev/width) bucket frame, and each row's
    * global cumulative-before is carry + local prefix. Same skeleton as
    * [[TimeSeries.concurrencyQ]] over value space instead of time. */
  def abcQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val rev = t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    val bucketed = rev.withColumn("bkt", expr("cents div 1000000"))
    val inBkt = Window.partitionBy($"bkt")
      .orderBy($"cents".desc, $"o_custkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed
      .withColumn("before_local", coalesce(sum($"cents").over(inBkt), lit(0L)))
    val perBkt = bucketed.groupBy($"bkt").agg(sum($"cents").as("bkt_total"))
    val acrossBkt = Window.orderBy($"bkt".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perBkt
      .withColumn("carry", coalesce(sum($"bkt_total").over(acrossBkt), lit(0L)))
      .select($"bkt", $"carry")
    val total = rev.agg(sum($"cents").as("total"))
    local.join(carry, Seq("bkt"))
      .crossJoin(broadcast(total))
      .withColumn("cum_before", $"carry" + $"before_local")
      .withColumn("cls",
        when($"cum_before" * 100 < $"total" * 80, "A")
          .when($"cum_before" * 100 < $"total" * 95, "B")
          .otherwise("C"))
      .groupBy($"cls")
      .agg(count(lit(1)).as("n_customers"),
        sum($"cents").as("revenue_cents"))
      .crossJoin(broadcast(total))
      .select($"cls", $"n_customers", $"revenue_cents",
        expr("(10000 * revenue_cents) div total").as("revenue_share_bp"))
      .orderBy($"cls")
  }

  val abcSql: String =
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY o_custkey),
      |b AS (SELECT o_custkey, cents, cents // 1000000 AS bkt FROM rev),
      |loc AS (
      |  SELECT o_custkey, cents, bkt,
      |    CAST(COALESCE(SUM(cents) OVER (PARTITION BY bkt
      |      ORDER BY cents DESC, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS before_local
      |  FROM b),
      |pb AS (SELECT bkt, CAST(SUM(cents) AS BIGINT) AS bkt_total
      |       FROM b GROUP BY bkt),
      |cr AS (
      |  SELECT bkt,
      |    CAST(COALESCE(SUM(bkt_total) OVER (ORDER BY bkt DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS carry
      |  FROM pb),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev),
      |cls AS (
      |  SELECT l.cents,
      |    CASE WHEN (l.before_local + c.carry) * 100 < t.total * 80 THEN 'A'
      |         WHEN (l.before_local + c.carry) * 100 < t.total * 95 THEN 'B'
      |         ELSE 'C' END AS cls,
      |    t.total
      |  FROM loc l JOIN cr c ON l.bkt = c.bkt, t)
      |SELECT cls, COUNT(*) AS n_customers,
      |  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
      |  CAST((10000 * SUM(cents)) // MAX(total) AS BIGINT)
      |    AS revenue_share_bp
      |FROM cls GROUP BY cls ORDER BY cls""".stripMargin

  /** q_agg_moments entry: per-group HIGHER-MOMENT profile — skewness
    * and excess kurtosis of `l_quantity` by return flag, from ONE pass
    * of raw power sums (S₁..S₄). This is the mergeable-moments sketch:
    * per-partition power sums add associatively, so the 100 TB shape is
    * a single map-side-combinable aggregate carrying four numbers per
    * group — the standard one-pass alternative to a two-pass central-
    * moment computation, and the shape-profile input (is this column
    * heavy-tailed? lopsided?) that mean/stddev profiling misses.
    *
    * Determinism contract: quantities quantize to integer CENTS
    * (exact for the fixture's 2-dp values), power sums accumulate as
    * DECIMAL(38,0) — EXACT under any partitioning (q⁴ ≤ 6.25e14 per
    * row, so per-row powers stay in BIGINT). Central moments come from
    * the raw-moment expansion in one IEEE tree with identical formula
    * text on both engines; skew/kurtosis are scale-invariant so the
    * ×100 quantization cancels; mean/stddev divide it back out. */
  def momentsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = t(s, dir, "lineitem")
      .select($"l_returnflag",
        round($"l_quantity" * 100).cast("long").as("qi"))
    val g = q.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"qi".cast("decimal(38,0)")).as("s1"),
        sum(($"qi" * $"qi").cast("decimal(38,0)")).as("s2"),
        sum(($"qi" * $"qi" * $"qi").cast("decimal(38,0)")).as("s3"),
        sum(($"qi" * $"qi" * $"qi" * $"qi").cast("decimal(38,0)")).as("s4"))
    val m1 = $"s1".cast("double") / $"n"
    val m2 = $"s2".cast("double") / $"n" - m1 * m1
    val m3 = $"s3".cast("double") / $"n" -
      lit(3d) * m1 * ($"s2".cast("double") / $"n") + lit(2d) * m1 * m1 * m1
    val m4 = $"s4".cast("double") / $"n" -
      lit(4d) * m1 * ($"s3".cast("double") / $"n") +
      lit(6d) * m1 * m1 * ($"s2".cast("double") / $"n") -
      lit(3d) * m1 * m1 * m1 * m1
    g.select($"l_returnflag", $"n",
        round(m1 / 100d, 6).as("mean"),
        round(sqrt(m2) / 100d, 6).as("stddev"),
        round(m3 / pow(m2, 1.5d), 6).as("skewness"),
        round(m4 / (m2 * m2) - 3d, 6).as("kurtosis_excess"))
      .orderBy($"l_returnflag")
  }

  val momentsSql: String =
    """WITH q AS (
      |  SELECT l_returnflag,
      |    CAST(ROUND(l_quantity * 100) AS BIGINT) AS qi
      |  FROM lineitem),
      |g AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(qi) AS DECIMAL(38,0)) AS s1,
      |    CAST(SUM(qi * qi) AS DECIMAL(38,0)) AS s2,
      |    CAST(SUM(qi * qi * qi) AS DECIMAL(38,0)) AS s3,
      |    CAST(SUM(qi * qi * qi * qi) AS DECIMAL(38,0)) AS s4
      |  FROM q GROUP BY l_returnflag),
      |m AS (
      |  SELECT l_returnflag, n,
      |    CAST(s1 AS DOUBLE) / n AS m1,
      |    CAST(s2 AS DOUBLE) / n AS r2,
      |    CAST(s3 AS DOUBLE) / n AS r3,
      |    CAST(s4 AS DOUBLE) / n AS r4
      |  FROM g),
      |c AS (
      |  SELECT l_returnflag, n, m1,
      |    r2 - m1 * m1 AS m2,
      |    r3 - 3.0::DOUBLE * m1 * r2 + 2.0::DOUBLE * m1 * m1 * m1 AS m3,
      |    r4 - 4.0::DOUBLE * m1 * r3 + 6.0::DOUBLE * m1 * m1 * r2
      |      - 3.0::DOUBLE * m1 * m1 * m1 * m1 AS m4
      |  FROM m)
      |SELECT l_returnflag, n,
      |  ROUND(m1 / 100, 6) AS mean,
      |  ROUND(SQRT(m2) / 100, 6) AS stddev,
      |  ROUND(m3 / POWER(m2, 1.5::DOUBLE), 6) AS skewness,
      |  ROUND(m4 / (m2 * m2) - 3.0::DOUBLE, 6) AS kurtosis_excess
      |FROM c ORDER BY l_returnflag""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_moments" -> momentsQ,
    "q_agg_percentile_disc" -> percentileDiscQ,
    "q_agg_weighted_median" -> weightedMedianQ,
    "q_agg_trimmed_mean" -> trimmedMeanQ,
    "q_agg_mode" -> modeQ,
    "q_profile_abc" -> abcQ,
    "q_profile_corr" -> corrQ,
    "q_profile_theil" -> theilQ,
    "q_profile_gini" -> giniQ,
    "q_profile_histogram" -> histogramQ,
    "q_profile_zscore" -> zscoreQ,
    "q_profile_checksum" -> checksumQ,
    "q_profile_bins" -> binsQ,
    "q_profile_overview" -> overviewQ,
    "q_profile_mad" -> madQ)

  def oracle: Map[String, String] = Map(
    "q_agg_moments" -> momentsSql,
    "q_agg_percentile_disc" -> percentileDiscSql,
    "q_agg_weighted_median" -> weightedMedianSql,
    "q_agg_trimmed_mean" -> trimmedMeanSql,
    "q_agg_mode" -> modeSql,
    "q_profile_abc" -> abcSql,
    "q_profile_corr" -> corrSql,
    "q_profile_theil" -> theilSql,
    "q_profile_gini" -> giniSql,
    "q_profile_histogram" -> histogramSql,
    "q_profile_zscore" -> zscoreSql,
    "q_profile_checksum" -> checksumSql,
    "q_profile_bins" -> binsSql,
    "q_profile_overview" -> overviewSql,
    "q_profile_mad" -> madSql)
}
