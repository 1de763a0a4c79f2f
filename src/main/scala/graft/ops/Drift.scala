package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Distribution-drift monitoring over `events` — the pipeline-health op
  * a large-scale ingestion system runs continuously: has the category
  * mix of what we're ingesting shifted vs a reference window?
  *
  * Metric: per-category PSI terms (population stability index),
  * (p − q) · ln(p / q) for the reference (first half of the month) vs
  * current (second half) share of each event type; Σ terms ≥ 0.2 is the
  * classic "investigate" threshold. KL divergence is the same plan with
  * p · ln(p / q) — PSI is preferred operationally because it is
  * symmetric-ish and finite when categories shrink.
  *
  * Scale shape: one map-side-combinable groupBy(event_type) with two
  * conditional counts (the window split is a projection, not a
  * self-join), then a broadcast 1-row cross join for the totals —
  * O(|categories|) rows after the first aggregate, no second pass over
  * the data, no driver-side collect. At 100 TB this is a single
  * scan-speed aggregation.
  *
  * Determinism: counts are exact integers; shares and the ln() run the
  * same IEEE double ops in the same order on both engines.
  */
object Drift {

  def psi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        sum(when($"ts" < lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L))
          .as("n_ref"),
        sum(when($"ts" >= lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L))
          .as("n_cur"))
    val totals = counts.agg(
      sum($"n_ref").as("tot_ref"), sum($"n_cur").as("tot_cur"))
    val p = $"n_ref".cast("double") / $"tot_ref".cast("double")
    val q = $"n_cur".cast("double") / $"tot_cur".cast("double")
    counts.crossJoin(broadcast(totals))
      .select($"event_type", $"n_ref", $"n_cur",
        round(p, 6).as("share_ref"),
        round(q, 6).as("share_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy($"event_type")
  }

  val psiSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM events GROUP BY event_type),
      |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
      |             CAST(SUM(n_cur) AS BIGINT) AS tot_cur FROM c)
      |SELECT event_type, n_ref, n_cur,
      |  ROUND(CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE), 6) AS share_ref,
      |  ROUND(CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE), 6) AS share_cur,
      |  ROUND((CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE)
      |         - CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE))
      |        * ln((CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE))
      |              / (CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE))), 6) AS psi_term
      |FROM c, t ORDER BY event_type""".stripMargin

  /** q_drift_ks entry: two-sample Kolmogorov–Smirnov statistic between
    * the document-length distributions of two sources — the CONTINUOUS
    * companion to [[psi]]'s categorical test (PSI needs binning choices;
    * KS is binning-free, D = max |F₁(x) − F₂(x)| over the pooled
    * support). The pre-mixing check that a new crawl's length profile
    * matches the corpus it's joining.
    *
    * Scale shape: the corpus collapses to per-distinct-value pair
    * counts FIRST (combinable groupBy, ≤ |distinct lengths| rows —
    * value-bounded, not corpus-bounded); the ECDF is one cumulative
    * window over that reduced table ordered by value. Cumulative counts
    * are exact integers, so each ECDF point is one integer/integer IEEE
    * division — both engines take the max over identical doubles. */
  def ksQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val d = t(s, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .groupBy($"n_chars".as("v"))
      .agg(
        sum(when($"source" === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c2"))
    val totals = d.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    // the frame is length-DOMAIN bounded (one row per distinct doc
    // char count — ≤ ~10⁵ at any corpus size); the Rank bounds job
    // measures that exactly and sizes its own buckets (r15)
    Rank.orderedPrefix(d, order = Seq($"v"),
        cums = Seq(Rank.Cum($"c1", "cum1"), Rank.Cum($"c2", "cum2")))
      .crossJoin(broadcast(totals))
      .select(($"cum1".cast("double") / $"n1" -
        $"cum2".cast("double") / $"n2").as("diff"), $"n1", $"n2")
      .groupBy($"n1", $"n2")
      .agg(round(max(abs($"diff")), 6).as("ks_stat"))
      .select($"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
        $"ks_stat")
  }

  val ksSql: String =
    """WITH d AS (
      |  SELECT n_chars AS v,
      |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
      |e AS (
      |  SELECT
      |    SUM(c1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |    SUM(c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
      |  FROM d),
      |t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM d)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  ROUND(MAX(ABS(CAST(cum1 AS DOUBLE) / n1
      |    - CAST(cum2 AS DOUBLE) / n2)), 6) AS ks_stat
      |FROM e, t GROUP BY 1, 2""".stripMargin

  /** q_drift_wasserstein entry: 1-Wasserstein (earth-mover) distance
    * between the same two length distributions [[ksQ]] compares — the
    * MAGNITUDE companion to KS's max-gap statistic (KS says "the CDFs
    * separate"; W₁ = ∫|F₁−F₂| says "by this much total mass·distance",
    * which is what a mixing-policy threshold actually wants).
    *
    * For discrete samples, W₁ = Σᵢ |F₁(vᵢ)−F₂(vᵢ)|·(vᵢ₊₁−vᵢ) over the
    * sorted pooled support. Scale shape identical to [[ksQ]]: collapse
    * to per-distinct-value pair counts first (value-bounded), one
    * cumulative window + a `lead` for the gap. Determinism: each term
    * is rounded to 9 dp and summed as DECIMAL(28,9) (order-independent
    * exact merges — a raw double Σ would be partition-order-dependent),
    * then the total rounds to 6 dp. */
  def wassersteinQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val d = t(s, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .groupBy($"n_chars".as("v"))
      .agg(
        sum(when($"source" === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c2"))
    val totals = d.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    // lead(v) without a global window: the Rank pass's global k-lead
    // (r15) — in-bucket window lead + broadcast bucket-head patch —
    // replaces the r13–r14 rn+1 equi self-join, which shuffled every
    // support point a second time keyed by the dense rank
    Rank.orderedPrefix(d, order = Seq($"v"),
      cums = Seq(Rank.Cum($"c1", "cum1"), Rank.Cum($"c2", "cum2")),
      leads = Seq(Rank.Lead($"v", "v_next")))
      .withColumn("gap", ($"v_next" - $"v").cast("double"))
      .crossJoin(broadcast(totals))
      .select($"n1", $"n2",
        when($"gap".isNull, lit(0d)) // last support point: no interval
          .otherwise(round(abs($"cum1".cast("double") / $"n1" -
            $"cum2".cast("double") / $"n2") * $"gap", 9))
          .cast("decimal(28,9)").as("term"))
      .groupBy($"n1", $"n2")
      .agg(round(sum($"term").cast("double"), 6).as("w1_dist"))
      .select($"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
        $"w1_dist")
  }

  val wassersteinSql: String =
    """WITH d AS (
      |  SELECT n_chars AS v,
      |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
      |e AS (
      |  SELECT v,
      |    SUM(c1) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |    SUM(c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
      |    LEAD(v) OVER (ORDER BY v) - v AS gap
      |  FROM d),
      |t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM d)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  ROUND(CAST(SUM(CASE WHEN gap IS NULL THEN CAST(0 AS DECIMAL(28,9))
      |    ELSE CAST(ROUND(ABS(CAST(cum1 AS DOUBLE) / n1
      |      - CAST(cum2 AS DOUBLE) / n2) * CAST(gap AS DOUBLE), 9)
      |      AS DECIMAL(28,9)) END) AS DOUBLE), 6) AS w1_dist
      |FROM e, t GROUP BY n1, n2""".stripMargin

  /** q_drift_jsd entry: per-category Jensen–Shannon divergence and
    * squared-Hellinger terms between the same reference/current category
    * mixes [[psi]] compares — the BOUNDED companions to PSI. PSI blows
    * up (ln p/q → ∞) when a category collapses toward zero on one side,
    * so alerting thresholds on it are scale-dependent; JSD is bounded by
    * ln 2 and Hellinger² by 1, which makes a single global threshold
    * meaningful across feeds of any cardinality. Terms: with m=(p+q)/2,
    * jsd = ½·p·ln(p/m) + ½·q·ln(q/m); hell = ½·(√p − √q)².
    *
    * Scale shape identical to [[psi]]: one combinable groupBy over the
    * category column, a broadcast 1-row totals frame, O(|categories|)
    * output — a scan-speed single pass at any corpus size. Determinism:
    * integer counts → the same IEEE double ln/sqrt on both engines. */
  def jsdQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        sum(when($"ts" < lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L))
          .as("n_ref"),
        sum(when($"ts" >= lit("2024-01-16").cast("timestamp"), 1L).otherwise(0L))
          .as("n_cur"))
    val totals = counts.agg(
      sum($"n_ref").as("tot_ref"), sum($"n_cur").as("tot_cur"))
    val p = $"n_ref".cast("double") / $"tot_ref".cast("double")
    val q = $"n_cur".cast("double") / $"tot_cur".cast("double")
    val m = (p + q) / lit(2d)
    counts.crossJoin(broadcast(totals))
      .select($"event_type", $"n_ref", $"n_cur",
        round(p * log(p / m) / lit(2d) + q * log(q / m) / lit(2d), 6)
          .as("jsd_term"),
        round((sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)) / lit(2d), 6)
          .as("hell_term"))
      .orderBy($"event_type")
  }

  val jsdSql: String =
    """WITH c AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM events GROUP BY event_type),
      |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
      |             CAST(SUM(n_cur) AS BIGINT) AS tot_cur FROM c),
      |s AS (
      |  SELECT event_type, n_ref, n_cur,
      |    CAST(n_ref AS DOUBLE) / CAST(tot_ref AS DOUBLE) AS p,
      |    CAST(n_cur AS DOUBLE) / CAST(tot_cur AS DOUBLE) AS q
      |  FROM c, t)
      |SELECT event_type, n_ref, n_cur,
      |  ROUND(p * ln(p / ((p + q) / 2)) / 2
      |      + q * ln(q / ((p + q) / 2)) / 2, 6) AS jsd_term,
      |  ROUND((sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)) / 2, 6) AS hell_term
      |FROM s ORDER BY event_type""".stripMargin

  /** q_drift_hellinger entry: HELLINGER DISTANCE + TOTAL VARIATION
    * between the two sources' length distributions over 20 fixed-width
    * bins — the BOUNDED-metric companions to [[psi]] (unbounded, blows
    * up on empty bins) and [[jsdQ]]: TV = ½Σ|p−q| is the "fraction of
    * mass that must move" number mixing policies threshold on, and
    * Hellinger H = √(1 − Σ√(pq)) is the metric with the tensorization
    * property multi-feature drift monitors compose under. Binning is
    * data-independent (bin = min(n_chars div 50, 19)) so the histogram
    * is one combinable aggregate at any scale.
    *
    * Determinism: bin counts exact integers; per-bin terms are shared
    * IEEE chains rounded to 12 dp and summed as DECIMAL(28,12)
    * (order-independent); the Bhattacharyya sum clamps at 1 before the
    * final √ (12-dp rounding could nudge it over; documented, same
    * clamp both engines). */
  def hellingerQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .groupBy(expr("least(n_chars div 50, 19)").as("bin"))
      .agg(sum(when($"source" === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c2"))
    val tot = d.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    d.crossJoin(broadcast(tot))
      .select($"n1", $"n2",
        ($"c1".cast("double") / $"n1").as("p"),
        ($"c2".cast("double") / $"n2").as("q"))
      .groupBy($"n1", $"n2")
      .agg(
        sum(round(abs($"p" - $"q"), 12).cast("decimal(28,12)")).as("l1"),
        sum(round(sqrt($"p" * $"q"), 12).cast("decimal(28,12)")).as("bc"))
      .select($"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
        round($"l1".cast("double") / 2, 6).as("tvd"),
        round(sqrt(greatest(lit(0.0),
          lit(1.0) - $"bc".cast("double"))), 6).as("hellinger"))
  }

  val hellingerSql: String =
    """WITH d AS (
      |  SELECT least(n_chars // 50, 19) AS bin,
      |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
      |t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM d),
      |pq AS (
      |  SELECT n1, n2,
      |    CAST(c1 AS DOUBLE) / n1 AS p, CAST(c2 AS DOUBLE) / n2 AS q
      |  FROM d, t),
      |a AS (
      |  SELECT n1, n2,
      |    SUM(CAST(ROUND(ABS(p - q), 12) AS DECIMAL(28,12))) AS l1,
      |    SUM(CAST(ROUND(SQRT(p * q), 12) AS DECIMAL(28,12))) AS bc
      |  FROM pq GROUP BY 1, 2)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  ROUND(CAST(l1 AS DOUBLE) / 2, 6) AS tvd,
      |  ROUND(SQRT(GREATEST(0.0, 1.0 - CAST(bc AS DOUBLE))), 6)
      |    AS hellinger
      |FROM a""".stripMargin

  /** q_drift_vocab_jsd entry: LEXICAL Jensen–Shannon divergence between
    * two sources' TOKEN distributions — the content-drift check the
    * length-based metrics ([[ksQ]]/[[wassersteinQ]]/[[hellingerQ]])
    * cannot see: a crawl slice can keep its length profile while its
    * vocabulary shifts entirely. JSD = ½KL(p‖m) + ½KL(q‖m) over the
    * union vocabulary, 0·log0 = 0 by the standard convention (token
    * absent from one side contributes only the other side's term) —
    * bounded in [0, ln 2], symmetric, finite on disjoint support
    * (where KL blows up).
    *
    * Scale shape: the corpus collapses to the Heaps-bounded
    * (token, source) count frame; totals ride a 1-row broadcast;
    * per-token terms are shared IEEE chains rounded to 12 dp and
    * summed as DECIMAL(28,12) (order-independent). */
  def vocabJsdQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .groupBy($"tok")
      .agg(sum(when($"source" === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c2"))
    val tot = counts.agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
      count(lit(1)).as("v"))
    val p = $"c1".cast("double") / $"n1"
    val q = $"c2".cast("double") / $"n2"
    val m = (p + q) / lit(2d)
    val term =
      when($"c1" > 0, p * log(p / m) / lit(2d)).otherwise(lit(0d)) +
      when($"c2" > 0, q * log(q / m) / lit(2d)).otherwise(lit(0d))
    counts.crossJoin(broadcast(tot))
      .select($"n1", $"n2", $"v",
        round(term, 12).cast("decimal(28,12)").as("t"))
      .groupBy($"n1", $"n2", $"v")
      .agg(sum($"t").cast("double").as("jsd"))
      .select($"v".cast("long").as("n_types"),
        $"n1".cast("long").as("n_tok_src0"),
        $"n2".cast("long").as("n_tok_src1"),
        round($"jsd", 6).as("jsd"),
        round(sqrt(greatest(lit(0d), $"jsd")), 6).as("js_distance"))
  }

  val vocabJsdSql: String =
    """WITH c AS (
      |  SELECT t AS tok,
      |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
      |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS t
      |        FROM documents WHERE source IN ('src0', 'src1'))
      |  GROUP BY 1),
      |tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2, COUNT(*) AS v FROM c),
      |terms AS (
      |  SELECT n1, n2, v,
      |    CAST(ROUND(
      |      (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / n1)
      |        * LN((CAST(c1 AS DOUBLE) / n1)
      |          / ((CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2) / 2))
      |        / 2 ELSE 0 END)
      |      + (CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / n2)
      |        * LN((CAST(c2 AS DOUBLE) / n2)
      |          / ((CAST(c1 AS DOUBLE) / n1 + CAST(c2 AS DOUBLE) / n2) / 2))
      |        / 2 ELSE 0 END), 12) AS DECIMAL(28,12)) AS t
      |  FROM c, tot),
      |a AS (
      |  SELECT n1, n2, v, CAST(SUM(t) AS DOUBLE) AS jsd
      |  FROM terms GROUP BY 1, 2, 3)
      |SELECT CAST(v AS BIGINT) AS n_types,
      |  CAST(n1 AS BIGINT) AS n_tok_src0, CAST(n2 AS BIGINT) AS n_tok_src1,
      |  ROUND(jsd, 6) AS jsd,
      |  ROUND(SQRT(GREATEST(0.0, jsd)), 6) AS js_distance
      |FROM a""".stripMargin

  /** q_drift_energy entry: ENERGY DISTANCE two-sample test (Székely &
    * Rizzo 2004) between the src0/src1 document-length distributions —
    * D² = 2·E|X−Y| − E|X−X′| − E|Y−Y′| with the test statistic
    * T = (n₁n₂/(n₁+n₂))·D². Completes the drift ladder's geometry: KS
    * reads the single worst ECDF gap, 1-Wasserstein the area between
    * ECDFs, energy distance the full pairwise-separation functional —
    * zero iff the distributions are identical, sensitive to shape
    * differences in ANY moment, and the basis of modern e-statistics
    * drift detectors.
    *
    * All three pairwise expectations reduce EXACTLY over the
    * value-collapsed frame via strict-prefix sums: for values in
    * ascending order, Σ_{x,y}|x−y| = Σ_v c₁(v)·(v·C₂<(v) − S₂<(v)) +
    * c₂(v)·(v·C₁<(v) − S₁<(v)) where C<,S< are the other group's
    * strictly-before count/sum (equal values contribute zero, so ties
    * need no treatment) — the within-group sums are the same formula
    * against the group itself, doubled for ordered pairs. ONE
    * [[Rank.orderedPrefix]] pass delivers all four exclusive running
    * sums plus both totals (no SinglePartition window; the frame is
    * length-domain bounded as in [[ksQ]], and the Rank bounds job
    * sizes its buckets to that measured count).
    *
    * Numerics: counts/values exact; v·C and the per-row terms multiply
    * in DECIMAL (v·C reaches value·rows — the q_stat_ad int64 class),
    * pair sums accumulate DECIMAL(38,0) (≤ n²·range ≈ 10³⁰ at the
    * design point), and the three expectations convert once to double
    * in an expression both engines mirror token-for-token, rounded 6.
    */
  def energyQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val d = t(s, dir, "documents")
      .filter($"source".isin("src0", "src1"))
      .groupBy($"n_chars".as("v"))
      .agg(
        sum(when($"source" === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when($"source" === "src1", 1L).otherwise(0L)).as("c2"))
    val ranked = Rank.orderedPrefix(d, order = Seq($"v"),
      cums = Seq(
        Rank.Cum($"c1", "pc1", exclusive = true),
        Rank.Cum($"c2", "pc2", exclusive = true),
        Rank.Cum(dec($"v") * $"c1", "ps1", exclusive = true),
        Rank.Cum(dec($"v") * $"c2", "ps2", exclusive = true)),
      totals = Seq(($"c1", "n1"), ($"c2", "n2")))
    val agg = ranked.groupBy($"n1", $"n2")
      .agg(
        sum(dec($"c1") * (dec($"v") * $"pc2" - $"ps2") +
          dec($"c2") * (dec($"v") * $"pc1" - $"ps1")).as("sx"),
        sum(dec($"c1") * (dec($"v") * $"pc1" - $"ps1")).as("sw1"),
        sum(dec($"c2") * (dec($"v") * $"pc2" - $"ps2")).as("sw2"))
    val eDist = lit(2.0) * $"sx".cast("double") /
        ($"n1".cast("double") * $"n2") -
      lit(2.0) * $"sw1".cast("double") /
        ($"n1".cast("double") * $"n1") -
      lit(2.0) * $"sw2".cast("double") /
        ($"n2".cast("double") * $"n2")
    agg.select($"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
      round($"sx".cast("double") /
        ($"n1".cast("double") * $"n2"), 6).as("mean_cross"),
      round(eDist, 6).as("e_dist"),
      round($"n1".cast("double") * $"n2" / ($"n1" + $"n2") * eDist, 6)
        .as("e_stat"))
  }

  val energySql: String =
    """WITH d AS (
      |  SELECT n_chars AS v,
      |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
      |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
      |e AS (
      |  SELECT v, c1, c2,
      |    COALESCE(SUM(c1) OVER w, 0) AS pc1,
      |    COALESCE(SUM(c2) OVER w, 0) AS pc2,
      |    COALESCE(SUM(CAST(v AS HUGEINT) * c1) OVER w, 0) AS ps1,
      |    COALESCE(SUM(CAST(v AS HUGEINT) * c2) OVER w, 0) AS ps2
      |  FROM d
      |  WINDOW w AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |a AS (
      |  SELECT
      |    SUM(CAST(c1 AS HUGEINT) * (CAST(v AS HUGEINT) * pc2 - ps2)
      |      + CAST(c2 AS HUGEINT) * (CAST(v AS HUGEINT) * pc1 - ps1))
      |      AS sx,
      |    SUM(CAST(c1 AS HUGEINT) * (CAST(v AS HUGEINT) * pc1 - ps1))
      |      AS sw1,
      |    SUM(CAST(c2 AS HUGEINT) * (CAST(v AS HUGEINT) * pc2 - ps2))
      |      AS sw2
      |  FROM e),
      |n AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM d)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  ROUND(CAST(sx AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * n2), 6) AS mean_cross,
      |  ROUND(2.0 * CAST(sx AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
      |    - 2.0 * CAST(sw1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1)
      |    - 2.0 * CAST(sw2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2), 6)
      |    AS e_dist,
      |  ROUND(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
      |    * (2.0 * CAST(sx AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
      |      - 2.0 * CAST(sw1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1)
      |      - 2.0 * CAST(sw2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2)), 6)
      |    AS e_stat
      |FROM a, n""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_drift_psi" -> psi,
    "q_drift_ks" -> ksQ,
    "q_drift_energy" -> energyQ,
    "q_drift_wasserstein" -> wassersteinQ,
    "q_drift_hellinger" -> hellingerQ,
    "q_drift_vocab_jsd" -> vocabJsdQ,
    "q_drift_jsd" -> jsdQ)

  def oracle: Map[String, String] = Map(
    "q_drift_psi" -> psiSql,
    "q_drift_ks" -> ksSql,
    "q_drift_energy" -> energySql,
    "q_drift_wasserstein" -> wassersteinSql,
    "q_drift_hellinger" -> hellingerSql,
    "q_drift_vocab_jsd" -> vocabJsdSql,
    "q_drift_jsd" -> jsdSql)
}
