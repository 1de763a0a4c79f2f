package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed linear document classifier — the fastText-style shape of
  * every production quality/language/topic filter: tokens hash into a
  * FIXED-width feature space (the hashing trick — no vocabulary file to
  * distribute, no OOV path), buckets look up a weight in a model table
  * small enough to broadcast, and a document's score is the mean bucket
  * weight. Applying a trained classifier to 100 TB is then scan-speed:
  * explode → broadcast-join the KB-sized weight table → one
  * map-side-combinable per-doc aggregate. No shuffle is keyed by
  * anything wider than doc_id, and swapping in a retrained model is a
  * new weight table, not new code.
  *
  * Determinism contract: bucket = [[Hashing.md5Long60]] % 1024 (the
  * repo's pinned cross-engine hash); weights are INTEGER millis derived
  * arithmetically from the bucket id (w = ((b·2654435761) mod 2001) −
  * 1000 ∈ [−1000, 1000] — a Knuth-multiplicative pseudo-model standing
  * in for trained parameters, since a real training run isn't
  * cross-engine-reproducible), so the per-doc sum is EXACT integer
  * arithmetic under any partitioning; the only double appears in the
  * final mean, rounded to 6 dp on both engines. */
object Classify {

  /** The 1024-row pseudo-model: (bucket, w) with w in integer millis. */
  private def weights(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(0, 1024).select($"id".as("bucket"),
      (($"id" * 2654435761L) % 2001L - 1000L).as("w"))
  }

  /** q_text_classify entry: score every document under the broadcast
    * hashed-linear model; label = sign of the summed weight. */
  def classifyQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") >= 1)
      .withColumn("bucket", Hashing.md5Long60($"tok") % 1024)
    toks.join(broadcast(weights(s)), "bucket")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"), sum($"w").as("sum_w"))
      .select($"doc_id", $"n_toks", $"sum_w",
        round($"sum_w".cast("double") / ($"n_toks" * 1000d), 6).as("score"),
        ($"sum_w" > 0).cast("int").as("label"))
      .orderBy($"doc_id")
      .limit(300)
  }

  /** DuckDB twin: same hash, same pseudo-model, same integer sums. */
  val classifySql: String =
    """WITH w AS (
      |  SELECT range AS bucket, (range * 2654435761) % 2001 - 1000 AS w
      |  FROM range(0, 1024)),
      |tk AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(t), 1, 15))::UBIGINT::BIGINT % 1024 AS bucket
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      |        FROM documents)
      |  WHERE length(t) >= 1),
      |sc AS (
      |  SELECT doc_id, COUNT(*) AS n_toks, CAST(SUM(w.w) AS BIGINT) AS sum_w
      |  FROM tk JOIN w USING (bucket) GROUP BY doc_id)
      |SELECT doc_id, n_toks, sum_w,
      |  ROUND(CAST(sum_w AS DOUBLE) / (n_toks * 1000), 6) AS score,
      |  CAST(sum_w > 0 AS INTEGER) AS label
      |FROM sc ORDER BY doc_id LIMIT 300""".stripMargin

  /** (doc_id, score, y) for the full corpus: classifier score + the
    * ground-truth label y = [lang = 'en'] the eval ops grade against. */
  private[ops] def scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") >= 1)
      .withColumn("bucket", Hashing.md5Long60($"tok") % 1024)
    toks.join(broadcast(weights(s)), "bucket")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"), sum($"w").as("sum_w"))
      .select($"doc_id",
        round($"sum_w".cast("double") / ($"n_toks" * 1000d), 6).as("score"))
      .join(t(s, dir, "documents").select($"doc_id",
        ($"lang" === "en").cast("long").as("y")), "doc_id")
  }

  /** Shared oracle CTE producing the same (doc_id, score, y). */
  private[ops] val scoredSql: String =
    """w AS (
      |  SELECT range AS bucket, (range * 2654435761) % 2001 - 1000 AS w
      |  FROM range(0, 1024)),
      |tk AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(t), 1, 15))::UBIGINT::BIGINT % 1024 AS bucket
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      |        FROM documents)
      |  WHERE length(t) >= 1),
      |sc AS (
      |  SELECT tk.doc_id,
      |    ROUND(CAST(CAST(SUM(w.w) AS BIGINT) AS DOUBLE)
      |      / (COUNT(*) * 1000), 6) AS score
      |  FROM tk JOIN w USING (bucket) GROUP BY tk.doc_id),
      |scored AS (
      |  SELECT sc.doc_id, sc.score,
      |    CAST(d.lang = 'en' AS BIGINT) AS y
      |  FROM sc JOIN documents d ON d.doc_id = sc.doc_id)""".stripMargin

  /** q_eval_auc entry: ROC AUC of the classifier score against the
    * lang = 'en' ground truth via the rank statistic
    * AUC = (R₁ − n₁(n₁+1)/2)/(n₁·n₀) — the Mann–Whitney identity, so
    * the whole computation is the suite's exact tie-averaged-rank
    * machinery: collapse to distinct score values with per-class
    * counts (value-bounded, 6-dp score grid), one cumulative window
    * for average ranks in exact DECIMAL, no per-pair work (the naive
    * AUC is an n₁·n₀ pair scan — quadratic and unusable at corpus
    * scale). Gini = 2·AUC − 1 rides along.
    *
    * This is the eval gate every trained filter ships through before
    * running at 100 TB; a threshold-free ranking metric, unlike the
    * confusion-matrix rows. */
  def aucQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = scored(s, dir)
      .groupBy($"score".as("v"))
      .agg(sum($"y").as("c1"), sum(lit(1L) - $"y").as("c2"))
    Rank.orderedPrefix(d, order = Seq($"v"),
        cums = Seq(Rank.Cum($"c1" + $"c2", "before", exclusive = true)))
      .withColumn("avg_rank",
        ($"before".cast("decimal(18,1)") +
          ($"c1" + $"c2" + 1).cast("decimal(18,1)") / 2).cast("decimal(18,1)"))
      .agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
        sum(($"c1".cast("decimal(18,1)") * $"avg_rank").cast("decimal(28,1)"))
          .as("r1"))
      .select($"n1".cast("long").as("n_pos"), $"n2".cast("long").as("n_neg"),
        round(($"r1".cast("double") -
          $"n1".cast("double") * ($"n1" + 1) / 2) /
          ($"n1".cast("double") * $"n2"), 6).as("auc"),
        round((($"r1".cast("double") -
          $"n1".cast("double") * ($"n1" + 1) / 2) /
          ($"n1".cast("double") * $"n2")) * 2 - 1, 6).as("gini"))
  }

  val aucSql: String =
    s"""WITH $scoredSql,
      |d AS (
      |  SELECT score AS v,
      |    CAST(SUM(y) AS BIGINT) AS c1,
      |    CAST(SUM(1 - y) AS BIGINT) AS c2
      |  FROM scored GROUP BY 1),
      |rk AS (
      |  SELECT c1, c2,
      |    CAST(COALESCE(SUM(c1 + c2) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS DECIMAL(18,1))
      |      + CAST(c1 + c2 + 1 AS DECIMAL(18,1)) / 2 AS avg_rank
      |  FROM d),
      |a AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
      |    SUM(CAST(CAST(c1 AS DECIMAL(18,1)) * CAST(avg_rank AS DECIMAL(18,1))
      |      AS DECIMAL(28,1))) AS r1
      |  FROM rk)
      |SELECT n1 AS n_pos, n2 AS n_neg,
      |  ROUND((CAST(r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
      |    / (CAST(n1 AS DOUBLE) * n2), 6) AS auc,
      |  ROUND(((CAST(r1 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
      |    / (CAST(n1 AS DOUBLE) * n2)) * 2 - 1, 6) AS gini
      |FROM a""".stripMargin

  /** q_eval_calibration entry: RELIABILITY DIAGRAM of the classifier —
    * scores map to pseudo-probabilities p = (score+1)/2, bin into 10
    * equal-width bins, and each bin reports its size, mean predicted
    * p, observed positive rate, and the (observed − predicted) gap:
    * the table behind an ECE readout and the "is this filter's score a
    * probability or just a ranking?" audit that decides whether
    * thresholding at 0.9 means anything.
    *
    * Scale shape: one combinable groupBy(bin) — p and bin are
    * projections. Determinism: per-row p rounds to 9 dp and sums as
    * DECIMAL(28,9); counts exact; final ratios one IEEE tree. */
  def calibrationQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scored(s, dir)
      .withColumn("p", ($"score" + 1d) / 2d)
      .withColumn("bin", least(floor($"p" * 10), lit(9L)).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"),
        sum(round($"p", 9).cast("decimal(28,9)")).as("sp"))
      .select($"bin", $"n", $"n_pos",
        round($"sp".cast("double") / $"n", 6).as("mean_p"),
        round($"n_pos".cast("double") / $"n", 6).as("frac_pos"),
        round($"n_pos".cast("double") / $"n" -
          $"sp".cast("double") / $"n", 6).as("gap"))
      .orderBy($"bin")
  }

  val calibrationSql: String =
    s"""WITH $scoredSql,
      |b AS (
      |  SELECT LEAST(CAST(FLOOR(((score + 1) / 2) * 10) AS BIGINT), 9) AS bin,
      |    (score + 1) / 2 AS p, y
      |  FROM scored)
      |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(y) AS BIGINT) AS n_pos,
      |  ROUND(CAST(SUM(CAST(ROUND(p, 9) AS DECIMAL(28,9))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_p,
      |  ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
      |  ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*)
      |    - CAST(SUM(CAST(ROUND(p, 9) AS DECIMAL(28,9))) AS DOUBLE)
      |      / COUNT(*), 6) AS gap
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  /** q_eval_ece entry: EXPECTED + MAXIMUM CALIBRATION ERROR — the
    * one-number summaries of [[calibrationQ]]'s reliability table that
    * a model card reports (Naeini et al. 2015 binned ECE): over the
    * same 10 fixed-width probability bins, ECE = Σ (n_b/N)·|acc_b −
    * conf_b| and MCE = max_b |acc_b − conf_b|. The calibration TABLE
    * says where the classifier lies; ECE/MCE are the regression-gate
    * numbers a pipeline thresholds on ("block the label model if ECE
    * drifts past x").
    *
    * Scale shape: one combinable (bin) collapse → ≤10 rows → a second
    * 1-row aggregate; no joins, no windows. Determinism: the weighted
    * terms |acc−conf|·n_b round to 9 dp and merge as DECIMAL(28,9)
    * (the dsum contract — a 10-row double sum would still be
    * partition-order exposed), MCE maxes per-bin values rounded 6
    * (max is order-free); acc/conf are single divides of exact
    * integers / 9-dp decimal sums in both engines. */
  def eceQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gap = abs($"n_pos".cast("double") / $"n" -
      $"sp".cast("double") / $"n")
    scored(s, dir)
      .withColumn("p", ($"score" + 1d) / 2d)
      .withColumn("bin", least(floor($"p" * 10), lit(9L)).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"),
        sum(round($"p", 9).cast("decimal(28,9)")).as("sp"))
      .agg(sum($"n").cast("long").as("n"),
        count(lit(1)).cast("long").as("n_bins"),
        sum(round(gap * $"n", 9).cast("decimal(28,9)")).as("wsum"),
        max(round(gap, 6)).as("mce"))
      .select($"n", $"n_bins",
        round($"wsum".cast("double") / $"n", 6).as("ece"), $"mce")
  }

  val eceSql: String =
    s"""WITH $scoredSql,
      |b AS (
      |  SELECT LEAST(CAST(FLOOR(((score + 1) / 2) * 10) AS BIGINT), 9) AS bin,
      |    (score + 1) / 2 AS p, y
      |  FROM scored),
      |g AS (
      |  SELECT bin, COUNT(*) AS n, SUM(y) AS n_pos,
      |    SUM(CAST(ROUND(p, 9) AS DECIMAL(28,9))) AS sp
      |  FROM b GROUP BY bin),
      |a AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_bins,
      |    SUM(CAST(ROUND(ABS(CAST(n_pos AS DOUBLE) / n
      |      - CAST(sp AS DOUBLE) / n) * n, 9) AS DECIMAL(28,9))) AS wsum,
      |    MAX(ROUND(ABS(CAST(n_pos AS DOUBLE) / n
      |      - CAST(sp AS DOUBLE) / n), 6)) AS mce
      |  FROM g)
      |SELECT n, n_bins, ROUND(CAST(wsum AS DOUBLE) / n, 6) AS ece, mce
      |FROM a""".stripMargin

  /** q_eval_f1 entry: thresholded CONFUSION-MATRIX readout of the
    * classifier — per-class support, predicted count, true positives,
    * precision, recall, and F1 at the natural score > 0 threshold,
    * plus a macro row (class = -1) averaging the two classes. Together
    * with the threshold-free AUC and the calibration table this
    * completes the standard eval triptych every production filter
    * ships with.
    *
    * Scale shape: the corpus collapses to SIX integer counts in one
    * combinable aggregate (conditional sums over (y, pred)); every
    * ratio is computed driver-free from that 1-row frame. Determinism:
    * counts are exact integers; F1 via the 2·tp/(n_pred + n_true)
    * identity — one IEEE division per cell, identical formula text on
    * both engines, rounded to 6 dp. */
  def f1Q(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = scored(s, dir)
      .withColumn("pred", ($"score" > 0d).cast("long"))
      .agg(
        sum(when($"y" === 1, 1L).otherwise(0L)).as("t1"),
        sum(when($"pred" === 1, 1L).otherwise(0L)).as("p1"),
        sum(when($"y" === 1 && $"pred" === 1, 1L).otherwise(0L)).as("tp1"),
        sum(when($"y" === 0, 1L).otherwise(0L)).as("t0"),
        sum(when($"pred" === 0, 1L).otherwise(0L)).as("p0"),
        sum(when($"y" === 0 && $"pred" === 0, 1L).otherwise(0L)).as("tp0"))
    def m(tp: Column, p: Column, tr: Column) = (
      round(tp.cast("double") / p, 6),
      round(tp.cast("double") / tr, 6),
      round(lit(2d) * tp / (p + tr), 6))
    val (pr1, rc1, f11) = m($"tp1", $"p1", $"t1")
    val (pr0, rc0, f10) = m($"tp0", $"p0", $"t0")
    c.select(explode(array(
        struct(lit(1L).as("class"), $"t1".as("n_true"), $"p1".as("n_pred"),
          $"tp1".as("tp"), pr1.as("precision"), rc1.as("recall"),
          f11.as("f1")),
        struct(lit(0L).as("class"), $"t0".as("n_true"), $"p0".as("n_pred"),
          $"tp0".as("tp"), pr0.as("precision"), rc0.as("recall"),
          f10.as("f1")),
        struct(lit(-1L).as("class"),
          ($"t1" + $"t0").as("n_true"), ($"p1" + $"p0").as("n_pred"),
          ($"tp1" + $"tp0").as("tp"),
          round(($"tp1".cast("double") / $"p1"
            + $"tp0".cast("double") / $"p0") / 2, 6).as("precision"),
          round(($"tp1".cast("double") / $"t1"
            + $"tp0".cast("double") / $"t0") / 2, 6).as("recall"),
          round((lit(2d) * $"tp1" / ($"p1" + $"t1")
            + lit(2d) * $"tp0" / ($"p0" + $"t0")) / 2, 6).as("f1"))))
        .as("r"))
      .select($"r.*")
      .withColumnRenamed("class", "cls")
      .orderBy($"cls")
  }

  val f1Sql: String =
    s"""WITH $scoredSql,
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
      |    CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p1,
      |    CAST(SUM(CASE WHEN y = 1 AND score > 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS tp1,
      |    CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t0,
      |    CAST(SUM(CASE WHEN NOT score > 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS p0,
      |    CAST(SUM(CASE WHEN y = 0 AND NOT score > 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS tp0
      |  FROM scored)
      |SELECT CAST(1 AS BIGINT) AS cls, t1 AS n_true, p1 AS n_pred,
      |  tp1 AS tp,
      |  ROUND(CAST(tp1 AS DOUBLE) / p1, 6) AS precision,
      |  ROUND(CAST(tp1 AS DOUBLE) / t1, 6) AS recall,
      |  ROUND(2.0::DOUBLE * tp1 / (p1 + t1), 6) AS f1
      |FROM c
      |UNION ALL
      |SELECT CAST(0 AS BIGINT), t0, p0, tp0,
      |  ROUND(CAST(tp0 AS DOUBLE) / p0, 6),
      |  ROUND(CAST(tp0 AS DOUBLE) / t0, 6),
      |  ROUND(2.0::DOUBLE * tp0 / (p0 + t0), 6)
      |FROM c
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT), t1 + t0, p1 + p0, tp1 + tp0,
      |  ROUND((CAST(tp1 AS DOUBLE) / p1 + CAST(tp0 AS DOUBLE) / p0) / 2, 6),
      |  ROUND((CAST(tp1 AS DOUBLE) / t1 + CAST(tp0 AS DOUBLE) / t0) / 2, 6),
      |  ROUND((2.0::DOUBLE * tp1 / (p1 + t1)
      |    + 2.0::DOUBLE * tp0 / (p0 + t0)) / 2, 6)
      |FROM c
      |ORDER BY cls""".stripMargin

  /** q_eval_avgprec entry: AVERAGE PRECISION (area under the PR curve,
    * step-function convention) of the classifier against the lang='en'
    * truth — the ranking metric that, unlike ROC AUC, does not reward
    * true negatives and is therefore THE eval for imbalanced retrieval
    * and filtering tasks (a rare-class filter can post AUC .95 while
    * its PR curve collapses). Definition is the threshold-sum form
    * AP = Σ_v (R_v − R_{v−1})·P_v over DISTINCT score thresholds —
    * exactly computable on the value-bounded score grid, no per-pair
    * or per-document rank pass (the naive ranked scan is a global sort
    * of the corpus; the grid is ≤ 10⁶ rows at any SF by the 6-dp score
    * contract). Interpolated precision at recall ≥ {50,80,90}% rides
    * along via integer-exact recall gates (2·cum1 ≥ n1 etc. — no FP
    * compare), the operating points a deployment thresholds at.
    *
    * Scale shape: one combinable grid collapse, one cumulative window
    * over the grid, totals as a broadcast 1-row frame. Determinism:
    * counts exact; per-threshold terms are shared-order IEEE doubles
    * rounded to 12 dp summed as DECIMAL(28,12); finals round 6 dp. */
  def avgprecQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = scored(s, dir)
      .groupBy($"score".as("v"))
      .agg(sum($"y").as("c1"), sum(lit(1L) - $"y").as("c2"))
    val tot = d.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    Rank.orderedPrefix(d, order = Seq($"v"), descending = true,
        cums = Seq(Rank.Cum($"c1", "cum1"),
          Rank.Cum($"c1" + $"c2", "cum")))
      .crossJoin(broadcast(tot))
      .withColumn("prec", round($"cum1".cast("double") / $"cum", 6))
      .agg(
        min($"n1").as("n_pos"), min($"n2").as("n_neg"),
        sum(round($"c1".cast("double") * $"cum1" / $"cum", 12)
          .cast("decimal(28,12)")).as("apsum"),
        max(when($"cum1" * 2 >= $"n1", $"prec")).as("p_at_r50"),
        max(when($"cum1" * 5 >= $"n1" * 4, $"prec")).as("p_at_r80"),
        max(when($"cum1" * 10 >= $"n1" * 9, $"prec")).as("p_at_r90"))
      .select($"n_pos".cast("long").as("n_pos"),
        $"n_neg".cast("long").as("n_neg"),
        round($"apsum".cast("double") / $"n_pos", 6).as("ap"),
        $"p_at_r50", $"p_at_r80", $"p_at_r90")
  }

  val avgprecSql: String =
    s"""WITH $scoredSql,
      |d AS (
      |  SELECT score AS v,
      |    CAST(SUM(y) AS BIGINT) AS c1,
      |    CAST(SUM(1 - y) AS BIGINT) AS c2
      |  FROM scored GROUP BY 1),
      |cum AS (
      |  SELECT c1,
      |    SUM(c1) OVER (ORDER BY v DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
      |    SUM(c1 + c2) OVER (ORDER BY v DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d),
      |tot AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      |  FROM d),
      |a AS (
      |  SELECT MIN(n1) AS n_pos, MIN(n2) AS n_neg,
      |    SUM(CAST(ROUND(CAST(c1 AS DOUBLE) * cum1 / cum, 12)
      |      AS DECIMAL(28,12))) AS apsum,
      |    MAX(CASE WHEN cum1 * 2 >= n1
      |      THEN ROUND(CAST(cum1 AS DOUBLE) / cum, 6) END) AS p_at_r50,
      |    MAX(CASE WHEN cum1 * 5 >= n1 * 4
      |      THEN ROUND(CAST(cum1 AS DOUBLE) / cum, 6) END) AS p_at_r80,
      |    MAX(CASE WHEN cum1 * 10 >= n1 * 9
      |      THEN ROUND(CAST(cum1 AS DOUBLE) / cum, 6) END) AS p_at_r90
      |  FROM cum, tot)
      |SELECT n_pos, n_neg,
      |  ROUND(CAST(apsum AS DOUBLE) / n_pos, 6) AS ap,
      |  p_at_r50, p_at_r80, p_at_r90
      |FROM a""".stripMargin

  /** q_eval_brier entry: MURPHY DECOMPOSITION of the Brier score —
    * Brier = RELIABILITY − RESOLUTION + UNCERTAINTY over the same
    * 10-bin table as [[calibrationQ]], plus the raw (unbinned) Brier
    * and the within-bin variance gap between the two. The
    * decomposition is what turns "the Brier is 0.21" into an
    * actionable split: REL is fixable by recalibration (isotonic/
    * Platt), RES is the model's actual discrimination, UNC is the
    * dataset's irreducible base-rate entropy — the readout that says
    * whether to recalibrate or retrain.
    *
    * Determinism: raw Brier sums per-row round((p−y)², 9) decimals
    * (the dsum contract); REL/RES sum per-BIN rounded decimal terms
    * over the 10-row frame so even the tiny final reduction is
    * order-free; UNC and the identity assemble from exact counts with
    * one division each. Scale shape: identical to calibration — one
    * combinable binning pass, then arithmetic on a ≤10-row frame. */
  def brierQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = scored(s, dir).withColumn("p", ($"score" + 1d) / 2d)
    val raw = p.agg(count(lit(1)).as("n"), sum($"y").as("n_pos"),
      sum(round(($"p" - $"y") * ($"p" - $"y"), 9).cast("decimal(28,9)"))
        .as("sq"))
    val bins = p
      .withColumn("bin", least(floor($"p" * 10), lit(9L)).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("nk"), sum($"y").as("posk"),
        sum(round($"p", 9).cast("decimal(28,9)")).as("spk"))
    val terms = bins.crossJoin(broadcast(raw))
      .select(
        round($"nk" * ($"spk".cast("double") / $"nk"
          - $"posk".cast("double") / $"nk")
          * ($"spk".cast("double") / $"nk"
            - $"posk".cast("double") / $"nk"), 9)
          .cast("decimal(28,9)").as("rel_t"),
        round($"nk" * ($"posk".cast("double") / $"nk"
          - $"n_pos".cast("double") / $"n")
          * ($"posk".cast("double") / $"nk"
            - $"n_pos".cast("double") / $"n"), 9)
          .cast("decimal(28,9)").as("res_t"))
      .agg(sum($"rel_t").as("rel_s"), sum($"res_t").as("res_s"))
    raw.crossJoin(broadcast(terms))
      .select($"n", $"n_pos",
        round($"n_pos".cast("double") / $"n", 6).as("base_rate"),
        round($"sq".cast("double") / $"n", 6).as("brier_raw"),
        round($"rel_s".cast("double") / $"n", 6).as("reliability"),
        round($"res_s".cast("double") / $"n", 6).as("resolution"),
        round(($"n_pos".cast("double") / $"n")
          * (lit(1d) - $"n_pos".cast("double") / $"n"), 6).as("uncertainty"),
        round($"rel_s".cast("double") / $"n" - $"res_s".cast("double") / $"n"
          + ($"n_pos".cast("double") / $"n")
            * (lit(1d) - $"n_pos".cast("double") / $"n"), 6)
          .as("brier_binned"))
  }

  val brierSql: String =
    s"""WITH $scoredSql,
      |pp AS (SELECT (score + 1) / 2 AS p, y FROM scored),
      |raw AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
      |    SUM(CAST(ROUND((p - y) * (p - y), 9) AS DECIMAL(28,9))) AS sq
      |  FROM pp),
      |bins AS (
      |  SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
      |    COUNT(*) AS nk, SUM(y) AS posk,
      |    SUM(CAST(ROUND(p, 9) AS DECIMAL(28,9))) AS spk
      |  FROM pp GROUP BY 1),
      |terms AS (
      |  SELECT
      |    SUM(CAST(ROUND(nk * (CAST(spk AS DOUBLE) / nk
      |        - CAST(posk AS DOUBLE) / nk)
      |      * (CAST(spk AS DOUBLE) / nk - CAST(posk AS DOUBLE) / nk), 9)
      |      AS DECIMAL(28,9))) AS rel_s,
      |    SUM(CAST(ROUND(nk * (CAST(posk AS DOUBLE) / nk
      |        - CAST(n_pos AS DOUBLE) / n)
      |      * (CAST(posk AS DOUBLE) / nk - CAST(n_pos AS DOUBLE) / n), 9)
      |      AS DECIMAL(28,9))) AS res_s
      |  FROM bins, raw)
      |SELECT n, n_pos,
      |  ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS base_rate,
      |  ROUND(CAST(sq AS DOUBLE) / n, 6) AS brier_raw,
      |  ROUND(CAST(rel_s AS DOUBLE) / n, 6) AS reliability,
      |  ROUND(CAST(res_s AS DOUBLE) / n, 6) AS resolution,
      |  ROUND((CAST(n_pos AS DOUBLE) / n)
      |    * (1 - CAST(n_pos AS DOUBLE) / n), 6) AS uncertainty,
      |  ROUND(CAST(rel_s AS DOUBLE) / n - CAST(res_s AS DOUBLE) / n
      |    + (CAST(n_pos AS DOUBLE) / n)
      |      * (1 - CAST(n_pos AS DOUBLE) / n), 6) AS brier_binned
      |FROM raw, terms""".stripMargin

  /** q_eval_lift entry: DECILE GAINS / LIFT table — the targeting
    * readout that turns a ranked score into a business decision
    * ("mailing the top 2 deciles captures X% of positives at Y× random
    * lift"): docs ranked (score DESC, doc_id ASC) into NTILE(10)
    * deciles; per decile the positive count, cumulative gain, and
    * lift vs the base rate — all in exact integer basis points
    * (gain = 10000·cum_pos div total_pos; lift = 10000·n_pos·N div
    * (n·total_pos)), so both engines agree bit-for-bit. The
    * operational companion to [[aucQ]] (which integrates the whole
    * curve into one number and hides WHERE the gains are).
    *
    * Scale shape: one [[scored]] pass; the decile cut is the
    * distributed [[Rank.orderedPrefix]] rank (no raw-row global
    * window), then every window runs on the 10-row decile frame. */
  def liftQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // NTILE(10) over (score DESC, doc_id) without a raw-row global
    // window: dense global rank + frame count from [[Rank]] (score
    // negated so the mixed-direction order becomes uniformly
    // ascending), then the NTILE split rule — first n%10 buckets hold
    // ceil(n/10) rows — as a pure integer projection, bit-identical
    // to NTILE in both engines.
    val ranked = Rank.orderedPrefix(
      scored(s, dir).withColumn("negscore", -$"score"),
      order = Seq($"negscore", $"doc_id"),
      rnOut = Some("rn"), countOut = Some("nn"))
    val d = ranked
      .withColumn("dec", expr(
        """CASE WHEN rn <= (nn % 10) * (nn div 10 + 1)
          |  THEN (rn - 1) div (nn div 10 + 1) + 1
          |  ELSE nn % 10 + (rn - (nn % 10) * (nn div 10 + 1) - 1)
          |    div (nn div 10) + 1 END""".stripMargin))
      .groupBy($"dec")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"))
    val wCum = Window.orderBy($"dec")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy($"dec")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d.withColumn("cum_pos", sum($"n_pos").over(wCum))
      .withColumn("tp", sum($"n_pos").over(wAll))
      .withColumn("tn", sum($"n").over(wAll))
      .select($"dec".cast("int").as("decile"),
        $"n".cast("long").as("n"),
        $"n_pos".cast("long").as("n_pos"),
        $"cum_pos".cast("long").as("cum_pos"),
        expr("(10000 * cum_pos) div tp").as("gain_bp"),
        expr("(10000 * n_pos * tn) div (n * tp)").as("lift_bp"))
      .orderBy($"decile")
  }

  val liftSql: String =
    s"""WITH $scoredSql,
      |dd AS (
      |  SELECT NTILE(10) OVER (ORDER BY score DESC, doc_id) AS dec, y
      |  FROM scored),
      |d AS (
      |  SELECT dec, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS n_pos
      |  FROM dd GROUP BY 1),
      |c AS (
      |  SELECT dec, n, n_pos,
      |    SUM(n_pos) OVER (ORDER BY dec
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
      |    SUM(n_pos) OVER () AS tp, SUM(n) OVER () AS tn
      |  FROM d)
      |SELECT CAST(dec AS INT) AS decile, n, n_pos,
      |  CAST(cum_pos AS BIGINT) AS cum_pos,
      |  CAST((10000 * cum_pos) // tp AS BIGINT) AS gain_bp,
      |  CAST((10000 * n_pos * tn) // (n * tp) AS BIGINT) AS lift_bp
      |FROM c ORDER BY decile""".stripMargin

  /** q_eval_mcnemar entry: McNEMAR'S TEST for comparing two classifiers
    * on the SAME examples (McNemar 1947; Dietterich, Neural Computation
    * 1998 — the recommended paired test for classifier comparison): only
    * the DISCORDANT pairs carry information — b = examples A gets right
    * and B wrong, c = the reverse — and under H₀ (equal accuracy) the
    * discordants split Binomial(b+c, ½); the continuity-corrected
    * statistic (|b−c|−1)²/(b+c) ~ χ²₁. The unpaired two-proportion test
    * ([[graft.ops.Stats]] ttest/ab_lift idiom) is WRONG here — it
    * ignores the per-example pairing and overstates variance; McNemar
    * is how model A-vs-B evals on a shared holdout must be scored.
    *
    * Fixture: the two "classifiers" are two operating points of the
    * shared [[scored]] lexicon model (thresholds 0.06 and 0.18 — both
    * sides of the score median, so each dominates on a different
    * class), predicting y = (lang = 'en').
    *
    * Scale shape: one map-stage classification + ONE combinable global
    * aggregate — four integer cells out; the statistic is scalar
    * arithmetic on exact integers (single IEEE divisions, round 6).
    * At 100 TB the eval costs exactly one corpus pass. */
  def mcnemarQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = scored(s, dir).select(
      (($"score" >= 0.06) === ($"y" === 1L)).cast("long").as("a_ok"),
      (($"score" >= 0.18) === ($"y" === 1L)).cast("long").as("b_ok"))
      .agg(count(lit(1)).as("n"),
        sum($"a_ok").as("na"), sum($"b_ok").as("nb"),
        sum(when($"a_ok" === 1L && $"b_ok" === 0L, 1L).otherwise(0L))
          .as("b"),
        sum(when($"a_ok" === 0L && $"b_ok" === 1L, 1L).otherwise(0L))
          .as("c"))
    cells.select($"n".cast("long").as("n"),
      round($"na".cast("double") / $"n", 6).as("acc_a"),
      round($"nb".cast("double") / $"n", 6).as("acc_b"),
      $"b".cast("long").as("disc_a_only"),
      $"c".cast("long").as("disc_b_only"),
      round(pow(abs($"b" - $"c") - lit(1.0), 2)
        / ($"b" + $"c").cast("double"), 6).as("mcnemar_chi2"),
      (pow(abs($"b" - $"c") - lit(1.0), 2) / ($"b" + $"c").cast("double")
        > lit(3.841459)).as("significant_05"))
  }

  val mcnemarSql: String =
    s"""WITH $scoredSql,
      |cls AS (
      |  SELECT
      |    CASE WHEN (score >= 0.06) = (y = 1) THEN 1 ELSE 0 END AS a_ok,
      |    CASE WHEN (score >= 0.18) = (y = 1) THEN 1 ELSE 0 END AS b_ok
      |  FROM scored),
      |cells AS (
      |  SELECT COUNT(*) AS n, SUM(a_ok) AS na, SUM(b_ok) AS nb,
      |    SUM(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END) AS b,
      |    SUM(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END) AS c
      |  FROM cls)
      |SELECT CAST(n AS BIGINT) AS n,
      |  ROUND(CAST(na AS DOUBLE) / n, 6) AS acc_a,
      |  ROUND(CAST(nb AS DOUBLE) / n, 6) AS acc_b,
      |  CAST(b AS BIGINT) AS disc_a_only,
      |  CAST(c AS BIGINT) AS disc_b_only,
      |  ROUND(POW(ABS(b - c) - 1.0, 2) / CAST(b + c AS DOUBLE), 6)
      |    AS mcnemar_chi2,
      |  POW(ABS(b - c) - 1.0, 2) / CAST(b + c AS DOUBLE) > 3.841459
      |    AS significant_05
      |FROM cells""".stripMargin

  /** q_eval_bleu entry: corpus-level BLEU (Papineni et al., ACL 2002)
    * per source — modified (clipped) n-gram precision for n = 1..4
    * plus the brevity penalty, the reference metric every
    * generation-eval harness reports. Candidate/reference pairs are
    * deterministic: each doc against its source's NEXT doc by doc_id
    * (consecutive same-source docs share register and vocabulary — a
    * same-distribution baseline, which is exactly what corpus BLEU
    * needs to produce mid-range, discriminative values). Clipping is
    * per pair per gram: min(count_cand, count_ref).
    *
    * Scale shape: ONE flattened n∈1..4 gram explode per doc (O(4 ×
    * corpus words) rows), counts collapse combinably per (doc, n,
    * gram); the pair join touches gram-count rows, never documents;
    * everything after lives on the (source, n) grid. Determinism:
    * matches/totals/lengths are exact integers; each p_n is one IEEE
    * divide; BLEU is the identical written chain
    * bp · exp(0.25·(ln p1 + … + ln p4)) in both engines, rounded
    * once to 6 dp; any zero match short-circuits to 0 before ln. */
  def bleuQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // r15 (guide §2.3/§2.5): the gram explode+hash is the expensive map
    // stage — spread it across the cores (single-row-group input file);
    // the pairs/lens branches need only LENGTHS, which `lens0` computes
    // as space-count+1 (split-on-single-space semantics exactly: both
    // engines keep empty tokens, so #tokens ≡ #spaces+1, empty text
    // gives 1 in both) — the corpus is lower+split ONCE, not three
    // times.
    val toks = graft.Tables.spread(t(s, dir, "documents"))
      .select($"doc_id", $"source", split(lower($"text"), " ").as("w"))
      .withColumn("len", size($"w"))
    val lens0 = t(s, dir, "documents")
      .select($"doc_id", $"source",
        (length($"text") - length(replace($"text", lit(" "), lit("")))
          + 1).as("len"))
    // gram join/group keys are the pinned 60-bit md5 hash of the gram
    // text, not the text itself: the two corpus exchanges then carry
    // 8-byte keys instead of up-to-4-word strings (measured r11: the
    // string-keyed shape benched 13.7×/decade at sf10 from shuffle
    // volume alone). A hash collision merges the same two grams in
    // BOTH engines (the oracle hashes identically), so the gate is
    // unaffected; expected collisions ≈ d²/2⁶¹ ≈ 0 at any vocabulary.
    val grams = toks.select($"doc_id", explode(expr(
        """flatten(transform(array(1, 2, 3, 4), n ->
          |  if(size(w) >= n,
          |     transform(sequence(1, size(w) - n + 1),
          |       i -> struct(n AS n, concat_ws(' ', slice(w, i, n)) AS g)),
          |     array())))""".stripMargin)).as("e"))
      .select($"doc_id", $"e.n".as("n"), Hashing.md5Long60($"e.g").as("g"))
      .groupBy($"doc_id", $"n", $"g").agg(count(lit(1)).as("c"))
    // r15: the reference length rides the SAME lead window that mints
    // ref_id (one Window exec), replacing the old pairs⋈lens0 re-join
    // for rlen — lead(len) over the identical spec IS the ref's len.
    val w0 = Window.partitionBy($"source").orderBy($"doc_id")
    val pairs0 = lens0
      .withColumn("ref_id", lead($"doc_id", 1).over(w0))
      .withColumn("rlen", lead($"len", 1).over(w0))
      .filter($"ref_id".isNotNull)
      .select($"source", $"doc_id".as("cand_id"), $"ref_id", $"len",
        $"rlen")
    val cg = grams.withColumnRenamed("doc_id", "cand_id")
      .withColumnRenamed("c", "cc")
    val rg = grams.withColumnRenamed("doc_id", "ref_id")
      .withColumnRenamed("c", "rc")
    // the gram aggregate is millions of rows — Catalyst's post-explode
    // size estimate can pick a broadcast build of it (the chrF r13
    // finding); pin the distributed hash join, building the narrow
    // pairs side where it is one of the sides. r15: the per-(source,n)
    // match sums pivot straight to per-source columns in the SAME
    // aggregate (Σ over join rows of when(n=i, least) ≡ the old
    // two-step (source,n)-then-source sum), dropping one exchange and
    // the whole (source,n) grid join.
    val mCells = (1 to 4).map(i =>
      sum(when($"n" === i, least($"cc", $"rc")).otherwise(0L))
        .as(s"m$i"))
    val matchesW = pairs0
      .select($"source", $"cand_id", $"ref_id")
      .hint("shuffle_hash").join(cg, "cand_id")
      .join(rg.hint("shuffle_hash"), Seq("ref_id", "n", "g"))
      .groupBy($"source")
      .agg(mCells.head, mCells.tail: _*)
    // r15: Σ_g cc over a doc's n-grams is len−n+1 by construction
    // (clipping never applies to totals), so tt is a pure function of
    // candidate lengths — the second pairs⋈grams join (a full gram-
    // table exchange keyed by cand_id) is algebra, not data; and the
    // old totals-explode → (source,n) grid join → re-pivot is the
    // identity on these wide columns, so lengths, pair count and tt
    // all come from ONE per-source aggregate. tt_i for a source where
    // no candidate has len ≥ i was 0 in the old grid (its (source,i)
    // row was filtered out, so the pivot summed nothing) — coalesce
    // reproduces exactly that 0.
    val psAggs = Seq(count(lit(1)).as("n_pairs"),
      sum($"len").as("cand_words"), sum($"rlen").as("ref_words")) ++
      (1 to 4).map(i => coalesce(sum(when($"len" >= i,
        ($"len" - i + 1).cast("long"))), lit(0L)).as(s"tt$i"))
    val perSource = pairs0.groupBy($"source")
      .agg(psAggs.head, psAggs.tail: _*)
    // tt_i = 0 (every candidate in a source shorter than i tokens) would
    // hit engine-divergent zero-divide semantics (Spark NULL vs DuckDB
    // NaN); short-circuit to 0.0 in both engines, like the bleu column.
    def p(i: Int) = when(col(s"tt$i") === 0L, lit(0.0))
      .otherwise(col(s"m$i").cast("double") / col(s"tt$i").cast("double"))
    val bp = when($"cand_words" >= $"ref_words", lit(1.0))
      .otherwise(exp(lit(1.0) - $"ref_words".cast("double")
        / $"cand_words".cast("double")))
    perSource.join(matchesW, Seq("source"), "left")
      .na.fill(0L, (1 to 4).map(i => s"m$i"))
      .select($"source", $"n_pairs",
        $"cand_words".cast("long").as("cand_words"),
        $"ref_words".cast("long").as("ref_words"),
        round(p(1), 6).as("p1"), round(p(2), 6).as("p2"),
        round(p(3), 6).as("p3"), round(p(4), 6).as("p4"),
        round(bp, 6).as("brevity_penalty"),
        when($"m1" === 0L || $"m2" === 0L || $"m3" === 0L || $"m4" === 0L,
          lit(0.0))
          .otherwise(round(bp * exp(lit(0.25) *
            (log(p(1)) + log(p(2)) + log(p(3)) + log(p(4)))), 6))
          .as("bleu"))
      .orderBy($"source")
  }

  val bleuSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(lower(text), ' ') AS w,
      |    len(string_split(lower(text), ' ')) AS l
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, n,
      |    ('0x' || substr(md5(array_to_string(w[i:i + n - 1], ' ')),
      |      1, 15))::UBIGINT::BIGINT AS g,
      |    COUNT(*) AS c
      |  FROM (
      |    SELECT doc_id, w, nn.n AS n,
      |      unnest(generate_series(1, l - nn.n + 1)) AS i
      |    FROM toks CROSS JOIN range(1, 5) nn(n)
      |    WHERE l >= nn.n)
      |  GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT source, doc_id AS cand_id, l AS clen,
      |    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref_id
      |  FROM toks
      |  QUALIFY ref_id IS NOT NULL),
      |lens AS (
      |  SELECT p.source, COUNT(*) AS n_pairs, SUM(p.clen) AS cand_words,
      |    SUM(r.l) AS ref_words
      |  FROM pairs p JOIN toks r ON r.doc_id = p.ref_id
      |  GROUP BY 1),
      |matches AS (
      |  SELECT p.source, cg.n, SUM(LEAST(cg.c, rg.c)) AS m
      |  FROM pairs p
      |  JOIN grams cg ON cg.doc_id = p.cand_id
      |  JOIN grams rg ON rg.doc_id = p.ref_id
      |    AND rg.n = cg.n AND rg.g = cg.g
      |  GROUP BY 1, 2),
      |totals AS (
      |  SELECT p.source, cg.n, SUM(cg.c) AS tt
      |  FROM pairs p JOIN grams cg ON cg.doc_id = p.cand_id
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.source,
      |    SUM(CASE WHEN t.n = 1 THEN COALESCE(m.m, 0) ELSE 0 END) AS m1,
      |    SUM(CASE WHEN t.n = 2 THEN COALESCE(m.m, 0) ELSE 0 END) AS m2,
      |    SUM(CASE WHEN t.n = 3 THEN COALESCE(m.m, 0) ELSE 0 END) AS m3,
      |    SUM(CASE WHEN t.n = 4 THEN COALESCE(m.m, 0) ELSE 0 END) AS m4,
      |    SUM(CASE WHEN t.n = 1 THEN t.tt ELSE 0 END) AS tt1,
      |    SUM(CASE WHEN t.n = 2 THEN t.tt ELSE 0 END) AS tt2,
      |    SUM(CASE WHEN t.n = 3 THEN t.tt ELSE 0 END) AS tt3,
      |    SUM(CASE WHEN t.n = 4 THEN t.tt ELSE 0 END) AS tt4
      |  FROM totals t
      |  LEFT JOIN matches m ON m.source = t.source AND m.n = t.n
      |  GROUP BY 1)
      |SELECT l.source, CAST(l.n_pairs AS BIGINT) AS n_pairs,
      |  CAST(l.cand_words AS BIGINT) AS cand_words,
      |  CAST(l.ref_words AS BIGINT) AS ref_words,
      |  ROUND(CASE WHEN tt1 = 0 THEN 0.0
      |    ELSE CAST(m1 AS DOUBLE) / CAST(tt1 AS DOUBLE) END, 6) AS p1,
      |  ROUND(CASE WHEN tt2 = 0 THEN 0.0
      |    ELSE CAST(m2 AS DOUBLE) / CAST(tt2 AS DOUBLE) END, 6) AS p2,
      |  ROUND(CASE WHEN tt3 = 0 THEN 0.0
      |    ELSE CAST(m3 AS DOUBLE) / CAST(tt3 AS DOUBLE) END, 6) AS p3,
      |  ROUND(CASE WHEN tt4 = 0 THEN 0.0
      |    ELSE CAST(m4 AS DOUBLE) / CAST(tt4 AS DOUBLE) END, 6) AS p4,
      |  ROUND(CASE WHEN l.cand_words >= l.ref_words THEN 1.0
      |    ELSE EXP(1.0 - CAST(l.ref_words AS DOUBLE)
      |      / CAST(l.cand_words AS DOUBLE)) END, 6) AS brevity_penalty,
      |  CASE WHEN m1 = 0 OR m2 = 0 OR m3 = 0 OR m4 = 0 THEN 0.0
      |  ELSE ROUND(
      |    (CASE WHEN l.cand_words >= l.ref_words THEN 1.0
      |     ELSE EXP(1.0 - CAST(l.ref_words AS DOUBLE)
      |       / CAST(l.cand_words AS DOUBLE)) END)
      |    * EXP(0.25 * (LN(CAST(m1 AS DOUBLE) / CAST(tt1 AS DOUBLE))
      |                + LN(CAST(m2 AS DOUBLE) / CAST(tt2 AS DOUBLE))
      |                + LN(CAST(m3 AS DOUBLE) / CAST(tt3 AS DOUBLE))
      |                + LN(CAST(m4 AS DOUBLE) / CAST(tt4 AS DOUBLE)))), 6)
      |  END AS bleu
      |FROM lens l JOIN grid USING (source)
      |ORDER BY source""".stripMargin

  /** q_eval_rouge entry: corpus ROUGE-1/ROUGE-2 (Lin 2004 — the
    * recall-oriented twin of BLEU) per source, over the same
    * consecutive-document candidate/reference pairing as [[bleuQ]].
    * For n ∈ {1, 2}: matches are clipped per pair per gram
    * (min(count_cand, count_ref)); recall divides by REFERENCE gram
    * totals (ROUGE's defining choice), precision by candidate totals,
    * F1 = 2PR/(P+R). Corpus-level: sums over pairs, then one ratio —
    * the micro-average variant, which is the one that decomposes into
    * combinable aggregates at scale.
    *
    * Scale shape: one flattened n∈{1,2} gram explode per doc (O(2 ×
    * corpus words) rows — half of BLEU's), counts collapse per
    * (doc, n, gram-hash) with 8-byte md5Long60 keys (the r11 BLEU
    * lesson: never shuffle gram STRINGS); pair joins move gram-count
    * rows; the P/R/F arithmetic lives on the |sources| × 2 grid.
    * Determinism: matches/totals exact integers, each ratio one IEEE
    * divide, F guarded by the exact integer m = 0 short-circuit. */
  def rougeQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // r15 (the bleuQ restructure, same arguments): spread the gram map
    // stage; lengths come from space-count+1 without re-splitting the
    // corpus; ct/rt are pure functions of candidate/reference lengths
    // (Σ max(len−n+1, 0) — clipping never applies to totals), so the
    // two extra pairs⋈grams joins are algebra; rlen rides the SAME
    // lead window that mints ref_id.
    val toks = graft.Tables.spread(t(s, dir, "documents"))
      .select($"doc_id", $"source", split(lower($"text"), " ").as("w"))
    val grams = toks.select($"doc_id", explode(expr(
        """flatten(transform(array(1, 2), n ->
          |  if(size(w) >= n,
          |     transform(sequence(1, size(w) - n + 1),
          |       i -> struct(n AS n, concat_ws(' ', slice(w, i, n)) AS g)),
          |     array())))""".stripMargin)).as("e"))
      .select($"doc_id", $"e.n".as("n"), Hashing.md5Long60($"e.g").as("g"))
      .groupBy($"doc_id", $"n", $"g").agg(count(lit(1)).as("c"))
    val w0 = Window.partitionBy($"source").orderBy($"doc_id")
    val pairs0 = t(s, dir, "documents")
      .select($"doc_id", $"source",
        (length($"text") - length(replace($"text", lit(" "), lit("")))
          + 1).as("len"))
      .withColumn("ref_id", lead($"doc_id", 1).over(w0))
      .withColumn("rlen", lead($"len", 1).over(w0))
      .filter($"ref_id".isNotNull)
    val cg = grams.withColumnRenamed("doc_id", "cand_id")
      .withColumnRenamed("c", "cc")
    val rg = grams.withColumnRenamed("doc_id", "ref_id")
      .withColumnRenamed("c", "rc")
    // pin distributed hash joins on the gram-aggregate sides (the chrF
    // r13 broadcast-blowup finding; same shape here). r15: per-(source,
    // n) match sums pivot straight to per-source columns in the SAME
    // aggregate, dropping one exchange and the (source,n) grid join.
    val mCells = (1 to 2).map(i =>
      sum(when($"n" === i, least($"cc", $"rc")).otherwise(0L))
        .as(s"m$i"))
    val matchesW = pairs0
      .select($"source", $"doc_id".as("cand_id"), $"ref_id")
      .hint("shuffle_hash").join(cg, "cand_id")
      .join(rg.hint("shuffle_hash"), Seq("ref_id", "n", "g"))
      .groupBy($"source").agg(mCells.head, mCells.tail: _*)
    // ct/rt are pure length algebra, and (r15) the old wide-agg →
    // struct-explode → (source,n) left-join-matches → re-pivot was
    // the identity on these wide columns: an old grid m_i was summed
    // over ctrt's (source,i) row, which existed iff ct_i>0 AND
    // rt_i>0 — but m_i>0 already implies a candidate AND a reference
    // gram of order i exist (both totals > 0), so pivoting matches
    // directly yields the same m_i, and ct_i/rt_i are the same sums
    // with the filtered-row 0 reproduced by the otherwise-0 when.
    val psAggs = count(lit(1)).as("n_pairs") +:
      (1 to 2).flatMap(i => Seq(
        coalesce(sum(when($"len" >= i, ($"len" - i + 1).cast("long"))),
          lit(0L)).as(s"ct$i"),
        coalesce(sum(when($"rlen" >= i, ($"rlen" - i + 1).cast("long"))),
          lit(0L)).as(s"rt$i")))
    val perSource = pairs0.groupBy($"source")
      .agg(psAggs.head, psAggs.tail: _*)
    def p(i: Int) = when(col(s"ct$i") === 0L, lit(0.0))
      .otherwise(col(s"m$i").cast("double") / col(s"ct$i").cast("double"))
    def r(i: Int) = when(col(s"rt$i") === 0L, lit(0.0))
      .otherwise(col(s"m$i").cast("double") / col(s"rt$i").cast("double"))
    def f(i: Int) = when(col(s"m$i") === 0L, lit(0.0))
      .otherwise(lit(2.0) * p(i) * r(i) / (p(i) + r(i)))
    perSource.join(matchesW, Seq("source"), "left")
      .na.fill(0L, (1 to 2).map(i => s"m$i"))
      .select($"source", $"n_pairs",
        $"m1".cast("long").as("m1"), $"m2".cast("long").as("m2"),
        round(p(1), 6).as("rouge1_p"), round(r(1), 6).as("rouge1_r"),
        round(f(1), 6).as("rouge1_f"),
        round(p(2), 6).as("rouge2_p"), round(r(2), 6).as("rouge2_r"),
        round(f(2), 6).as("rouge2_f"))
      .orderBy($"source")
  }

  val rougeSql: String = {
    def p(i: Int) = s"CASE WHEN ct$i = 0 THEN 0.0 " +
      s"ELSE CAST(m$i AS DOUBLE) / CAST(ct$i AS DOUBLE) END"
    def r(i: Int) = s"CASE WHEN rt$i = 0 THEN 0.0 " +
      s"ELSE CAST(m$i AS DOUBLE) / CAST(rt$i AS DOUBLE) END"
    def f(i: Int) = s"CASE WHEN m$i = 0 THEN 0.0 " +
      s"ELSE 2.0 * (${p(i)}) * (${r(i)}) / ((${p(i)}) + (${r(i)})) END"
    s"""WITH toks AS (
      |  SELECT doc_id, source, string_split(lower(text), ' ') AS w,
      |    len(string_split(lower(text), ' ')) AS l
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, n,
      |    ('0x' || substr(md5(array_to_string(w[i:i + n - 1], ' ')),
      |      1, 15))::UBIGINT::BIGINT AS g,
      |    COUNT(*) AS c
      |  FROM (
      |    SELECT doc_id, w, nn.n AS n,
      |      unnest(generate_series(1, l - nn.n + 1)) AS i
      |    FROM toks CROSS JOIN range(1, 3) nn(n)
      |    WHERE l >= nn.n)
      |  GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT source, doc_id AS cand_id,
      |    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref_id
      |  FROM toks
      |  QUALIFY ref_id IS NOT NULL),
      |matches AS (
      |  SELECT p.source, cg.n, SUM(LEAST(cg.c, rg.c)) AS m
      |  FROM pairs p
      |  JOIN grams cg ON cg.doc_id = p.cand_id
      |  JOIN grams rg ON rg.doc_id = p.ref_id
      |    AND rg.n = cg.n AND rg.g = cg.g
      |  GROUP BY 1, 2),
      |cts AS (
      |  SELECT p.source, cg.n, SUM(cg.c) AS ct
      |  FROM pairs p JOIN grams cg ON cg.doc_id = p.cand_id
      |  GROUP BY 1, 2),
      |rts AS (
      |  SELECT p.source, rg.n, SUM(rg.c) AS rt
      |  FROM pairs p JOIN grams rg ON rg.doc_id = p.ref_id
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT c.source,
      |    SUM(CASE WHEN c.n = 1 THEN COALESCE(m.m, 0) ELSE 0 END) AS m1,
      |    SUM(CASE WHEN c.n = 2 THEN COALESCE(m.m, 0) ELSE 0 END) AS m2,
      |    SUM(CASE WHEN c.n = 1 THEN c.ct ELSE 0 END) AS ct1,
      |    SUM(CASE WHEN c.n = 2 THEN c.ct ELSE 0 END) AS ct2,
      |    SUM(CASE WHEN c.n = 1 THEN r.rt ELSE 0 END) AS rt1,
      |    SUM(CASE WHEN c.n = 2 THEN r.rt ELSE 0 END) AS rt2
      |  FROM cts c
      |  JOIN rts r ON r.source = c.source AND r.n = c.n
      |  LEFT JOIN matches m ON m.source = c.source AND m.n = c.n
      |  GROUP BY 1),
      |np AS (SELECT source, COUNT(*) AS n_pairs FROM pairs GROUP BY 1)
      |SELECT np.source, np.n_pairs,
      |  CAST(m1 AS BIGINT) AS m1, CAST(m2 AS BIGINT) AS m2,
      |  ROUND(${p(1)}, 6) AS rouge1_p, ROUND(${r(1)}, 6) AS rouge1_r,
      |  ROUND(${f(1)}, 6) AS rouge1_f,
      |  ROUND(${p(2)}, 6) AS rouge2_p, ROUND(${r(2)}, 6) AS rouge2_r,
      |  ROUND(${f(2)}, 6) AS rouge2_f
      |FROM np JOIN grid USING (source)
      |ORDER BY source""".stripMargin
  }

  /** q_eval_chrf entry: corpus chrF2 (Popović 2015 — character n-gram
    * F-score with β = 2, the WMT-standard neural-MT metric) per
    * source, same consecutive-document pairing as [[bleuQ]]. Spaces
    * are removed (the paper's default), character n-grams n ∈ 1..6 are
    * counted with per-pair clipping; chrP/chrR are the arithmetic
    * means over n of the per-order precision/recall (micro over pairs,
    * macro over orders — the reference implementation's aggregation),
    * chrF2 = 5·P·R / (4·P + R).
    *
    * Scale shape: the gram pass is ONE native [[graft.functions
    * .CharGrams]] byte loop per document (all six orders in one pass,
    * no per-gram substring or md5 pipeline — the r12 build spent 35 s
    * at sf0.1, ~11% of the whole driver bench, there), collapsed
    * map-side to distinct (doc, packed-gram) counts before any
    * shuffle; grams travel as one INJECTIVE 8-byte key `(n << 56) |
    * bytes` (collision-free, unlike a hash, and the order rides in the
    * key so joins need no separate n column); the consecutive-document
    * pairing is a distributed [[Rank]] pass + rank+1 self-join (no
    * per-source fat-task lead window); final arithmetic on the
    * |sources| × 6 grid. Byte grams = char grams on the ASCII corpus —
    * the [[graft.functions.RollingHash]] contract, shared by the
    * oracle's `(n << 56) + hex(substr)` key. Determinism: integer
    * counts, each per-order ratio one IEEE divide, the mean a fixed
    * 6-term written chain, zero denominators short-circuited
    * identically. */
  def chrfQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // r15: spread the char-gram map stage (single-row-group input, the
    // §2.5 scan-parallelism fix); the pairs/lens branches need only the
    // space-free LENGTH, which len(replace(text,' ','')) computes
    // without the corpus lower+regexp pass (lower() preserves length
    // on this ASCII corpus contract); rlen rides the same lead window
    // that mints ref_id, dropping both length joins.
    val ch = graft.Tables.spread(t(s, dir, "documents"))
      .select($"doc_id", $"source",
        regexp_replace(lower($"text"), " ", "").as("c"))
    val grams = ch.select($"doc_id", explode(expr("char_grams(c, 6)")).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val pairs0 = t(s, dir, "documents")
      .select($"doc_id", $"source",
        length(replace($"text", lit(" "), lit(""))).as("len"))
      .withColumn("ref_id", lead($"doc_id", 1).over(w0))
      .withColumn("rlen", lead($"len", 1).over(w0))
      .filter($"ref_id".isNotNull)
    val nOf = shiftright($"g", 56).cast("int")
    val cg = grams.withColumnRenamed("doc_id", "cand_id")
      .withColumnRenamed("cnt", "cc")
    val rg = grams.withColumnRenamed("doc_id", "ref_id")
      .withColumnRenamed("cnt", "rc")
    // the gram table is 6×chars rows — Catalyst's post-explode size
    // estimate undercounts it badly enough to pick a BROADCAST build
    // of the ref-gram side (measured: a 46M-row single-threaded
    // HashedRelation, 215 s of the 147 s→258 s sf1 regression); pin
    // the distributed hash join explicitly — at any real scale this
    // side is never broadcastable. r15: the per-(source,n) match sums
    // pivot straight to per-source columns in the SAME aggregate
    // (Σ over join rows of when(n=i, least) ≡ the old two-step
    // (source,n)-then-source sum), dropping one exchange and the
    // whole (source,n) grid join.
    val mCells = (1 to 6).map(i =>
      sum(when(nOf === i, least($"cc", $"rc")).otherwise(0L))
        .as(s"m$i"))
    val matchesW = pairs0
      .select($"source", $"doc_id".as("cand_id"), $"ref_id")
      .hint("shuffle_hash").join(cg, "cand_id")
      .join(rg.hint("shuffle_hash"), Seq("ref_id", "g"))
      .groupBy($"source").agg(mCells.head, mCells.tail: _*)
    // ct/rt never need the gram table: the total gram occurrences of
    // order n in a doc is just max(len − n + 1, 0), so the per-order
    // totals are pure length algebra — and (r15) the old
    // sequence-explode → (source,n) self-join of ct with rt → re-pivot
    // was the identity on these wide columns, so totals, ct/rt and the
    // pair count all come from ONE per-source aggregate (the nPairs
    // subtree and the ct⋈rt join are gone; values are the same
    // integer sums).
    val psAggs = count(lit(1)).as("n_pairs") +:
      (1 to 6).flatMap(i => Seq(
        sum(greatest($"len" - i + 1, lit(0))).cast("long").as(s"ct$i"),
        sum(greatest($"rlen" - i + 1, lit(0))).cast("long")
          .as(s"rt$i")))
    val perSource = pairs0.groupBy($"source")
      .agg(psAggs.head, psAggs.tail: _*)
    def p(i: Int) = when(col(s"ct$i") === 0L, lit(0.0))
      .otherwise(col(s"m$i").cast("double") / col(s"ct$i").cast("double"))
    def r(i: Int) = when(col(s"rt$i") === 0L, lit(0.0))
      .otherwise(col(s"m$i").cast("double") / col(s"rt$i").cast("double"))
    val chrp = (p(1) + p(2) + p(3) + p(4) + p(5) + p(6)) / lit(6.0)
    val chrr = (r(1) + r(2) + r(3) + r(4) + r(5) + r(6)) / lit(6.0)
    val chrf2 = when(chrp + chrr === 0.0, lit(0.0))
      .otherwise(lit(5.0) * chrp * chrr / (lit(4.0) * chrp + chrr))
    perSource.join(matchesW, Seq("source"), "left")
      .na.fill(0L, (1 to 6).map(i => s"m$i"))
      .select($"source", $"n_pairs",
        $"m1".cast("long").as("m1"), $"m6".cast("long").as("m6"),
        round(chrp, 6).as("chrf_p"), round(chrr, 6).as("chrf_r"),
        round(chrf2, 6).as("chrf2"))
      .orderBy($"source")
  }

  val chrfSql: String = {
    def p(i: Int) = s"(CASE WHEN ct$i = 0 THEN 0.0 " +
      s"ELSE CAST(m$i AS DOUBLE) / CAST(ct$i AS DOUBLE) END)"
    def r(i: Int) = s"(CASE WHEN rt$i = 0 THEN 0.0 " +
      s"ELSE CAST(m$i AS DOUBLE) / CAST(rt$i AS DOUBLE) END)"
    val chrp = s"((${(1 to 6).map(p).mkString(" + ")}) / 6.0)"
    val chrr = s"((${(1 to 6).map(r).mkString(" + ")}) / 6.0)"
    val gridCells = (1 to 6).map(i =>
      s"""    SUM(CASE WHEN c.n = $i THEN COALESCE(m.m, 0) ELSE 0 END) AS m$i,
         |    SUM(CASE WHEN c.n = $i THEN c.ct ELSE 0 END) AS ct$i,
         |    SUM(CASE WHEN c.n = $i THEN r.rt ELSE 0 END) AS rt$i"""
        .stripMargin).mkString(",\n")
    s"""WITH ch AS (
      |  SELECT doc_id, source, replace(lower(text), ' ', '') AS c,
      |    len(replace(lower(text), ' ', '')) AS l
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, n,
      |    CAST(n::UBIGINT * 72057594037927936::UBIGINT
      |      + ('0x' || hex(substr(c, i, n)))::UBIGINT AS BIGINT) AS g,
      |    COUNT(*) AS cnt
      |  FROM (
      |    SELECT doc_id, c, nn.n AS n,
      |      unnest(generate_series(1, l - nn.n + 1)) AS i
      |    FROM ch CROSS JOIN range(1, 7) nn(n)
      |    WHERE l >= nn.n)
      |  GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT source, doc_id AS cand_id,
      |    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref_id
      |  FROM ch
      |  QUALIFY ref_id IS NOT NULL),
      |matches AS (
      |  SELECT p.source, cg.n, SUM(LEAST(cg.cnt, rg.cnt)) AS m
      |  FROM pairs p
      |  JOIN grams cg ON cg.doc_id = p.cand_id
      |  JOIN grams rg ON rg.doc_id = p.ref_id
      |    AND rg.n = cg.n AND rg.g = cg.g
      |  GROUP BY 1, 2),
      |cts AS (
      |  SELECT p.source, cg.n, SUM(cg.cnt) AS ct
      |  FROM pairs p JOIN grams cg ON cg.doc_id = p.cand_id
      |  GROUP BY 1, 2),
      |rts AS (
      |  SELECT p.source, rg.n, SUM(rg.cnt) AS rt
      |  FROM pairs p JOIN grams rg ON rg.doc_id = p.ref_id
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT c.source,
      |$gridCells
      |  FROM cts c
      |  JOIN rts r ON r.source = c.source AND r.n = c.n
      |  LEFT JOIN matches m ON m.source = c.source AND m.n = c.n
      |  GROUP BY 1),
      |np AS (SELECT source, COUNT(*) AS n_pairs FROM pairs GROUP BY 1)
      |SELECT np.source, np.n_pairs,
      |  CAST(m1 AS BIGINT) AS m1, CAST(m6 AS BIGINT) AS m6,
      |  ROUND($chrp, 6) AS chrf_p,
      |  ROUND($chrr, 6) AS chrf_r,
      |  ROUND(CASE WHEN $chrp + $chrr = 0.0 THEN 0.0
      |    ELSE 5.0 * $chrp * $chrr / (4.0 * $chrp + $chrr) END, 6) AS chrf2
      |FROM np JOIN grid USING (source)
      |ORDER BY source""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_bleu" -> bleuQ,
    "q_eval_rouge" -> rougeQ,
    "q_eval_chrf" -> chrfQ,
    "q_eval_mcnemar" -> mcnemarQ,
    "q_eval_lift" -> liftQ,
    "q_text_classify" -> classifyQ,
    "q_eval_auc" -> aucQ,
    "q_eval_calibration" -> calibrationQ,
    "q_eval_ece" -> eceQ,
    "q_eval_brier" -> brierQ,
    "q_eval_avgprec" -> avgprecQ,
    "q_eval_f1" -> f1Q,
    "q_eval_mcc" -> mccQ)

  /** q_eval_mcc entry: MATTHEWS CORRELATION COEFFICIENT + balanced
    * accuracy + Youden's J for the same scored binary task as
    * [[f1Q]] — MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)),
    * the single-number confusion-matrix summary that stays honest
    * under class imbalance (F1 ignores TN entirely; a majority-class
    * guesser can score high F1 but MCC ≈ 0). The go-to headline metric
    * when the positive class is rare — which in data-quality gates it
    * always is.
    *
    * Scale shape: identical to [[f1Q]] — one combinable confusion
    * aggregate over the scored frame; all four cells exact integers;
    * the products run in DOUBLE (cells can exceed 2³¹ at corpus scale,
    * and √ forces IEEE anyway), one shared chain rounded 6. */
  def mccQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scored(s, dir)
      .withColumn("pred", ($"score" > 0d).cast("long"))
      .agg(
        sum(when($"y" === 1 && $"pred" === 1, 1L).otherwise(0L)).as("tp"),
        sum(when($"y" === 0 && $"pred" === 0, 1L).otherwise(0L)).as("tn"),
        sum(when($"y" === 0 && $"pred" === 1, 1L).otherwise(0L)).as("fp"),
        sum(when($"y" === 1 && $"pred" === 0, 1L).otherwise(0L)).as("fn"))
      .select($"tp".cast("long").as("tp"), $"tn".cast("long").as("tn"),
        $"fp".cast("long").as("fp"), $"fn".cast("long").as("fn"),
        round(($"tp".cast("double") * $"tn".cast("double") -
          $"fp".cast("double") * $"fn".cast("double")) /
          sqrt(($"tp" + $"fp").cast("double") *
            ($"tp" + $"fn").cast("double") *
            ($"tn" + $"fp").cast("double") *
            ($"tn" + $"fn").cast("double")), 6).as("mcc"),
        round(($"tp".cast("double") / ($"tp" + $"fn") +
          $"tn".cast("double") / ($"tn" + $"fp")) / 2, 6)
          .as("balanced_acc"),
        round($"tp".cast("double") / ($"tp" + $"fn") +
          $"tn".cast("double") / ($"tn" + $"fp") - 1.0, 6).as("youden_j"))
  }

  val mccSql: String =
    s"""WITH $scoredSql,
      |c AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN y = 1 AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN y = 0 AND score <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      |    CAST(SUM(CASE WHEN y = 0 AND score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN y = 1 AND score <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      |  FROM scored)
      |SELECT tp, tn, fp, fn,
      |  ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
      |    - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
      |    / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
      |      * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6) AS mcc,
      |  ROUND((CAST(tp AS DOUBLE) / (tp + fn)
      |    + CAST(tn AS DOUBLE) / (tn + fp)) / 2, 6) AS balanced_acc,
      |  ROUND(CAST(tp AS DOUBLE) / (tp + fn)
      |    + CAST(tn AS DOUBLE) / (tn + fp) - 1.0, 6) AS youden_j
      |FROM c""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_eval_bleu" -> bleuSql,
    "q_eval_rouge" -> rougeSql,
    "q_eval_chrf" -> chrfSql,
    "q_eval_mcnemar" -> mcnemarSql,
    "q_eval_lift" -> liftSql,
    "q_text_classify" -> classifySql,
    "q_eval_auc" -> aucSql,
    "q_eval_calibration" -> calibrationSql,
    "q_eval_ece" -> eceSql,
    "q_eval_brier" -> brierSql,
    "q_eval_avgprec" -> avgprecSql,
    "q_eval_f1" -> f1Sql,
    "q_eval_mcc" -> mccSql)
}
