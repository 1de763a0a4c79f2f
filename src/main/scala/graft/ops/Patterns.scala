package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Sequential-pattern detection over per-key event histories — the
  * MATCH_RECOGNIZE-style analytics a funnel/behavior pipeline runs
  * (Spark has no MATCH_RECOGNIZE; the idiomatic rebuild encodes each
  * key's ordered history as a compact string and matches patterns with
  * the codegen'd regex engine).
  *
  * Encoding: one letter per event type, concatenated in (ts, event_id)
  * order — `signup view view purchase` → "svvp". Any regular pattern
  * over the alphabet then runs at string speed: "s.*p" = signup
  * eventually followed by purchase, "e{3,}" = 3+ consecutive errors.
  *
  * Scale shape: ONE groupBy(user) building the history string via
  * sort_array(collect_list(struct(ts, event_id, code))) — the struct
  * sort makes the aggregation order-independent (collect_list order is
  * partition-dependent; sorting inside the row restores determinism),
  * so the merge is exact at any partitioning. History length is bounded
  * by per-user activity, not corpus size; the text of events never
  * shuffles (only 1-char codes ride the structs).
  */
object Patterns {

  /** Per-user event-sequence string + pattern flags. */
  def sequenceQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val code = expr("substring(event_type, 1, 1)") // c/e/p/s/v — distinct
    t(s, dir, "events")
      .select($"user_id", struct($"ts", $"event_id", code.as("c")).as("ev"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list($"ev")).as("h"))
      .select($"user_id",
        array_join(expr("transform(h, x -> x.c)"), "").as("seq"))
      .select($"user_id",
        length($"seq").cast("int").as("n_events"),
        $"seq".rlike("s.*p").cast("int").as("signup_to_purchase"),
        $"seq".rlike("e{3,}").cast("int").as("error_burst"),
        regexp_count($"seq", lit("vp")).cast("int").as("view_then_purchase"))
      .filter($"user_id" < 200)
      .orderBy($"user_id")
  }

  val sequenceSql: String =
    """WITH h AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(length(seq) AS INT) AS n_events,
      |  CAST(regexp_matches(seq, 's.*p') AS INT) AS signup_to_purchase,
      |  CAST(regexp_matches(seq, 'e{3,}') AS INT) AS error_burst,
      |  CAST((length(seq) - length(regexp_replace(seq, 'vp', '', 'g'))) // 2 AS INT) AS view_then_purchase
      |FROM h WHERE user_id < 200 ORDER BY user_id""".stripMargin

  /** q_seq_trigrams entry: the corpus-wide top-20 event-type TRIGRAMS
    * (ordered within each user's history) — the third-order extension
    * of [[graft.ops.Behavior]]'s first-order transition matrix, and the
    * n-gram statistic behind next-event prediction baselines and
    * journey-template mining ("view→view→purchase dominates
    * signup→view→purchase").
    *
    * Scale shape: two `lead` windows per user ordered by (ts,
    * event_id) — shards by user, no history strings materialized —
    * then one map-side-combinable groupBy over ≤|types|³ keys. The
    * top-20 cut orders (count desc, trigram) so ties are
    * deterministic. */
  def trigramsQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("t2", lead($"event_type", 1).over(w))
      .withColumn("t3", lead($"event_type", 2).over(w))
      .filter($"t3".isNotNull)
      .select(concat_ws(">", $"event_type", $"t2", $"t3").as("trigram"))
      .groupBy($"trigram")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"trigram")
      .limit(20)
  }

  val trigramsSql: String =
    """WITH s AS (
      |  SELECT event_type AS t1,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t2,
      |    LEAD(event_type, 2) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t3
      |  FROM events)
      |SELECT t1 || '>' || t2 || '>' || t3 AS trigram, COUNT(*) AS n
      |FROM s WHERE t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin

  /** q_seq_stationary entry: the steady-state distribution of the
    * event-type Markov chain — where [[Behavior.transitionsQ]]'s
    * first-order matrix says "what happens NEXT", the stationary π
    * says where the process SPENDS ITS TIME in the long run (π = πP),
    * the summary behind load forecasting and absorbing-state checks.
    * Three unrolled power-iteration steps from the uniform start —
    * enough to converge to 9 dp on a 5-state well-mixed chain, and a
    * fixed unroll is what a chained-CTE oracle can mirror (the
    * [[Graph.pagerankQ]] stance; [[Iterate.fixpoint]] is the
    * production to-convergence form).
    *
    * Determinism contract (pagerank's): transition probabilities and
    * every per-edge term are rounded to 9 dp and SUMMED AS
    * DECIMAL(28,9) — order-independent exact merges — and each new π
    * re-rounds to 9 dp, so both engines iterate on identical doubles.
    *
    * Scale: the chain lives on the |states|² matrix (domain-bounded);
    * the one corpus-sized pass is the consecutive-pair count, which is
    * [[Behavior.transitionsQ]]'s single exchange. */
  def stationaryQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val wSeq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wSrc = Window.partitionBy($"src")
    val p = t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type".as("src"))
      .withColumn("dst", lead($"src", 1).over(wSeq))
      .filter($"dst".isNotNull)
      .groupBy($"src", $"dst")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round($"n".cast("double") / sum($"n").over(wSrc), 9))
      .select($"src", $"dst", $"p")
    val states = p.select($"src".as("state")).distinct()
    var pi = states.withColumn("pi", lit(0.2)) // uniform over 5 states
    for (_ <- 1 to 3) {
      pi = p
        .join(broadcast(pi.withColumnRenamed("state", "src")), "src")
        .select($"dst",
          round($"pi" * $"p", 9).cast("decimal(28,9)").as("c"))
        .groupBy($"dst").agg(sum($"c").as("mass"))
        .select($"dst".as("state"),
          round($"mass".cast("double"), 9).as("pi"))
    }
    pi.select($"state", $"pi").orderBy($"state")
  }

  val stationarySql: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT dst AS state,
         |    ROUND(CAST(SUM(CAST(ROUND(pr.pi * p.p, 9) AS DECIMAL(28,9)))
         |      AS DOUBLE), 9) AS pi
         |  FROM p JOIN $prev pr ON pr.state = p.src
         |  GROUP BY dst)""".stripMargin
    s"""WITH seq AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS dst
      |  FROM events),
      |cnt AS (
      |  SELECT src, dst, COUNT(*) AS n FROM seq
      |  WHERE dst IS NOT NULL GROUP BY 1, 2),
      |p AS (
      |  SELECT src, dst,
      |    ROUND(CAST(n AS DOUBLE)
      |      / SUM(n) OVER (PARTITION BY src), 9) AS p
      |  FROM cnt),
      |pi0 AS (SELECT DISTINCT src AS state, 0.2::DOUBLE AS pi FROM p),
      |${iter("pi0", "pi1")},
      |${iter("pi1", "pi2")},
      |${iter("pi2", "pi3")}
      |SELECT state, pi FROM pi3 ORDER BY state""".stripMargin
  }

  /** q_seq_entropy_rate entry: the ENTROPY RATE of the event-type
    * Markov chain — H = Σ_s π_s · H(next | s) with H(next | s) =
    * −Σ_d P(s,d)·ln P(s,d) — the single number that says how
    * PREDICTABLE user behavior is (0 = deterministic next-step, ln 5 ≈
    * 1.609 = uniform over the 5 types). Session-model fit, anomaly
    * baselines, and compression bounds on event logs all start here;
    * it composes the suite's transition matrix (q_seq_transitions) and
    * stationary distribution (q_seq_stationary) into their canonical
    * scalar summary. Output is one row per state (π, conditional
    * entropy, contribution) so the decomposition is auditable; the
    * rate is the contribution sum (asserted in the spec).
    *
    * Scale shape: the corpus collapses once to the |types|² transition
    * table (one windowed pass + combinable groupBy); the 3-step power
    * iteration and entropy arithmetic run on ≤25-row broadcast frames.
    * Determinism: P and π round to 9 dp as in q_seq_stationary; each
    * −p·ln p term rounds to 9 dp and sums as DECIMAL(28,9). */
  def entropyRateQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val wSeq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wSrc = Window.partitionBy($"src")
    val p = t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type".as("src"))
      .withColumn("dst", lead($"src", 1).over(wSeq))
      .filter($"dst".isNotNull)
      .groupBy($"src", $"dst")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round($"n".cast("double") / sum($"n").over(wSrc), 9))
      .select($"src", $"dst", $"p")
    val states = p.select($"src".as("state")).distinct()
    var pi = states.withColumn("pi", lit(0.2))
    for (_ <- 1 to 3) {
      pi = p
        .join(broadcast(pi.withColumnRenamed("state", "src")), "src")
        .select($"dst",
          round($"pi" * $"p", 9).cast("decimal(28,9)").as("c"))
        .groupBy($"dst").agg(sum($"c").as("mass"))
        .select($"dst".as("state"),
          round($"mass".cast("double"), 9).as("pi"))
    }
    val hCond = p
      .select($"src",
        round(-$"p" * log($"p"), 9).cast("decimal(28,9)").as("t"))
      .groupBy($"src")
      .agg(round(sum($"t").cast("double"), 9).as("h_cond"))
    hCond
      .join(broadcast(pi.withColumnRenamed("state", "src")), "src")
      .select($"src".as("state"), $"pi",
        round($"h_cond", 6).as("h_cond"),
        round($"pi" * $"h_cond", 6).as("contribution"))
      .orderBy($"state")
  }

  val entropyRateSql: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT dst AS state,
         |    ROUND(CAST(SUM(CAST(ROUND(pr.pi * p.p, 9) AS DECIMAL(28,9)))
         |      AS DOUBLE), 9) AS pi
         |  FROM p JOIN $prev pr ON pr.state = p.src
         |  GROUP BY dst)""".stripMargin
    s"""WITH seq AS (
      |  SELECT event_type AS src,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS dst
      |  FROM events),
      |cnt AS (
      |  SELECT src, dst, COUNT(*) AS n FROM seq
      |  WHERE dst IS NOT NULL GROUP BY 1, 2),
      |p AS (
      |  SELECT src, dst,
      |    ROUND(CAST(n AS DOUBLE)
      |      / SUM(n) OVER (PARTITION BY src), 9) AS p
      |  FROM cnt),
      |pi0 AS (SELECT DISTINCT src AS state, 0.2::DOUBLE AS pi FROM p),
      |${iter("pi0", "pi1")},
      |${iter("pi1", "pi2")},
      |${iter("pi2", "pi3")},
      |hc AS (
      |  SELECT src,
      |    ROUND(CAST(SUM(CAST(ROUND(-p * ln(p), 9) AS DECIMAL(28,9)))
      |      AS DOUBLE), 9) AS h_cond
      |  FROM p GROUP BY src)
      |SELECT hc.src AS state, pi3.pi,
      |  ROUND(hc.h_cond, 6) AS h_cond,
      |  ROUND(pi3.pi * hc.h_cond, 6) AS contribution
      |FROM hc JOIN pi3 ON pi3.state = hc.src
      |ORDER BY state""".stripMargin
  }

  /** q_seq_negation entry: NEGATIVE-pattern detection — the CEP
    * semantics the suite's positive A-then-B matcher can't express:
    * `view → click (≤ 30 min) → NO purchase (≤ 30 min after the
    * click)` is the abandoned-funnel pattern, and the negation is the
    * part that matters operationally (a match is an alert/retargeting
    * candidate; MATCH_RECOGNIZE spells it `NOT purchase`). Positive
    * steps are a user-keyed interval join; the negation is a LEFT ANTI
    * join of the matched (view, click) pairs against purchases in the
    * post-click window. Output: per user, total view→click chains,
    * abandoned chains, and the abandonment rate.
    *
    * Scale shape: both joins shuffle on user_id only (the suite's
    * standard interval-join posture; state ∝ rate × window at stream
    * scale, corpus-keyed here); counts are exact and the rate is one
    * IEEE divide. */
  def negationQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("vid"), $"ts".as("vts"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("cid"), $"ts".as("cts"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"))
    val chains = v.join(c, $"user_id" === $"cu" &&
        $"cts" > $"vts" && $"cts" <= $"vts" + expr("INTERVAL 30 MINUTES"))
      .select($"user_id", $"vid", $"cid", $"cts")
    val abandoned = chains.join(p, $"user_id" === $"pu" &&
        $"pts" > $"cts" && $"pts" <= $"cts" + expr("INTERVAL 30 MINUTES"),
        "left_anti")
    chains.groupBy($"user_id").agg(count(lit(1)).as("n_chains"))
      .join(abandoned.groupBy($"user_id")
        .agg(count(lit(1)).as("n_abandoned")), Seq("user_id"), "left")
      .select($"user_id", $"n_chains",
        coalesce($"n_abandoned", lit(0L)).as("n_abandoned"),
        round(coalesce($"n_abandoned", lit(0L)).cast("double") /
          $"n_chains", 6).as("abandon_rate"))
      .orderBy($"user_id")
  }

  val negationSql: String =
    """WITH v AS (
      |  SELECT user_id, event_id AS vid, ts AS vts
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT user_id AS cu, event_id AS cid, ts AS cts
      |  FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id AS pu, ts AS pts
      |  FROM events WHERE event_type = 'purchase'),
      |chains AS (
      |  SELECT user_id, vid, cid, cts
      |  FROM v JOIN c ON user_id = cu
      |    AND cts > vts AND cts <= vts + INTERVAL 30 MINUTE),
      |abandoned AS (
      |  SELECT * FROM chains ch WHERE NOT EXISTS (
      |    SELECT 1 FROM p WHERE pu = ch.user_id
      |      AND pts > ch.cts AND pts <= ch.cts + INTERVAL 30 MINUTE)),
      |na AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_abandoned
      |  FROM abandoned GROUP BY 1)
      |SELECT ch.user_id, CAST(COUNT(*) AS BIGINT) AS n_chains,
      |  COALESCE(MAX(na.n_abandoned), 0) AS n_abandoned,
      |  ROUND(CAST(COALESCE(MAX(na.n_abandoned), 0) AS DOUBLE)
      |    / COUNT(*), 6) AS abandon_rate
      |FROM chains ch LEFT JOIN na ON na.user_id = ch.user_id
      |GROUP BY ch.user_id ORDER BY ch.user_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pattern" -> sequenceQ,
    "q_seq_trigrams" -> trigramsQ,
    "q_seq_stationary" -> stationaryQ,
    "q_seq_entropy_rate" -> entropyRateQ,
    "q_seq_negation" -> negationQ)

  def oracle: Map[String, String] = Map(
    "q_seq_pattern" -> sequenceSql,
    "q_seq_trigrams" -> trigramsSql,
    "q_seq_stationary" -> stationarySql,
    "q_seq_entropy_rate" -> entropyRateSql,
    "q_seq_negation" -> negationSql)
}
