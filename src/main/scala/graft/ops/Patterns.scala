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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pattern" -> sequenceQ,
    "q_seq_trigrams" -> trigramsQ)

  def oracle: Map[String, String] = Map(
    "q_seq_pattern" -> sequenceSql,
    "q_seq_trigrams" -> trigramsSql)
}
