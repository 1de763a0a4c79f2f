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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pattern" -> sequenceQ)

  def oracle: Map[String, String] = Map(
    "q_seq_pattern" -> sequenceSql)
}
