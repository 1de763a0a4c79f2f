package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_classify" -> classifyQ)

  def oracle: Map[String, String] = Map(
    "q_text_classify" -> classifySql)
}
