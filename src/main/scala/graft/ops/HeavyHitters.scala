package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Misra–Gries frequent-items summary: a MERGEABLE sketch with AT MOST
  * k counters, completing the approximate-profiling family (HLL distinct
  * counts, GK quantiles) with heavy-hitter detection.
  *
  * Guarantee (Misra–Gries 1982; mergeability per Agarwal et al., PODS
  * 2012 "Mergeable Summaries"): after summarizing a stream of n items,
  * every item with true frequency > n/(k+1) IS present among the
  * counters, and each counter underestimates its item's true count by at
  * most n/(k+1). Both survive arbitrary merge trees, so the result of
  * partial per-partition aggregation + merge keeps the guarantee at any
  * partitioning — the property the spec pins.
  *
  * 100 TB shape: O(k) state per partition, map-side partials, one ≤k-row
  * summary crossing the exchange per partition — the candidate set for
  * an exact confirmation pass that counts ONLY candidate keys (a
  * broadcast semi-join, shuffling ≤k keys), never a full
  * count-all-distinct-values aggregate over a long-tail key column.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all: drains ≤ n/k times over the stream (each drain
        // removes k+1 total count), so amortized O(1) per item
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest counter from all; ≤ k survive and
      // the per-item undercount stays ≤ n/(k+1) (mergeable-summaries
      // offset argument)
      val cut = m.values.toSeq.sortBy(-_).apply(k)
      m.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object HeavyHitters {

  /** Misra–Gries candidate summary of a string column: one row,
    * `item -> lower-bound count`, ≤ k entries. */
  def sketch(items: org.apache.spark.sql.Dataset[String], k: Int): DataFrame =
    items.select(new MisraGries(k).toColumn).toDF("mg")

  private val K = 64

  /** Corpus heavy hitters over the token stream: every token whose true
    * frequency exceeds n/(K+1), with EXACT counts. Two scan-speed
    * passes: (1) the Misra–Gries sketch produces ≤K candidates, with
    * the corpus total n computed in the SAME aggregate; (2) the
    * exact pass counts ONLY candidate tokens (broadcast semi-join —
    * ≤K keys shuffle, the long tail is filtered at the scan). The
    * DuckDB oracle computes true heavy hitters from first principles,
    * so the compare IS the no-false-negative gate the MG theorem
    * promises (the fixture discriminates: the ~30 common corpus words
    * clear the 1/65 threshold, the rare planted near-dup markers fall
    * well under it). */
  def tokensQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode(split(lower($"text"), " ")).as("token"))
    // total count rides the sketch pass (same single aggregate), so the
    // token stream really is scanned exactly twice; n travels with each
    // broadcast candidate row instead of a third scan + crossJoin
    val cand = toks.as[String]
      .select(new MisraGries(K).toColumn, count(lit(1)).as[Long])
      .toDF("mg", "n")
      .select($"n", explode($"mg").as(Seq("token", "lb")))
      .select($"token", $"n")
    toks.join(broadcast(cand), "token")
      .groupBy($"token")
      .agg(count(lit(1)).as("n_occurrences"), max($"n").as("n"))
      .filter($"n_occurrences" > $"n" / (K + 1.0))
      .select($"token", $"n_occurrences",
        round($"n_occurrences".cast("double") / $"n", 6).as("frac"))
      .orderBy($"n_occurrences".desc, $"token")
  }

  val tokensSql: String =
    s"""WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
      |n AS (SELECT COUNT(*) AS n FROM tok)
      |SELECT token, COUNT(*) AS n_occurrences,
      |  ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n), 6) AS frac
      |FROM tok, n GROUP BY token
      |HAVING COUNT(*) > MAX(n) / ${K + 1}.0
      |ORDER BY n_occurrences DESC, token""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_heavy_hitters" -> tokensQ)

  def oracle: Map[String, String] = Map(
    "q_agg_heavy_hitters" -> tokensSql)
}
