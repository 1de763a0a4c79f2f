package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Substring duplicate-span REMOVAL — the acting complement of
  * [[Dedup.substringSpans]]'s detection. Detection tells you which
  * passages are shared verbatim across documents; a training-data
  * pipeline then has to actually CUT them (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022 removes all
  * but one occurrence of every long duplicated substring) and re-chunk
  * the survivors for the tokenizer.
  *
  * Policy (deterministic, order-free): for every duplicated k-gram the
  * canonical owner is the SMALLEST doc_id containing it; a char
  * position is removable in doc d iff it is covered by a cross-document
  * k-gram whose owner is ≠ d. The owner keeps its copy, every other doc
  * loses it — so each duplicated passage survives exactly once
  * corpus-wide, and the policy needs no tie-breaking randomness.
  *
  * Pipeline:
  *   1. k-gram starts (one `transform(sequence, substring)` per doc —
  *      the array materializes transiently inside the row) → posexplode
  *      to (doc, pos, gram).
  *   2. One exchange keyed on the gram: `min(doc_id) ≠ max(doc_id)`
  *      marks cross-doc grams, `doc_id > min(doc_id)` marks the
  *      non-owner occurrences (same single window pass).
  *   3. Per doc, removable START positions merge into maximal char
  *      intervals. Unlike detection's consecutive-position islands,
  *      starts here can be SPARSE (ownership flips gram by gram), so
  *      the merge is gap-tolerant: windows [q, q+k) overlap iff the
  *      next start is ≤ k away, so a new interval begins exactly when
  *      `pos − lag(pos) > k` — a lag flag + running sum, the standard
  *      distributed interval-union shape.
  *   4. Intervals shorter than 2k chars are kept (isolated k-gram
  *      coincidences, same floor as detection); the rest are cut.
  *
  * The oracle-checked output is the per-doc accounting contract —
  * spans removed, chars removed/kept, post-removal chunk count at 512
  * chars — all pure BIGINT arithmetic (no FP anywhere, driver-hash
  * safe). The actual text surgery ([[cleaned]]) is exercised by the
  * spec, which reconstructs every cleaned document and proves
  * `length(clean_text) == chars_kept` and that cross-document
  * duplication strictly shrinks.
  *
  * Scale: volume is O(total chars) gram rows shuffled twice (once by
  * gram, once by doc_id) — documents themselves never shuffle; the
  * interval merge sees only the duplicated fraction. At 100 TB both
  * exchanges are the same shape as the detection pass the pipeline
  * already pays; text reconstruction is a per-row lambda over the
  * doc's own span list (≤ dozens of entries), no extra exchange.
  */
object SpanRemoval {

  private val K = 40 // chars per gram — see Dedup.substringSpans' k study
  private val MinCut = 2 * K // only spans ≥ 2k chars are removed
  private val Chunk = 512 // re-chunk width for the post-removal count

  /** (doc_id, pos, gram) — 1-based k-gram start positions. */
  private def grams(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs) // §2.5 scan-parallelism guard (see
      // Dedup.substringSpans — same single-scan-partition finding)
      .select(col("doc_id"), lower(col("text")).as("txt"))
      .filter(length(col("txt")) >= K)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, length(txt) - ${K - 1}), i -> substring(txt, i, $K))"))
        .as(Seq("idx", "gram")))
      .select(col("doc_id"), (col("idx") + 1).cast("long").as("pos"), col("gram"))

  /** Maximal removable char intervals per doc:
    * (doc_id, rm_start, rm_len), rm_len ≥ 2k. */
  def removalSpans(docs: DataFrame): DataFrame = {
    val wg = Window.partitionBy(col("gram"))
    val removable = grams(docs)
      .withColumn("own", min(col("doc_id")).over(wg))
      .withColumn("mx", max(col("doc_id")).over(wg))
      .filter(col("own") =!= col("mx") && col("doc_id") > col("own"))
      .select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    removable
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wd) > K, 1).otherwise(0))
      .withColumn("isl", sum(col("brk")).over(wd))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("rm_start"),
        (max(col("pos")) - min(col("pos")) + K).as("rm_len"))
      .filter(col("rm_len") >= MinCut)
      .select(col("doc_id"), col("rm_start"), col("rm_len"))
  }

  /** Documents with removable spans cut out (lower-cased basis — the
    * same normalization the grams were built over). Spec-verified
    * against the accounting contract; not oracle-registered (string
    * reconstruction in SQL would re-test the same arithmetic with less
    * precision). */
  def cleaned(docs: DataFrame): DataFrame = {
    val spans = removalSpans(docs)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("rm_start"), col("rm_len"))))
        .as("spans"))
    docs
      .join(spans, Seq("doc_id"), "left")
      .withColumn("txt", lower(col("text")))
      .withColumn("clean_text",
        when(col("spans").isNull, col("txt")).otherwise(expr(
          """concat(
            |  aggregate(spans, named_struct('cur', 1L, 'acc', ''),
            |    (s, x) -> named_struct(
            |      'cur', x.rm_start + x.rm_len,
            |      'acc', concat(s.acc,
            |        substring(txt, cast(s.cur as int),
            |                  cast(x.rm_start - s.cur as int)))),
            |    s -> s.acc),
            |  substring(txt, cast(element_at(spans, -1).rm_start
            |                      + element_at(spans, -1).rm_len as int),
            |            2147483647))""".stripMargin)))
      .select(col("doc_id"), col("clean_text"))
  }

  /** q_dedup_span_removal: the per-doc accounting contract. */
  def removalQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val per = removalSpans(docs)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("s_n"), sum($"rm_len").as("s_chars"))
    docs.select($"doc_id", length($"text").cast("long").as("n0"))
      .join(per, Seq("doc_id"), "left")
      .withColumn("chars_removed", coalesce($"s_chars", lit(0L)))
      .select($"doc_id",
        coalesce($"s_n", lit(0L)).as("n_spans"),
        $"chars_removed",
        ($"n0" - $"chars_removed").as("chars_kept"),
        expr(s"(n0 - chars_removed + ${Chunk - 1}) div $Chunk").as("n_chunks"))
      .orderBy($"doc_id")
  }

  val removalSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, lower(text) AS txt FROM documents
      |  WHERE length(text) >= $K),
      |u AS (SELECT doc_id, txt,
      |        unnest(generate_series(1, length(txt) - ${K - 1})) AS pos FROM d),
      |g AS (SELECT doc_id, pos,
      |        substr(txt, CAST(pos AS INT), $K) AS gram FROM u),
      |o AS (SELECT doc_id, pos,
      |        min(doc_id) OVER (PARTITION BY gram) AS own,
      |        max(doc_id) OVER (PARTITION BY gram) AS mx FROM g),
      |r AS (SELECT doc_id, pos FROM o WHERE own <> mx AND doc_id > own),
      |f AS (SELECT doc_id, pos,
      |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
      |                  > $K THEN 1 ELSE 0 END AS brk FROM r),
      |i AS (SELECT doc_id, pos,
      |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM f),
      |sp AS (SELECT doc_id, CAST(max(pos) - min(pos) + $K AS BIGINT) AS rm_len
      |       FROM i GROUP BY doc_id, isl
      |       HAVING max(pos) - min(pos) + $K >= $MinCut),
      |acc AS (SELECT doc_id, COUNT(*) AS n_spans,
      |          CAST(SUM(rm_len) AS BIGINT) AS chars_removed
      |        FROM sp GROUP BY doc_id)
      |SELECT dd.doc_id,
      |  CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(COALESCE(a.chars_removed, 0) AS BIGINT) AS chars_removed,
      |  CAST(length(dd.text) - COALESCE(a.chars_removed, 0) AS BIGINT)
      |    AS chars_kept,
      |  (length(dd.text) - COALESCE(a.chars_removed, 0) + ${Chunk - 1})
      |    // $Chunk AS n_chunks
      |FROM documents dd LEFT JOIN acc a USING (doc_id)
      |ORDER BY dd.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_span_removal" -> removalQ)

  def oracle: Map[String, String] = Map(
    "q_dedup_span_removal" -> removalSql)
}
