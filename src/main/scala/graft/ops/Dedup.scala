package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Deduplication operators over `documents` — the first-named family of
  * the training-data-pipeline brief.
  *
  * Exact dedup: group on sha256(text). The shuffle key is a 64-char
  * digest, so at 100 TB the exchange moves ~64 bytes/doc instead of the
  * document — the standard content-addressed dedup shape.
  *
  * Near-dup: word 3-shingles → 128-permutation MinHash signature → LSH
  * banding (64 bands × 2 rows) → exact Jaccard verification INSIDE
  * buckets only. The only shuffles are (a) the band-bucket self-join
  * keyed on (band, bandHash) and (b) the shingle-set re-join for
  * verification — never an all-pairs comparison, so the plan survives
  * 100× data (candidate volume scales with true-duplicate density, not
  * with n²).
  *
  * Recall: a pair with Jaccard J collides in a band with prob J², so it
  * is missed with prob (1−J²)^64 — for the J ≥ 0.9 near-dups in this
  * corpus that is ≈1e-46, i.e. the LSH output equals the oracle's exact
  * all-pairs answer (the oracle CAN be all-pairs because sf0.01 is 500
  * docs; the Spark plan is the one you'd run on 10^10 docs).
  */
object Dedup {

  /** Distinct word 3-shingles of `toks`; shared contract with the DuckDB
    * oracle (`array_to_string(toks[i:i+2], ' ')` over 1-based starts). */
  private val shinglesExpr =
    "array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3))))"

  private def shingled(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(shinglesExpr).as("sh"))

  private val shingledSql =
    """WITH dtok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |shing AS (SELECT doc_id,
      |  list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS sh
      |  FROM dtok WHERE len(toks) >= 3)""".stripMargin

  /** Exact dedup under a simulated re-crawl: 10% of the corpus reappears
    * under new doc_ids (the union), and dedup collapses each content
    * group to its smallest doc_id via the sha256 digest. Output is the
    * kept id + copy count per distinct content — non-vacuous (50 groups
    * of 2) without inventing data outside the staged tables. */
  def exact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
    val recrawl = d.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    d.unionByName(recrawl)
      .select($"doc_id", sha2($"text", 256).as("content_sha"))
      .groupBy($"content_sha")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  val exactSql: String =
    """WITH crawl AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT sha256(text) AS content_sha,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM crawl GROUP BY content_sha ORDER BY keep_id""".stripMargin

  /** MinHash lanes and LSH bands, built codegen-first: shingles are
    * EXPLODED and each lane is a native `min(xxhash64(h, j))` aggregate —
    * higher-order array lambdas are interpreted per-row in Spark (no
    * doGenCode), which profiled ~10× slower than this whole-stage-codegen
    * HashAggregate at sf0.1. Each shingle string is hashed once; lane j
    * mixes that 64-bit value with the lane index. Partial aggregation
    * runs map-side, so the shuffle carries one 128-long buffer per doc
    * per partition. */
  private val Lanes = 128
  private val Bands = 64 // × 2 rows/band; collide prob per band = J²

  /** Near-duplicate pairs with exact-verified Jaccard ≥ 0.8.
    * Pipeline: shingle → minhash → band-explode → self-join on
    * (band, bh) → distinct candidate pair → join shingle sets back →
    * exact Jaccard filter. */
  def near(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = shingled(s, dir).cache()
    val laneMins = (0 until Lanes).map(j =>
      min(xxhash64($"h", lit(j))).as(s"s$j"))
    val sig = sh
      .select($"doc_id", explode($"sh").as("shingle"))
      .select($"doc_id", xxhash64($"shingle").as("h"))
      .groupBy($"doc_id")
      .agg(laneMins.head, laneMins.tail: _*)
    val bandCols = (0 until Bands).map(b =>
      struct(lit(b).as("band"), xxhash64(col(s"s${2 * b}"), col(s"s${2 * b + 1}")).as("bh")))
    val bands = sig
      .select($"doc_id", explode(array(bandCols: _*)).as("b"))
      .select($"doc_id", $"b.band", $"b.bh")
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bh" === $"y.bh" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    val j = size(array_intersect($"a.sh", $"b.sh")).cast("double") /
      size(array_union($"a.sh", $"b.sh"))
    cand
      .join(sh.as("a"), $"doc_a" === $"a.doc_id")
      .join(sh.as("b"), $"doc_b" === $"b.doc_id")
      .select($"doc_a", $"doc_b", j.as("jacc"))
      .filter($"jacc" >= 0.8)
      .select($"doc_a", $"doc_b", round($"jacc", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Oracle: exact all-pairs Jaccard (feasible at oracle scale only). */
  val nearSql: String =
    s"""$shingledSql
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  ROUND(CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / LEN(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |FROM shing a JOIN shing b ON a.doc_id < b.doc_id
      |WHERE CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |      / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // --- registry -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> exact,
    "q_dedup_near" -> near)

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" -> exactSql,
    "q_dedup_near" -> nearSql)
}
