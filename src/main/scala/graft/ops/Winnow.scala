package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every char k-gram, slide a
  * window of w consecutive hashes, and select each window's MINIMUM.
  * The selection guarantee is what mod-p sampling
  * ([[Text.rollhash]]-style) cannot give: any shared substring of
  * length ≥ w + k − 1 contributes at least one IDENTICAL selected
  * fingerprint in both documents, while only ~2/(w+1) of all gram
  * hashes are kept — detection is guaranteed, volume is throttled.
  *
  * q_text_winnow reports the top document pairs by shared winnowed
  * fingerprints with their fingerprint-set Jaccard — the copy-detection
  * readout — restricted to INFORMATIVE fingerprints (document
  * frequency 2..50): df=1 prints pair with nothing, and boilerplate
  * prints shared by hundreds of docs would quadratically flood the
  * pair join exactly like a hot LSH band; the df cap is the same
  * frequent-gram discipline as [[Dedup]]'s containment probe.
  *
  * Scale shape: gram hashing and window-min selection are pure per-row
  * array expressions inside whole-stage codegen (no shuffle, no UDF);
  * only the ~2/(w+1)·chars selected prints reach the exchange, and the
  * pair join's candidate volume is Σ_print df² with df ≤ 50 — bounded
  * by duplicate density, never all-pairs. Determinism: integer
  * polynomial hashes mod 1e9+7; set (value) semantics for selection —
  * no positional tie-break to keep cross-engine parity trivial — and a
  * strict (shared DESC, doc_a, doc_b) output order. */
object Winnow {

  private val K = graft.functions.WinnowPrints.K.toInt // char-gram length
  private val W = graft.functions.WinnowPrints.W.toInt // winnow window
  private val P = graft.functions.WinnowPrints.Mod
  private val DfCapLo = 2
  private val DfCapHi = 50

  /** (doc_id, print) pairs: distinct window-min gram hashes per doc,
    * via the native [[graft.functions.WinnowPrints]] codegen pass
    * (O(chars) rolling hash + deque window-min; the higher-order
    * transform/aggregate equivalent is interpreted and was 40× slower
    * at sf0.1). */
  private def prints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "documents")
      .filter(length($"text") >= K + W - 1)
      .select($"doc_id", explode(expr("winnow_prints(text)")).as("print"))
  }

  /** q_text_winnow entry: top-40 doc pairs by shared informative
    * winnowed fingerprints, with per-doc print counts and Jaccard. */
  def winnowQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pr = prints(s, dir)
    val informative = pr.groupBy($"print")
      .agg(count(lit(1)).as("df"))
      .filter($"df".between(DfCapLo, DfCapHi))
      .select($"print")
    val pri = pr.join(informative, "print")
    val pp = pri.groupBy($"doc_id").agg(count(lit(1)).as("np"))
    pri.as("a").join(pri.as("b"),
        $"a.print" === $"b.print" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(pp.select($"doc_id".as("doc_a"), $"np".as("prints_a")), "doc_a")
      .join(pp.select($"doc_id".as("doc_b"), $"np".as("prints_b")), "doc_b")
      .select($"doc_a", $"doc_b", $"shared", $"prints_a", $"prints_b",
        round($"shared".cast("double") /
          ($"prints_a" + $"prints_b" - $"shared"), 6).as("jaccard"))
      .orderBy($"shared".desc, $"doc_a", $"doc_b")
      .limit(40)
  }

  val winnowSql: String =
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_transform(range(1, length(text) - ${K - 2}), i ->
       |      list_reduce(
       |        list_transform(range(i, i + $K), j -> ascii(text[j:j])::BIGINT),
       |        (h, c) -> (h * 31 + c) % $P)) AS hs
       |  FROM documents
       |  WHERE length(text) - ${K - 1} >= $W),
       |pr AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, print
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(range(1, len(hs) - ${W - 2}),
       |            i -> list_min(hs[i:i + ${W - 1}]))) AS print
       |        FROM g)),
       |informative AS MATERIALIZED (
       |  SELECT print FROM pr GROUP BY print
       |  HAVING COUNT(*) BETWEEN $DfCapLo AND $DfCapHi),
       |pri AS MATERIALIZED (SELECT pr.* FROM pr JOIN informative USING (print)),
       |pp AS MATERIALIZED (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS np FROM pri GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS shared
       |  FROM pri a JOIN pri b
       |    ON a.print = b.print AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared, pa.np AS prints_a, pb.np AS prints_b,
       |  ROUND(CAST(shared AS DOUBLE) / (pa.np + pb.np - shared), 6) AS jaccard
       |FROM pairs
       |  JOIN pp pa ON pa.doc_id = doc_a
       |  JOIN pp pb ON pb.doc_id = doc_b
       |ORDER BY shared DESC, doc_a, doc_b LIMIT 40""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_winnow" -> winnowQ)

  def oracle: Map[String, String] = Map(
    "q_text_winnow" -> winnowSql)
}
