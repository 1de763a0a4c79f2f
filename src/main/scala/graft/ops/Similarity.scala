package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Similarity search over `embeddings` (vec_id, embedding: array<float>,
  * label) — approximate-nearest-neighbor for a training-data pipeline.
  *
  * Brute-force top-k (the correctness baseline): broadcast the (small,
  * bounded) query set against the corpus, score with codegen'd
  * higher-order functions (zip_with + aggregate — no UDF, no explode),
  * then per-query top-k. The ORDER BY under a LIMIT plans as
  * TakeOrderedAndProject per partition + merge — there is never a global
  * sort of all scores, so the shape is: corpus scan → map (score) →
  * per-partition heap → driver merge of k×partitions rows. At 100 TB the
  * corpus never shuffles at all.
  *
  * ANN variant (the scale path): signed-random-projection LSH — 8 tables
  * of 3-bit SimHash buckets from deterministic pseudo-random hyperplanes
  * (hash-derived ±1 components, no RNG state to ship). Each corpus vector
  * lands in 4 buckets; candidates are corpus vectors sharing ANY table's
  * bucket with the query, scored exactly and top-k'd. The bucket join is
  * an equi-join on (table, bucket) — candidate count scales with bucket
  * occupancy, not n², and the per-table fanout is a constant 4 rows per
  * vector. Not oracle-checkable (approximate by construction); its
  * recall vs brute force is asserted in SimilaritySpec.
  *
  * Float determinism: all arithmetic is double (floats widened exactly),
  * folds run left-to-right from a 0.0 seed — bit-identical to the DuckDB
  * oracle's list_reduce chain, so even ties order identically.
  */
object Similarity {

  private val dotExpr =
    "aggregate(zip_with(qv, v, (x, y) -> x * y), 0d, (acc, p) -> acc + p)"
  private val normExpr =
    "sqrt(aggregate(v, 0d, (acc, x) -> acc + x * x))"

  /** embeddings with the float vector widened to double (exact). */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", expr(normExpr))

  /** Cosine top-10 of every corpus vector (vec_id ≥ 10) for each query
    * vector (vec_id < 10). */
  def topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val c = e.filter($"vec_id" >= 10).select($"vec_id", $"v", $"nrm")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    c.join(broadcast(q)) // cartesian with a bounded broadcast query set
      .withColumn("cos", expr(dotExpr) / ($"qn" * $"nrm"))
      .select($"query_id", $"vec_id", $"cos",
        row_number().over(w).as("rn"))
      .filter($"rn" <= 10)
      .select($"query_id", $"vec_id", round($"cos", 6).as("score"), $"rn")
      .orderBy($"query_id", $"rn")
  }

  val topkSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |                     (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e WHERE vec_id < 10),
      |c AS (SELECT vec_id, v, nrm FROM e WHERE vec_id >= 10),
      |sc AS (
      |  SELECT query_id, vec_id,
      |    list_reduce(list_transform(range(1, 65), i -> qv[i] * v[i]),
      |                (a, b) -> a + b) / (qn * nrm) AS cos
      |  FROM q, c),
      |rk AS (
      |  SELECT query_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
      |  FROM sc)
      |SELECT query_id, vec_id, ROUND(cos, 6) AS score, rn
      |FROM rk WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  /** Deterministic ±1 hyperplane component for (table t, bit p, dim i):
    * parity of xxhash64 — reproducible on every executor with no
    * broadcast of model state. */
  private val planesExpr = // bucket per table: 3 sign bits packed to 0..7
    """transform(sequence(0, 7), tb -> struct(
      |  tb AS tbl,
      |  aggregate(sequence(0, 2), 0, (acc, p) -> acc * 2 + CASE WHEN
      |    aggregate(sequence(0, 63), 0d, (a, i) ->
      |      a + element_at(v, i + 1) *
      |          CASE WHEN pmod(xxhash64(tb, p, i), 2) = 0 THEN 1d ELSE -1d END
      |    ) >= 0d THEN 1 ELSE 0 END) AS bucket))""".stripMargin

  /** ANN top-10 via SimHash bucket candidates (8 tables × 3 bits).
    * Rows-only check downstream; recall asserted in SimilaritySpec. */
  def ann(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir).withColumn("bk", explode(expr(planesExpr)))
      .select($"vec_id", $"v", $"nrm", $"bk.tbl", $"bk.bucket")
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"),
        $"tbl", $"bucket")
    val c = e.filter($"vec_id" >= 10)
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    c.join(broadcast(q), Seq("tbl", "bucket")) // candidates: shared bucket
      .select($"query_id", $"vec_id", $"qv", $"v", $"qn", $"nrm").distinct()
      .withColumn("cos", expr(dotExpr) / ($"qn" * $"nrm"))
      .select($"query_id", $"vec_id", $"cos", row_number().over(w).as("rn"))
      .filter($"rn" <= 10)
      .select($"query_id", $"vec_id", round($"cos", 6).as("score"), $"rn")
      .orderBy($"query_id", $"rn")
  }

  // --- registry -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_similarity_topk" -> topk,
    "q_similarity_ann" -> ann)

  /** q_similarity_ann is approximate → no SQL oracle (driver records the
    * weaker rows-only check); recall is spec-asserted instead. */
  def oracle: Map[String, String] = Map(
    "q_similarity_topk" -> topkSql)
}
