package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Embedding quantization — symmetric per-vector int8, the storage
  * format a 100 TB-class ANN system actually persists (4× smaller than
  * float32, and int8 dot products are the fast path on every modern
  * CPU/GPU). Per vector: scale = 127/max|x|, qᵢ = ⌊xᵢ·scale + 0.5⌋,
  * reconstruction error |xᵢ − qᵢ/scale| ≤ 0.5/scale by construction.
  *
  * Determinism notes:
  *  - rounding is the explicit `floor(x·scale + 0.5)` (identical IEEE
  *    ops on both engines) rather than `round()`, whose half-way rule
  *    is implementation-defined across engines;
  *  - the reported aggregates are order-independent (min/max over ints
  *    and doubles, an exact integer |q| sum) — no float addition whose
  *    order could differ between Spark's partial aggregation and the
  *    oracle's sequential fold.
  *
  * Scale shape: pure map — one row in, one row out, zero exchange; at
  * 100 TB this runs at scan speed and is the preprocessing step in
  * front of [[Similarity]]'s index builds.
  */
object Quantize {

  /** Per-vector quantization accounting: dims, scale, q range, exact
    * Σ|qᵢ|, and the max reconstruction error. */
  def quantizeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("scale",
        lit(127.0) / greatest(expr("array_max(transform(v, x -> abs(x)))"), lit(1e-12)))
      .withColumn("qv", expr("transform(v, x -> cast(floor(x * scale + 0.5) as int))"))
      .withColumn("errs", expr("transform(v, x -> abs(x - floor(x * scale + 0.5) / scale))"))
      .select($"vec_id",
        size($"v").as("n_dims"),
        round($"scale", 6).as("scale"),
        expr("array_min(qv)").as("q_min"),
        expr("array_max(qv)").as("q_max"),
        expr("aggregate(qv, 0L, (a, x) -> a + abs(cast(x as bigint)))").as("q_abs_sum"),
        round(expr("array_max(errs)"), 6).as("max_err"))
      .orderBy($"vec_id")
      .limit(300)
  }

  val quantizeSql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |           FROM embeddings),
      |m AS (SELECT vec_id, v,
      |  127.0 / GREATEST(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 1e-12) AS scale
      |  FROM e),
      |q AS (SELECT vec_id, v, scale,
      |  list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INT)) AS qv,
      |  list_transform(v, x -> abs(x - floor(x * scale + 0.5) / scale)) AS errs FROM m)
      |SELECT vec_id, CAST(LEN(v) AS INT) AS n_dims, ROUND(scale, 6) AS scale,
      |  CAST(list_aggregate(qv, 'min') AS INT) AS q_min,
      |  CAST(list_aggregate(qv, 'max') AS INT) AS q_max,
      |  CAST(list_aggregate(list_transform(qv, x -> CAST(abs(x) AS BIGINT)), 'sum') AS BIGINT) AS q_abs_sum,
      |  ROUND(list_aggregate(errs, 'max'), 6) AS max_err
      |FROM q ORDER BY vec_id LIMIT 300""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_quantize" -> quantizeQ)

  def oracle: Map[String, String] = Map(
    "q_embed_quantize" -> quantizeSql)
}
