package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Per-group embedding centroids over `embeddings` (vec_id, embedding:
  * array<float>, label) — the "domain centroid" primitive a curation
  * pipeline uses for cluster summaries, drift monitoring, and
  * centroid-distance outlier filtering.
  *
  * Scale shape: the naive plan (posexplode → groupBy(group, dim)) ships
  * one row PER VECTOR ELEMENT through the exchange — dim× the corpus.
  * [[VecSum]] instead folds whole vectors into a single (count, dim-width
  * sum) buffer per group map-side, so only (#groups × partitions) buffers
  * cross the shuffle regardless of corpus size — the same bounded-state
  * pattern as [[TopKByScore]].
  *
  * Determinism: elements are quantized to fixed-point micro-units
  * (round(x·10⁶) as long) BEFORE aggregation, so the cross-row sum is
  * exact integer arithmetic — associative and commutative, identical
  * under any partitioning, merge order, or engine. A double sum would
  * differ by ~1e-13 between Spark's partition-order fold and the DuckDB
  * oracle's file-order fold, and rounding the OUTPUT can't hide that
  * when an average lands near a rounding boundary (zero-mean embedding
  * averages concentrate near 0, so boundaries at ±5e-5 get hit — seen
  * at sf0.001). Quantization error is 5e-7 per element, far below any
  * useful centroid resolution; the final divides run the same IEEE
  * double ops on both engines.
  */
object Centroids {

  /** Embedding dimensionality of the staged `embeddings` table — the ONE
    * place the width lives: it sizes the [[VecSum]] buffer and is spliced
    * into both oracle SQLs' `range(1, Dim+1)` bounds, so the aggregator
    * and the oracle can't drift apart. A corpus of a different width
    * fails [[VecSum]]'s per-row require, naming the expected dim. */
  private[ops] val Dim = 64

  /** Vector-sum aggregator over micro-unit vectors: buffer = (n,
    * elementwise long sums). The buffer array is mutated in place
    * (Aggregator contract allows reusing the returned buffer); overflow
    * needs |x̄|·n > 9e12, unreachable for unit-scale embeddings. */
  final class VecSum(dim: Int)
      extends Aggregator[Seq[Long], (Long, Array[Long]), (Long, Seq[Long])] {

    override def zero: (Long, Array[Long]) = (0L, new Array[Long](dim))

    override def reduce(buf: (Long, Array[Long]), v: Seq[Long]): (Long, Array[Long]) = {
      require(v.length == dim, s"expected $dim-dim vector, got ${v.length}")
      val s = buf._2
      var i = 0
      v.foreach { x => s(i) += x; i += 1 }
      (buf._1 + 1, s)
    }

    override def merge(a: (Long, Array[Long]), b: (Long, Array[Long])): (Long, Array[Long]) = {
      val s = a._2
      var i = 0
      while (i < dim) { s(i) += b._2(i); i += 1 }
      (a._1 + b._1, s)
    }

    override def finish(r: (Long, Array[Long])): (Long, Seq[Long]) =
      (r._1, r._2.toSeq)

    override def bufferEncoder: Encoder[(Long, Array[Long])] = ExpressionEncoder()
    override def outputEncoder: Encoder[(Long, Seq[Long])] = ExpressionEncoder()
  }

  object VecSum {
    def column(dim: Int): TypedColumn[Seq[Long], (Long, Seq[Long])] =
      new VecSum(dim).toColumn
  }

  /** embeddings with vectors quantized to micro-units (codegen'd
    * transform — one pass, no UDF). */
  private[ops] def micro(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").withColumn("mv",
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"))

  /** Per-label (n, micro-unit sums) through [[VecSum]] — the shared
    * aggregation stage of [[centroid]] and [[outliers]]: (label,
    * agg:(n, array<long>)), one row per label. */
  private def labelSums(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    micro(s, dir)
      .select($"label".as[Int], $"mv".as[Seq[Long]])
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VecSum.column(Dim).name("agg"))
      .toDF("label", "agg")
  }

  /** Per-label centroid through [[VecSum]] (the scale path), flattened to
    * (label, pos, c, n) rows for the driver compare. The flatten happens
    * AFTER aggregation — posexplode runs over #groups rows, not the
    * corpus. */
  def centroid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    labelSums(s, dir)
      .select($"label", $"agg._1".as("n"), posexplode($"agg._2"))
      .select($"label", $"pos".cast("long").as("pos"),
        ($"col" / lit(1000000.0) / $"n").as("c"), $"n")
      .orderBy($"label", $"pos")
  }

  /** Exact reference plan for the spec: posexplode THEN aggregate —
    * same integer arithmetic, but dim× the exchange volume; kept as the
    * equivalence anchor for [[centroid]], not registered as a query. */
  private[ops] def centroidExploded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    micro(s, dir)
      .select($"label", posexplode($"mv"))
      .groupBy($"label", $"pos")
      .agg((sum($"col") / lit(1000000.0) / count(lit(1))).as("c"),
        count(lit(1)).as("n"))
      .select($"label", $"pos".cast("long").as("pos"), $"c", $"n")
      .orderBy($"label", $"pos")
  }

  /** DuckDB twin: 1-indexed list extract over a positions table, same
    * micro-unit quantization and divide order. */
  val centroidSql: String =
    s"""SELECT label, i - 1 AS pos,
      |  CAST(SUM(CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT)) AS DOUBLE)
      |    / 1000000.0 / COUNT(*) AS c,
      |  COUNT(*) AS n
      |FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(i)
      |GROUP BY label, i ORDER BY label, pos""".stripMargin

  /** Centroid-distance outlier detection: per label, the 5 vectors
    * farthest (squared L2) from their label centroid — the curation op
    * that surfaces mislabeled / off-distribution samples. Centroids are
    * the exact fixed-point [[VecSum]] result (tiny: #labels × dim),
    * broadcast against the corpus; the distance is a per-row
    * left-to-right fold over identical IEEE ops on both engines, so
    * even ranking ties are impossible to misorder; per-label top-5 goes
    * through the bounded [[TopKByScore]] aggregator (≤5 rows of partial
    * state map-side), NOT a rank window that would ship every distance
    * to one task per label. */
  def outliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val cents = labelSums(s, dir)
      .select($"label",
        expr("transform(agg._2, m -> cast(m as double) / 1000000.0 / agg._1)").as("cv"))
    val scored = t(s, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .join(broadcast(cents), "label")
      .withColumn("diff", expr("zip_with(v, cv, (x, c) -> x - c)"))
      .withColumn("d2", call_function("vec_dot", $"diff", $"diff"))
    Similarity.topkByKey(scored, k = 5, keyCol = "label",
      scoreCol = "d2", scoreName = "d2", rankName = "rk")
  }

  /** DuckDB twin: same micro-unit centroid, same left-to-right distance
    * fold (list_reduce seeds from the first element; 0.0 + x ≡ x, so the
    * fp op sequence matches vec_dot exactly). */
  val outliersSql: String =
    s"""WITH m AS (
      |  SELECT label, i,
      |    SUM(CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT)) AS s,
      |    COUNT(*) AS n
      |  FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(i) GROUP BY label, i),
      |c AS (
      |  SELECT label, list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cv
      |  FROM m GROUP BY label),
      |d AS (
      |  SELECT e.label, e.vec_id,
      |    list_reduce(list_transform(range(1, ${Dim + 1}),
      |        i -> (e.embedding[i]::DOUBLE - c.cv[i]) * (e.embedding[i]::DOUBLE - c.cv[i])),
      |      (a, b) -> a + b) AS d2
      |  FROM embeddings e JOIN c USING (label)),
      |r AS (
      |  SELECT label, vec_id, d2,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id) AS rk
      |  FROM d)
      |SELECT label, vec_id, ROUND(d2, 6) AS d2, CAST(rk AS INT) AS rk
      |FROM r WHERE rk <= 5 ORDER BY label, rk""".stripMargin

  /** q_embed_label_sim entry: pairwise cosine similarity between the
    * per-label centroids — the cluster-confusability matrix ("which
    * label pairs are near-duplicates in embedding space?") read before
    * merging taxonomy classes or diagnosing a classifier's confusion
    * hot-spots.
    *
    * Scale shape: the corpus-sized work is the ONE [[VecSum]] pass that
    * [[centroid]] already pays (bounded per-partition buffers); the
    * pairwise stage is |labels|² cells over the tiny centroid frame —
    * a documented bounded broadcast NLJ (label_a < label_b), never a
    * corpus×corpus product. Cosine runs on the exact fixed-point
    * centroids with one shared left-to-right fold per side, so both
    * engines divide identical doubles; rounded to 6 dp. */
  def labelSimQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val cents = labelSums(s, dir)
      .select($"label",
        expr("transform(agg._2, m -> cast(m as double) / 1000000.0 / agg._1)").as("cv"))
    val a = cents.select($"label".as("label_a"), $"cv".as("va"))
    val b = cents.select($"label".as("label_b"), $"cv".as("vb"))
    a.join(broadcast(b), $"label_a" < $"label_b")
      .select($"label_a", $"label_b",
        round(call_function("vec_dot", $"va", $"vb") /
          (sqrt(call_function("vec_dot", $"va", $"va")) *
            sqrt(call_function("vec_dot", $"vb", $"vb"))), 6).as("cosine"))
      .orderBy($"label_a", $"label_b")
  }

  /** DuckDB twin: same micro-unit centroids; list_reduce seeds from the
    * first element (0.0 + x ≡ x), matching vec_dot's fold order. */
  val labelSimSql: String =
    s"""WITH m AS (
      |  SELECT label, i,
      |    SUM(CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT)) AS s,
      |    COUNT(*) AS n
      |  FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(i) GROUP BY label, i),
      |c AS (
      |  SELECT label, list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cv
      |  FROM m GROUP BY label)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  ROUND(
      |    list_reduce(list_transform(range(1, ${Dim + 1}),
      |      i -> a.cv[i] * b.cv[i]), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
      |        i -> a.cv[i] * a.cv[i]), (x, y) -> x + y))
      |      * sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
      |          i -> b.cv[i] * b.cv[i]), (x, y) -> x + y))), 6) AS cosine
      |FROM c a JOIN c b ON a.label < b.label
      |ORDER BY label_a, label_b""".stripMargin

  /** q_embed_silhouette entry: per-label centroid-based silhouette —
    * for each vector, a = distance to its OWN label centroid, b =
    * distance to the NEAREST OTHER centroid, s = (b−a)/max(a,b);
    * averaged per label. The clustering-quality score read next to
    * [[labelSimQ]]'s confusability matrix: s → 1 means tight separated
    * labels, s ≤ 0 means the label overlaps a neighbor.
    *
    * Centroid-based (medoid-free) ON PURPOSE: the textbook silhouette
    * is O(n²) pairwise distances — impossible at corpus scale — while
    * the centroid variant is ONE map-only pass: the ≤|labels| exact
    * fixed-point centroids ride a broadcast 1-row frame, each row
    * computes its |labels| distances inside higher-order expressions
    * (no explode — the row count never multiplies), and the per-label
    * average is a combinable groupBy. Distances are shared
    * left-to-right IEEE folds; per-row s rounds to 9 dp and sums as
    * DECIMAL(28,9) (order-independent), avg rounds to 6. */
  def silhouetteQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = labelSums(s, dir)
      .select($"label".as("clabel"),
        expr("transform(agg._2, m -> cast(m as double) / 1000000.0 / agg._1)").as("cv"))
    val centsRow = cents.agg(
      collect_list(struct($"clabel", $"cv")).as("cs"))
    t(s, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .crossJoin(broadcast(centsRow))
      .withColumn("dists", expr(
        """transform(cs, c -> struct(c.clabel AS clabel,
          |  sqrt(aggregate(zip_with(v, c.cv, (x, y) -> (x - y) * (x - y)),
          |    0d, (acc, e) -> acc + e)) AS d))""".stripMargin))
      .withColumn("a", expr("filter(dists, d -> d.clabel = label)[0].d"))
      .withColumn("b", expr(
        "array_min(transform(filter(dists, d -> d.clabel != label), d -> d.d))"))
      .select($"label",
        round(($"b" - $"a") / greatest($"a", $"b"), 9)
          .cast("decimal(28,9)").as("s"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        round(sum($"s").cast("double") / count(lit(1)), 6).as("avg_silhouette"))
      .orderBy($"label")
  }

  /** DuckDB twin: same micro-unit centroids; the 10-way expansion the
    * Spark side avoids is fine at oracle scale. */
  val silhouetteSql: String =
    s"""WITH m AS (
      |  SELECT label, i,
      |    SUM(CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT)) AS s,
      |    COUNT(*) AS n
      |  FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(i) GROUP BY label, i),
      |c AS (
      |  SELECT label AS clabel, list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cv
      |  FROM m GROUP BY label),
      |d AS (
      |  SELECT e.vec_id, e.label, c.clabel,
      |    sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
      |      i -> (e.embedding[i]::DOUBLE - c.cv[i]) * (e.embedding[i]::DOUBLE - c.cv[i])),
      |      (x, y) -> x + y)) AS dist
      |  FROM embeddings e CROSS JOIN c),
      |ab AS (
      |  SELECT vec_id, label,
      |    MIN(CASE WHEN clabel = label THEN dist END) AS a,
      |    MIN(CASE WHEN clabel <> label THEN dist END) AS b
      |  FROM d GROUP BY 1, 2)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
      |  ROUND(CAST(SUM(CAST(ROUND((b - a) / GREATEST(a, b), 9)
      |    AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6) AS avg_silhouette
      |FROM ab GROUP BY label ORDER BY label""".stripMargin

  /** q_semdedup_prune entry: SemDeDup-style semantic redundancy pruning
    * (Abbas et al. 2023, arXiv:2303.09540) — within each embedding
    * cluster (the staged `label`), the vectors CLOSEST to the cluster
    * centroid carry the least marginal information, so the top 10% by
    * centroid cosine are marked for removal. The semantic complement of
    * [[outliers]] (which surfaces the FARTHEST points as mislabeled):
    * one operator trims redundancy, the other trims noise — together
    * they bracket the within-cluster keep band a curation run uses.
    *
    * Scale shape: identical to [[outliers]] — exact fixed-point
    * centroids (one [[VecSum]] pass) broadcast against the corpus, the
    * cosine is a shared left-to-right IEEE fold per row; the 10% cut is
    * a label-partition-bounded rank window over (cosine desc, vec_id)
    * with an exact integer prune count (n div 10), so ties are
    * deterministic and both engines cut identically. */
  def semDedupQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val cents = labelSums(s, dir)
      .select($"label", $"agg._1".as("n"),
        expr("transform(agg._2, m -> cast(m as double) / 1000000.0 / agg._1)").as("cv"))
    t(s, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .join(broadcast(cents), "label")
      .withColumn("cos",
        call_function("vec_dot", $"v", $"cv") /
          (sqrt(call_function("vec_dot", $"v", $"v")) *
            sqrt(call_function("vec_dot", $"cv", $"cv"))))
      .withColumn("rk", row_number().over(Window.partitionBy($"label")
        .orderBy($"cos".desc, $"vec_id")))
      .filter($"rk" <= expr("n div 10"))
      .select($"label", $"vec_id", $"rk".cast("int").as("rk"),
        round($"cos", 6).as("cos_centroid"))
      .orderBy($"label", $"rk")
  }

  /** DuckDB twin: same micro-unit centroids and fold order as
    * [[outliersSql]], cosine instead of squared distance, rank
    * ascending-by-redundancy. */
  val semDedupSql: String =
    s"""WITH m AS (
      |  SELECT label, i,
      |    SUM(CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT)) AS s,
      |    COUNT(*) AS n
      |  FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(i) GROUP BY label, i),
      |c AS (
      |  SELECT label, MAX(n) AS n,
      |    list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY i) AS cv
      |  FROM m GROUP BY label),
      |d AS (
      |  SELECT e.label, e.vec_id, c.n,
      |    list_reduce(list_transform(range(1, ${Dim + 1}),
      |        i -> e.embedding[i]::DOUBLE * c.cv[i]), (x, y) -> x + y)
      |    / (sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
      |        i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y))
      |      * sqrt(list_reduce(list_transform(range(1, ${Dim + 1}),
      |          i -> c.cv[i] * c.cv[i]), (x, y) -> x + y))) AS cos
      |  FROM embeddings e JOIN c USING (label)),
      |r AS (
      |  SELECT label, vec_id, n, cos,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS rk
      |  FROM d)
      |SELECT label, vec_id, CAST(rk AS INT) AS rk, ROUND(cos, 6) AS cos_centroid
      |FROM r WHERE rk <= n // 10 ORDER BY label, rk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_centroid" -> centroid,
    "q_embed_outlier" -> outliers,
    "q_embed_silhouette" -> silhouetteQ,
    "q_embed_label_sim" -> labelSimQ,
    "q_semdedup_prune" -> semDedupQ)

  def oracle: Map[String, String] = Map(
    "q_embed_centroid" -> centroidSql,
    "q_embed_outlier" -> outliersSql,
    "q_embed_silhouette" -> silhouetteSql,
    "q_embed_label_sim" -> labelSimSql,
    "q_semdedup_prune" -> semDedupSql)
}
