package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA — the top principal component of the embedding
  * corpus via an exact Gram-matrix pass + unrolled power iteration.
  * The dim-reduction / drift-direction primitive: the dominant
  * direction of variance is what you monitor when "the embedding
  * distribution moved", and the projection basis a compaction step
  * uses.
  *
  * Scale shape — the classic two-regime split:
  *  - The CORPUS-sized work is one pass: [[GramSum]] folds whole
  *    micro-unit vectors into a single (n, Σm, Σ m·mᵀ) buffer of
  *    dim + dim² longs per partition (the [[EmbedStats.VecMoments]]
  *    pattern widened to second moments) — the exchange carries
  *    #partitions buffers of ~33 KB, never the corpus, and merge is
  *    elementwise addition in any order.
  *  - Everything AFTER is arithmetic over the dim² = 4096-cell
  *    covariance frame: three matrix-vector products (broadcast
  *    64-row vector, combinable groupBy over 64 groups), exactly the
  *    [[Graph.pagerankQ]] iteration shape.
  *
  * Determinism: vectors quantized to round(x·10⁶) longs BEFORE any
  * sum, so Gram and mean sums are exact integers (order- and
  * engine-independent; max |Σ m_i·m_j| ≈ 2.8e11·n ≪ 2⁵³ at test
  * scale). Covariance, contributions, and norms are shared-order IEEE
  * expressions rounded to 9 dp with DECIMAL(28,9) merges — the
  * pagerank contract — and v₀ = 1/8 (dyadic, exact). Power iteration
  * from a positive start vector fixes the eigenvector sign. */
object Pca {

  private val Dim = 64
  private val iterations = 3

  /** One-pass mean + Gram accumulator over micro-unit vectors:
    * buffer = (n, Σm (dim), row-major Σ m·mᵀ (dim²)). Arrays are
    * mutated in place (Aggregator contract permits buffer reuse). */
  final class GramSum(dim: Int)
      extends Aggregator[Seq[Long], (Long, Array[Long], Array[Long]),
        (Long, Seq[Long], Seq[Long])] {

    override def zero: (Long, Array[Long], Array[Long]) =
      (0L, new Array[Long](dim), new Array[Long](dim * dim))

    override def reduce(b: (Long, Array[Long], Array[Long]), v: Seq[Long])
        : (Long, Array[Long], Array[Long]) = {
      require(v.length == dim, s"expected $dim-dim vector, got ${v.length}")
      val arr = v.toArray
      val (s1, g) = (b._2, b._3)
      var i = 0
      while (i < dim) {
        val mi = arr(i)
        s1(i) += mi
        val row = i * dim
        var j = 0
        while (j < dim) { g(row + j) += mi * arr(j); j += 1 }
        i += 1
      }
      (b._1 + 1, s1, g)
    }

    override def merge(a: (Long, Array[Long], Array[Long]),
        b: (Long, Array[Long], Array[Long]))
        : (Long, Array[Long], Array[Long]) = {
      val (s1, g) = (a._2, a._3)
      var i = 0
      while (i < dim) { s1(i) += b._2(i); i += 1 }
      i = 0
      while (i < dim * dim) { g(i) += b._3(i); i += 1 }
      (a._1 + b._1, s1, g)
    }

    override def finish(r: (Long, Array[Long], Array[Long]))
        : (Long, Seq[Long], Seq[Long]) =
      (r._1, r._2.toSeq, r._3.toSeq)

    override def bufferEncoder
        : org.apache.spark.sql.Encoder[(Long, Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    override def outputEncoder
        : org.apache.spark.sql.Encoder[(Long, Seq[Long], Seq[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  object GramSum {
    def column(dim: Int)
        : TypedColumn[Seq[Long], (Long, Seq[Long], Seq[Long])] =
      new GramSum(dim).toColumn
  }

  /** q_embed_pca entry: per-dimension loading of the first principal
    * component, with the Rayleigh eigenvalue and its share of total
    * variance repeated on every row. */
  def pcaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = Centroids.micro(s, dir)
      .select($"mv".as[Seq[Long]])
      .select(GramSum.column(Dim))
      .toDF("n", "s1a", "ga")
    // flatten AFTER aggregation: 64 mean rows, 4096 covariance cells
    val means = agg.select($"n", posexplode($"s1a"))
      .select($"pos".as("i"), $"n",
        ($"col".cast("double") / $"n").as("m")) // micro-units
    val cov = agg.select($"n", posexplode($"ga"))
      .select(($"pos" / Dim).cast("int").as("i"),
        pmod($"pos", lit(Dim)).cast("int").as("j"), $"n",
        $"col".cast("double").as("g"))
      .join(broadcast(means.select($"i", $"m".as("mi"))), "i")
      .join(broadcast(means.select($"i".as("j"), $"m".as("mj"))), "j")
      .select($"i", $"j",
        (($"g" / $"n" - $"mi" * $"mj") / lit(1e12)).as("c"))
    var v = cov.select($"i".as("vi")).distinct()
      .select($"vi", lit(0.125).as("v")) // 1/sqrt(64), dyadic-exact
    var lastNorm: DataFrame = null
    for (_ <- 1 to iterations) {
      val w = cov
        .join(broadcast(v.withColumnRenamed("vi", "j")), "j")
        .groupBy($"i")
        .agg(sum(round($"c" * $"v", 9).cast("decimal(28,9)"))
          .cast("double").as("w"))
      val nrm = w.agg(
        sqrt(sum(round($"w" * $"w", 9).cast("decimal(28,9)"))
          .cast("double")).as("nrm"))
      lastNorm = nrm
      v = w.crossJoin(broadcast(nrm))
        .select($"i".as("vi"), round($"w" / $"nrm", 9).as("v"))
    }
    val trace = cov.filter($"i" === $"j")
      .agg(sum(round($"c", 9).cast("decimal(28,9)")).cast("double")
        .as("trace"))
    v.crossJoin(broadcast(lastNorm)).crossJoin(broadcast(trace))
      .select($"vi".cast("long").as("pos"),
        round($"v", 6).as("loading"),
        round($"nrm", 6).as("lambda"),
        round($"nrm" / $"trace", 6).as("explained"))
      .orderBy($"pos")
  }

  val pcaSql: String = {
    def iter(prev: String, out: String, nrmOut: String): String =
      s"""w_$out AS (
         |  SELECT c.i,
         |    CAST(SUM(CAST(ROUND(c.c * p.v, 9) AS DECIMAL(28,9)))
         |      AS DOUBLE) AS w
         |  FROM cov c JOIN $prev p ON p.vi = c.j GROUP BY c.i),
         |$nrmOut AS (
         |  SELECT SQRT(CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(28,9)))
         |    AS DOUBLE)) AS nrm FROM w_$out),
         |$out AS (
         |  SELECT i AS vi, ROUND(w / nrm, 9) AS v FROM w_$out, $nrmOut)"""
        .stripMargin
    s"""WITH m AS (
       |  SELECT vec_id, i,
       |    CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT) AS mm
       |  FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(i)),
       |tot AS (SELECT COUNT(DISTINCT vec_id) AS n FROM m),
       |means AS (
       |  SELECT i - 1 AS i, CAST(SUM(mm) AS DOUBLE) / any_value(t.n) AS mv
       |  FROM m, tot t GROUP BY 1),
       |gram AS (
       |  SELECT a.i - 1 AS i, b.i - 1 AS j, CAST(SUM(a.mm * b.mm) AS DOUBLE) AS g
       |  FROM m a JOIN m b USING (vec_id) GROUP BY 1, 2),
       |cov AS (
       |  SELECT g.i, g.j,
       |    (g.g / t.n - ma.mv * mb.mv) / 1e12 AS c
       |  FROM gram g
       |  JOIN means ma ON ma.i = g.i JOIN means mb ON mb.i = g.j, tot t),
       |v0 AS (SELECT DISTINCT i AS vi, 0.125::DOUBLE AS v FROM cov),
       |${iter("v0", "v1", "n1")},
       |${iter("v1", "v2", "n2")},
       |${iter("v2", "v3", "n3")},
       |trace AS (
       |  SELECT CAST(SUM(CAST(ROUND(c, 9) AS DECIMAL(28,9))) AS DOUBLE)
       |    AS trace
       |  FROM cov WHERE i = j)
       |SELECT CAST(p.vi AS BIGINT) AS pos, ROUND(p.v, 6) AS loading,
       |  ROUND(n3.nrm, 6) AS lambda,
       |  ROUND(n3.nrm / trace, 6) AS explained
       |FROM v3 p, n3, trace ORDER BY pos""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_pca" -> pcaQ)

  def oracle: Map[String, String] = Map(
    "q_embed_pca" -> pcaSql)
}
