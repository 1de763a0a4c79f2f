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

  /** q_embed_spectrum entry: TOP-2 EIGENVALUES of the embedding
    * covariance by rank-1 DEFLATION — power-iterate to (λ₁, v₁), deflate
    * C′ = C − λ₁·v₁v₁ᵀ, power-iterate again for λ₂ — and report the
    * All-But-The-Top readout (Mu & Viswanath, ICLR 2018: embeddings
    * improve on similarity tasks after removing the mean and the top
    * principal directions): `top_share` is the dominant direction's
    * share of variance BEFORE (λ₁/tr C, component 1's row) and AFTER
    * the ABTT transform (λ₂/(tr C − λ₁), component 2's row — removing
    * the mean and v₁ leaves exactly the deflated spectrum, so the
    * post-ABTT anisotropy is computable on the 64×64 frame WITHOUT a
    * second corpus pass). That frame-only property is the scale story:
    * deciding whether ABTT is worth applying to 10⁹ vectors costs one
    * Gram pass — the same one [[pcaQ]] already pays — plus arithmetic
    * on dim² cells.
    *
    * Determinism: the [[pcaQ]] contract throughout (exact micro-unit
    * Gram sums; 9-dp-rounded DECIMAL(28,9) merges in every
    * matrix-vector product; dyadic v₀); the deflated cells are the
    * same IEEE expression c − λ₁·v₁ᵢ·v₁ⱼ on identical operands in both
    * engines. Power iteration from a positive start converges to the
    * dominant eigenvector of each matrix; 3 unrolled iterations match
    * the oracle exactly (the ACCURACY of λ₂ is secondary to both
    * engines computing the identical number — the audit contract). */
  def spectrumQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt-").toString)
    val agg = Centroids.micro(s, dir)
      .select($"mv".as[Seq[Long]])
      .select(GramSum.column(Dim))
      .toDF("n", "s1a", "ga")
    val means = agg.select($"n", posexplode($"s1a"))
      .select($"pos".as("i"), $"n",
        ($"col".cast("double") / $"n").as("m"))
    // checkpointed: the 4096-cell frame is re-read by SIX matrix-vector
    // products (two power-iteration chains) — uncheckpointed, each one
    // re-runs the corpus Gram pass and the plan depth doubles per
    // iteration (the Iterate.fixpoint lineage lesson; measured: the
    // deflated chain alone ran minutes instead of seconds)
    val cov = agg.select($"n", posexplode($"ga"))
      .select(($"pos" / Dim).cast("int").as("i"),
        pmod($"pos", lit(Dim)).cast("int").as("j"), $"n",
        $"col".cast("double").as("g"))
      .join(broadcast(means.select($"i", $"m".as("mi"))), "i")
      .join(broadcast(means.select($"i".as("j"), $"m".as("mj"))), "j")
      .select($"i", $"j",
        (($"g" / $"n" - $"mi" * $"mj") / lit(1e12)).as("c"))
      .checkpoint()
    def power(c: DataFrame): (DataFrame, DataFrame) = {
      var v = c.select($"i".as("vi")).distinct()
        .select($"vi", lit(0.125).as("v"))
      var lastNorm: DataFrame = null
      for (_ <- 1 to iterations) {
        val w = c
          .join(broadcast(v.withColumnRenamed("vi", "j")), "j")
          .groupBy($"i")
          .agg(sum(round($"c" * $"v", 9).cast("decimal(28,9)"))
            .cast("double").as("w"))
          .checkpoint() // cut per-iteration lineage (plan doubles otherwise)
        val nrm = w.agg(
          sqrt(sum(round($"w" * $"w", 9).cast("decimal(28,9)"))
            .cast("double")).as("nrm"))
        lastNorm = nrm
        v = w.crossJoin(broadcast(nrm))
          .select($"i".as("vi"), round($"w" / $"nrm", 9).as("v"))
      }
      (v, lastNorm)
    }
    val (v1, l1) = power(cov)
    val deflated = cov
      .join(broadcast(v1.select($"vi".as("i"), $"v".as("vi1"))), "i")
      .join(broadcast(v1.select($"vi".as("j"), $"v".as("vj1"))), "j")
      .crossJoin(broadcast(l1.withColumnRenamed("nrm", "lam1")))
      .select($"i", $"j", ($"c" - $"lam1" * $"vi1" * $"vj1").as("c"))
      .checkpoint()
    val (_, l2) = power(deflated)
    val trace = cov.filter($"i" === $"j")
      .agg(sum(round($"c", 9).cast("decimal(28,9)")).cast("double")
        .as("trace"))
    val one = l1.withColumnRenamed("nrm", "l1")
      .crossJoin(broadcast(l2.withColumnRenamed("nrm", "l2")))
      .crossJoin(broadcast(trace))
    one.select(lit(1L).as("component"),
        round($"l1", 6).as("lambda"),
        round($"l1" / $"trace", 6).as("explained"),
        round($"l1" / $"trace", 6).as("top_share"))
      .unionByName(one.select(lit(2L).as("component"),
        round($"l2", 6).as("lambda"),
        round($"l2" / $"trace", 6).as("explained"),
        round($"l2" / ($"trace" - $"l1"), 6).as("top_share")))
      .orderBy($"component")
  }

  val spectrumSql: String = {
    def iter(cov: String, prev: String, out: String, nrmOut: String): String =
      s"""w_$out AS (
         |  SELECT c.i,
         |    CAST(SUM(CAST(ROUND(c.c * p.v, 9) AS DECIMAL(28,9)))
         |      AS DOUBLE) AS w
         |  FROM $cov c JOIN $prev p ON p.vi = c.j GROUP BY c.i),
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
       |${iter("cov", "v0", "v1", "n1")},
       |${iter("cov", "v1", "v2", "n2")},
       |${iter("cov", "v2", "v3", "n3")},
       |cov2 AS (
       |  SELECT c.i, c.j, c.c - n3.nrm * a.v * b.v AS c
       |  FROM cov c
       |  JOIN v3 a ON a.vi = c.i JOIN v3 b ON b.vi = c.j, n3),
       |u0 AS (SELECT DISTINCT i AS vi, 0.125::DOUBLE AS v FROM cov2),
       |${iter("cov2", "u0", "u1", "m1")},
       |${iter("cov2", "u1", "u2", "m2")},
       |${iter("cov2", "u2", "u3", "m3")},
       |trace AS (
       |  SELECT CAST(SUM(CAST(ROUND(c, 9) AS DECIMAL(28,9))) AS DOUBLE)
       |    AS trace
       |  FROM cov WHERE i = j)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS component,
       |    ROUND(n3.nrm, 6) AS lambda,
       |    ROUND(n3.nrm / trace, 6) AS explained,
       |    ROUND(n3.nrm / trace, 6) AS top_share
       |  FROM n3, trace
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), ROUND(m3.nrm, 6),
       |    ROUND(m3.nrm / trace, 6),
       |    ROUND(m3.nrm / (trace - n3.nrm), 6)
       |  FROM m3, n3, trace)
       |ORDER BY component""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_pca" -> pcaQ,
    "q_embed_spectrum" -> spectrumQ)

  def oracle: Map[String, String] = Map(
    "q_embed_pca" -> pcaSql,
    "q_embed_spectrum" -> spectrumSql)
}
