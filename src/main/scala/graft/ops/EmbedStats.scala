package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Corpus-level embedding statistics over `embeddings` (vec_id,
  * embedding: array<float>, label) — the profiling primitives a
  * curation pipeline runs before similarity search: which dimensions
  * carry variance (feature selection / dim-reduction input) and how
  * vector norms are distributed (a broken normalization step shows up
  * here before it silently skews every cosine downstream).
  *
  * The reference engine has no vector surface (its columns are JSON
  * scalars, `/root/reference/src/datasources.rs:219-257`); these extend
  * the Tier P embedding family ([[Centroids]], [[Similarity]],
  * [[Quantize]]).
  *
  * Scale shape: both operators fold whole vectors map-side. The moments
  * pass uses [[EmbedStats.VecMoments]] — one (n, Σm, Σm²) buffer of 2·dim
  * longs per partition crosses the shuffle, regardless of corpus size
  * (same bounded-state pattern as [[Centroids.VecSum]]); the flatten to
  * per-dimension rows happens AFTER aggregation, over `dim` rows. The
  * norm pass is a per-row codegen'd higher-order fold (no explode: the
  * exchange carries one bucket key per row, and the groupBy on ≤ a few
  * dozen buckets map-side-combines to nothing).
  *
  * Determinism: same micro-unit fixed-point contract as [[Centroids]] —
  * elements quantized to round(x·10⁶) longs BEFORE any sum, so every
  * aggregate is exact integer arithmetic (order- and engine-
  * independent). All sums stay far below 2⁵³ at test scale (|m| ≤ ~5.3e5
  * ⇒ m² ≤ ~2.8e11; Σm² per dim ≤ ~2.8e11·n), so the final cast to
  * double is exact and the derived mean/variance run the same IEEE ops
  * on both engines. At a 100 TB corpus (n ≳ 3e7) the Σm² buffer would
  * widen to DECIMAL/BigInt — the quantization contract is unchanged.
  */
object EmbedStats {

  private val Dim = Centroids.Dim
  private val TopDims = 16

  /** Moments aggregator over micro-unit vectors: buffer = (n,
    * elementwise Σm, elementwise Σm²). Mutated in place, like
    * [[Centroids.VecSum]]. */
  final class VecMoments(dim: Int)
      extends Aggregator[Seq[Long], (Long, Array[Long], Array[Long]),
        (Long, Seq[Long], Seq[Long])] {

    override def zero: (Long, Array[Long], Array[Long]) =
      (0L, new Array[Long](dim), new Array[Long](dim))

    override def reduce(b: (Long, Array[Long], Array[Long]), v: Seq[Long])
        : (Long, Array[Long], Array[Long]) = {
      require(v.length == dim, s"expected $dim-dim vector, got ${v.length}")
      val (s1, s2) = (b._2, b._3)
      var i = 0
      v.foreach { x => s1(i) += x; s2(i) += x * x; i += 1 }
      (b._1 + 1, s1, s2)
    }

    override def merge(a: (Long, Array[Long], Array[Long]),
        b: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) = {
      var i = 0
      while (i < dim) { a._2(i) += b._2(i); a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }

    override def finish(r: (Long, Array[Long], Array[Long]))
        : (Long, Seq[Long], Seq[Long]) = (r._1, r._2.toSeq, r._3.toSeq)

    override def bufferEncoder: Encoder[(Long, Array[Long], Array[Long])] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[(Long, Seq[Long], Seq[Long])] =
      ExpressionEncoder()
  }

  object VecMoments {
    def column(dim: Int): TypedColumn[Seq[Long], (Long, Seq[Long], Seq[Long])] =
      new VecMoments(dim).toColumn
  }

  /** q_embed_dims entry: per-dimension (n, mean, population variance),
    * variance rank, and the top-`TopDims` selection mask — the
    * feature-selection table a dim-reduction step consumes. */
  def dimsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = Centroids.micro(s, dir)
      .select($"mv".as[Seq[Long]])
      .select(VecMoments.column(Dim))
      .toDF("n", "s1a", "s2a") // ungrouped typed select flattens the tuple
    val perDim = agg
      .select($"n", posexplode(arrays_zip($"s1a", $"s2a")))
      .select($"pos".cast("long").as("pos"), $"n",
        $"col.s1a".cast("double").as("s1"), $"col.s2a".cast("double").as("s2"))
      // op order mirrored verbatim in the oracle: (s1/1e6)/n and
      // (s2/n − (s1/n)²)/1e12 over exact-integer doubles
      .withColumn("mean_raw", $"s1" / lit(1000000.0) / $"n")
      .withColumn("var_raw",
        ($"s2" / $"n" - ($"s1" / $"n") * ($"s1" / $"n")) / lit(1000000000000.0))
    val w = Window.orderBy($"var_raw".desc, $"pos")
    perDim
      .withColumn("var_rank", row_number().over(w))
      .select($"pos", $"n", round($"mean_raw", 6).as("mean"),
        round($"var_raw", 6).as("variance"), $"var_rank",
        ($"var_rank" <= TopDims).as("selected"))
      .orderBy($"pos")
  }

  /** DuckDB twin: positions table + exact integer sums, identical
    * derivation order. */
  val dimsSql: String =
    s"""WITH m AS (
      |  SELECT i, CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT) AS mm
      |  FROM embeddings CROSS JOIN range(1, ${Dim + 1}) t(i)),
      |a AS (
      |  SELECT i, COUNT(*) AS n, CAST(SUM(mm) AS DOUBLE) AS s1,
      |    CAST(SUM(mm * mm) AS DOUBLE) AS s2
      |  FROM m GROUP BY i),
      |v AS (
      |  SELECT i - 1 AS pos, n, (s1 / 1000000.0) / n AS mean_raw,
      |    (s2 / n - (s1 / n) * (s1 / n)) / 1000000000000.0 AS var_raw
      |  FROM a)
      |SELECT pos, n, ROUND(mean_raw, 6) AS mean, ROUND(var_raw, 6) AS variance,
      |  CAST(ROW_NUMBER() OVER (ORDER BY var_raw DESC, pos) AS INT) AS var_rank,
      |  ROW_NUMBER() OVER (ORDER BY var_raw DESC, pos) <= $TopDims AS selected
      |FROM v ORDER BY pos""".stripMargin

  /** q_embed_norms entry: L2-norm distribution — one row per 0.1-wide
    * norm bucket with count, min/max, and a decimal-exact mean. The
    * norm itself is sqrt of an exact integer (Σm² per vector ≤ dim·m²
    * ≈ 1.8e13 < 2⁵³), so bucket edges cannot flip between engines. */
  def normsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Centroids.micro(s, dir)
      .withColumn("ss", expr("aggregate(mv, 0L, (acc, m) -> acc + m * m)"))
      .withColumn("norm", sqrt($"ss".cast("double")) / lit(1000000.0))
      .withColumn("bucket", floor($"norm" * 10).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_vecs"),
        round(min($"norm"), 6).as("min_norm"),
        round(max($"norm"), 6).as("max_norm"),
        round(sum(round($"norm", 9).cast("decimal(28,9)")).cast("double")
          / count(lit(1)), 6).as("mean_norm"))
      .orderBy($"bucket")
  }

  /** DuckDB twin: same integer Σm² fold (addition of exact integers —
    * order-free), same sqrt/divide/bucket derivation. */
  val normsSql: String =
    s"""WITH n AS (
      |  SELECT vec_id,
      |    sqrt(CAST(list_reduce(list_transform(range(1, ${Dim + 1}),
      |        i -> CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT)
      |             * CAST(ROUND(embedding[i]::DOUBLE * 1000000) AS BIGINT)),
      |      (a, b) -> a + b) AS DOUBLE)) / 1000000.0 AS norm
      |  FROM embeddings)
      |SELECT CAST(FLOOR(norm * 10) AS INT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(MIN(norm), 6) AS min_norm,
      |  ROUND(MAX(norm), 6) AS max_norm,
      |  ROUND(CAST(SUM(CAST(ROUND(norm, 9) AS DECIMAL(28,9))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_norm
      |FROM n GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Output dimensionality of the JL projection — 64 → 16 cuts every
    * downstream distance computation 4× at a bounded (~1/√16) pairwise
    * distortion; the constant lives here so query and oracle share it. */
  private val JlK = 16

  /** q_embed_jl entry: Johnson–Lindenstrauss random projection with
    * distortion accounting — project every vector 64 → 16 dims through
    * a DETERMINISTIC Rademacher (±1/√k) matrix, then report how well
    * pairwise distances survive (the JL lemma's promise) over the
    * (vec_id, vec_id+1) pair chain: n_pairs, mean/min/max of the
    * projected/original distance ratio. The scale path behind
    * cheaper ANN and dedup: distances in 16 dims cost a quarter of 64.
    *
    * The projection matrix is ARITHMETIC, not stored: entry sign(i,j) =
    * bit 16 of (i·k+j)·2654435761 mod 2³² — Knuth multiplicative
    * mixing, exact in 64-bit integer ops on both engines, so Spark and
    * DuckDB materialize the identical matrix without shipping one.
    * Scale shape: projection is a per-row map (nested higher-order
    * folds, no explode); the pair chain is one equi-join on vec_id+1;
    * ratio stats are one combinable aggregate. Ratios round to 9 dp
    * (mean sums as DECIMAL(28,9)); outputs round to 6. */
  def jlQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = JlK
    // ±1 entry for flat index idx = i*k + j, exact integer mixing
    def signExpr(idx: String): String =
      s"IF((((($idx) * 2654435761L) % 4294967296L) div 65536) % 2 = 0, 1.0d, -1.0d)"
    val projected = t(s, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("p", expr(
        s"""transform(sequence(0, ${k - 1}), j ->
           |  aggregate(sequence(0, 63), 0d, (acc, i) ->
           |    acc + element_at(v, i + 1) * ${signExpr(s"i * $k + j")})
           |  / sqrt(cast($k as double)))""".stripMargin))
      .select($"vec_id", $"v", $"p")
    val dist = (a: String, b: String) =>
      s"sqrt(aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0d, (acc, e) -> acc + e))"
    projected.as("l")
      .join(projected.as("r"), col("l.vec_id") + 1 === col("r.vec_id"))
      .select(
        expr(dist("l.v", "r.v")).as("d_orig"),
        expr(dist("l.p", "r.p")).as("d_proj"))
      .filter($"d_orig" > 0)
      .select(round($"d_proj" / $"d_orig", 9).cast("decimal(28,9)").as("ratio"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum($"ratio").cast("double") / count(lit(1)), 6).as("mean_ratio"),
        round(min($"ratio").cast("double"), 6).as("min_ratio"),
        round(max($"ratio").cast("double"), 6).as("max_ratio"))
  }

  val jlSql: String = {
    val k = JlK
    def sign(idx: String): String =
      s"CASE WHEN (((($idx) * 2654435761) % 4294967296) // 65536) % 2 = 0 THEN 1.0 ELSE -1.0 END"
    s"""WITH p AS (
       |  SELECT vec_id,
       |    list_transform(range(1, 65), i -> embedding[i]::DOUBLE) AS v,
       |    list_transform(range(0, $k), j ->
       |      list_reduce(list_transform(range(0, 64), i ->
       |        embedding[i + 1]::DOUBLE * (${sign(s"i * $k + j")})),
       |        (x, y) -> x + y) / sqrt($k)) AS pv
       |  FROM embeddings),
       |d AS (
       |  SELECT
       |    sqrt(list_reduce(list_transform(range(1, 65),
       |      i -> (l.v[i] - r.v[i]) * (l.v[i] - r.v[i])), (x, y) -> x + y)) AS d_orig,
       |    sqrt(list_reduce(list_transform(range(1, ${k + 1}),
       |      i -> (l.pv[i] - r.pv[i]) * (l.pv[i] - r.pv[i])), (x, y) -> x + y)) AS d_proj
       |  FROM p l JOIN p r ON l.vec_id + 1 = r.vec_id),
       |ratios AS (
       |  SELECT CAST(ROUND(d_proj / d_orig, 9) AS DECIMAL(28,9)) AS ratio
       |  FROM d WHERE d_orig > 0)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  ROUND(CAST(SUM(ratio) AS DOUBLE) / COUNT(*), 6) AS mean_ratio,
       |  ROUND(CAST(MIN(ratio) AS DOUBLE), 6) AS min_ratio,
       |  ROUND(CAST(MAX(ratio) AS DOUBLE), 6) AS max_ratio
       |FROM ratios""".stripMargin
  }

  /** q_embed_cka entry: LINEAR CKA (centered kernel alignment,
    * Kornblith et al. 2019) between the full 64-d embedding space and
    * each Matryoshka prefix width {8, 16, 32, 64} — the
    * representation-GEOMETRY audit next to [[Similarity.matryoshkaQ]]'s
    * ranking-level overlap@10: CKA(X, X₍w₎) = ‖X̃ᵀỸ‖²_F /
    * (‖X̃ᵀX̃‖_F · ‖ỸᵀỸ‖_F) over column-centered features. Width 64 is
    * the in-result control (CKA ≡ 1).
    *
    * Exactness: vectors quantize to MILLI-units (coarser than
    * [[Centroids.micro]]'s 1e6 — sized so the n-scaled centered moment
    * A_ij = n·Σx_i x_j − Σx_i·Σx_j and its squared Frobenius sums stay
    * inside DECIMAL(38,0) through sf1 and beyond); every A_ij is an
    * exact integer, and the final CKA is two correctly-rounded sqrts
    * and one division. Because each prefix Y is a column subset of X,
    * ALL three Frobenius sums are index-range reductions over the ONE
    * 64×64 cross-moment matrix.
    *
    * Scale shape: one corpus pass through the bounded-state
    * [[Centroids.VecSum]] (4160-slot buffer: 64² products + 64 sums
    * per row, merged map-side); everything after runs on a 1-row frame
    * against the 4-row width grid (whitelisted broadcast). */
  def ckaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prods = t(s, dir, "embeddings")
      .withColumn("mx", expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"))
      .withColumn("pr", expr(
        "concat(flatten(transform(mx, a -> transform(mx, b -> a * b))), mx)"))
      .select($"pr".as[Seq[Long]])
    val one = prods.groupByKey(_ => 0).mapValues(identity)
      .agg(Centroids.VecSum.column(64 * 64 + 64).name("agg"))
      .toDF("k", "agg")
      .select($"agg._1".as("n"), $"agg._2".as("arr"))
      // A(i,j) at flat k = i·64 + j, exact decimal(38,0)
      .withColumn("amat", expr(
        """transform(sequence(0, 4095), k ->
          |  cast(n as decimal(38,0)) * cast(element_at(arr, k + 1) as decimal(38,0))
          |  - cast(element_at(arr, cast(4097 + k div 64 as int)) as decimal(38,0))
          |    * cast(element_at(arr, cast(4097 + k % 64 as int)) as decimal(38,0)))"""
          .stripMargin))
    def frob(cond: String): String =
      s"""aggregate(sequence(0, 4095), cast(0 as decimal(38,0)),
         |  (acc, k) -> acc + CASE WHEN $cond
         |    THEN element_at(amat, k + 1) * element_at(amat, k + 1)
         |    ELSE cast(0 as decimal(38,0)) END)""".stripMargin
    Seq(8, 16, 32, 64).toDF("width")
      .crossJoin(broadcast(one))
      .withColumn("f_xy", expr(frob("k % 64 < width")))
      .withColumn("f_yy", expr(frob("k div 64 < width AND k % 64 < width")))
      .withColumn("f_xx", expr(frob("true")))
      .select($"width".cast("long").as("width"), lit(64L).as("d_full"), $"n",
        round($"f_xy".cast("double") /
          (sqrt($"f_xx".cast("double")) * sqrt($"f_yy".cast("double"))), 6)
          .as("cka"),
        round(sqrt($"f_yy".cast("double")) / sqrt($"f_xx".cast("double")), 6)
          .as("frob_share"))
      .orderBy($"width")
  }

  val ckaSql: String =
    """WITH mv AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(ROUND(x::DOUBLE * 1000) AS BIGINT)) AS mx
      |  FROM embeddings),
      |nn AS (SELECT COUNT(*) AS n FROM mv),
      |sx AS MATERIALIZED (
      |  SELECT t.i AS i, SUM(mx[t.i + 1]) AS s
      |  FROM mv CROSS JOIN range(0, 64) t(i) GROUP BY 1),
      |sxy AS MATERIALIZED (
      |  SELECT ti.i AS i, tj.j AS j, SUM(mx[ti.i + 1] * mx[tj.j + 1]) AS p
      |  FROM mv CROSS JOIN range(0, 64) ti(i) CROSS JOIN range(0, 64) tj(j)
      |  GROUP BY 1, 2),
      |a AS MATERIALIZED (
      |  SELECT sxy.i, sxy.j,
      |    CAST(nn.n AS HUGEINT) * p
      |      - CAST(si.s AS HUGEINT) * sj.s AS a, nn.n
      |  FROM sxy
      |  JOIN sx si ON si.i = sxy.i
      |  JOIN sx sj ON sj.i = sxy.j, nn),
      |w AS (SELECT unnest([8, 16, 32, 64]) AS width),
      |f AS (
      |  SELECT width, MAX(n) AS n,
      |    SUM(CASE WHEN j < width THEN a * a END) AS f_xy,
      |    SUM(CASE WHEN i < width AND j < width THEN a * a END) AS f_yy,
      |    SUM(a * a) AS f_xx
      |  FROM a, w GROUP BY width)
      |SELECT CAST(width AS BIGINT) AS width, CAST(64 AS BIGINT) AS d_full,
      |  CAST(n AS BIGINT) AS n,
      |  ROUND(CAST(f_xy AS DOUBLE)
      |    / (sqrt(CAST(f_xx AS DOUBLE)) * sqrt(CAST(f_yy AS DOUBLE))), 6)
      |    AS cka,
      |  ROUND(sqrt(CAST(f_yy AS DOUBLE)) / sqrt(CAST(f_xx AS DOUBLE)), 6)
      |    AS frob_share
      |FROM f ORDER BY width""".stripMargin

  /** q_embed_isotropy entry: ISOTROPY / ANISOTROPY audit of the
    * embedding space — the mean pairwise dot product over all n(n−1)
    * vector pairs normalized by the mean squared norm (≈ the expected
    * random-pair cosine: ~0 for an isotropic cloud, → 1 when every
    * vector points the same way — the anisotropy pathology Mu &
    * Viswanath 2018 and Ethayarajh 2019 showed makes raw cosines
    * uninformative), plus the ROGUE-DIMENSION readout (the single
    * dimension's share of total variance — the "outlier dims" BERT
    * phenomenon) and the squared-norm coefficient of variation.
    *
    * Exactness: the pairwise-mean needs NO pair join — the algebraic
    * identity Σ_{i≠j}⟨x_i,x_j⟩ = ‖Σx‖² − Σ‖x‖² turns it into
    * one-pass moments; milli-unit dims (dot moments) and centi-unit
    * squared norms (norm moments, sized so Σ(‖x‖²)² stays in longs
    * through sf10) make every moment an exact integer; each output is
    * a couple of correctly-rounded double ops over exact decimals.
    * Scale shape: ONE corpus pass through the bounded VecSum (130-slot
    * buffer), then a 1-row frame. */
  def isotropyQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prods = t(s, dir, "embeddings")
      .withColumn("mx", expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"))
      .withColumn("cx", expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 100) as bigint))"))
      .withColumn("r2", expr(
        "aggregate(cx, 0L, (acc, v) -> acc + v * v)"))
      .withColumn("pr", expr(
        "concat(mx, transform(mx, v -> v * v), array(r2, r2 * r2))"))
      .select($"pr".as[Seq[Long]])
    prods.groupByKey(_ => 0).mapValues(identity)
      .agg(Centroids.VecSum.column(64 + 64 + 2).name("agg"))
      .toDF("kk", "agg")
      .select($"agg._1".as("n"), $"agg._2".as("arr"))
      // ‖S‖² and Σ_d var_d in exact decimal; Q and norm moments in longs
      .withColumn("s2", expr(
        """aggregate(sequence(0, 63), cast(0 as decimal(38,0)), (acc, d) ->
          |  acc + cast(element_at(arr, d + 1) as decimal(38,0))
          |      * cast(element_at(arr, d + 1) as decimal(38,0)))"""
          .stripMargin))
      .withColumn("q", expr(
        "aggregate(sequence(64, 127), 0L, (acc, i) -> acc + element_at(arr, cast(i + 1 as int)))"))
      .withColumn("var_tot", expr(
        """aggregate(sequence(0, 63), cast(0 as decimal(38,0)), (acc, d) ->
          |  acc + (cast(n as decimal(38,0))
          |           * cast(element_at(arr, cast(d + 65 as int)) as decimal(38,0))
          |         - cast(element_at(arr, d + 1) as decimal(38,0))
          |           * cast(element_at(arr, d + 1) as decimal(38,0))))"""
          .stripMargin))
      .withColumn("var_max", expr(
        """array_max(transform(sequence(0, 63), d ->
          |  cast(n as decimal(38,0))
          |    * cast(element_at(arr, cast(d + 65 as int)) as decimal(38,0))
          |  - cast(element_at(arr, d + 1) as decimal(38,0))
          |    * cast(element_at(arr, d + 1) as decimal(38,0))))"""
          .stripMargin))
      .select($"n",
        round(($"s2".cast("double") - $"q".cast("double"))
          / (($"n" - 1).cast("double") * $"q".cast("double")), 6)
          .as("mean_pair_dot_ratio"),
        round($"var_max".cast("double") / $"var_tot".cast("double"), 6)
          .as("top_var_share"),
        round(sqrt(($"n" * expr("element_at(arr, 130)")
            - expr("element_at(arr, 129)") * expr("element_at(arr, 129)"))
            .cast("double"))
          / expr("element_at(arr, 129)").cast("double"), 6)
          .as("norm_sq_cv"))
  }

  val isotropySql: String =
    """WITH mv AS MATERIALIZED (
      |  SELECT
      |    list_transform(embedding, x -> CAST(ROUND(x::DOUBLE * 1000)
      |      AS BIGINT)) AS mx,
      |    list_reduce(list_transform(embedding,
      |      x -> CAST(ROUND(x::DOUBLE * 100) AS BIGINT) *
      |           CAST(ROUND(x::DOUBLE * 100) AS BIGINT)),
      |      (a, b) -> a + b) AS r2
      |  FROM embeddings),
      |nn AS (SELECT COUNT(*) AS n, SUM(r2) AS sr2, SUM(r2 * r2) AS sr4
      |       FROM mv),
      |dimsums AS (
      |  SELECT t.d AS d, SUM(mx[t.d + 1]) AS s, SUM(mx[t.d + 1] * mx[t.d + 1]) AS q
      |  FROM mv CROSS JOIN range(0, 64) t(d) GROUP BY 1),
      |agg AS (
      |  SELECT
      |    SUM(CAST(s AS HUGEINT) * s) AS s2,
      |    SUM(q) AS qq,
      |    SUM(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) AS var_tot,
      |    MAX(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s) AS var_max
      |  FROM dimsums, nn),
      |qn AS (
      |  SELECT SUM(q) AS qn FROM (
      |    SELECT SUM(mx[t.d + 1] * mx[t.d + 1]) AS q
      |    FROM mv CROSS JOIN range(0, 64) t(d) GROUP BY t.d))
      |SELECT CAST(n AS BIGINT) AS n,
      |  ROUND((CAST(s2 AS DOUBLE) - CAST(qq AS DOUBLE))
      |    / ((n - 1) * CAST(qq AS DOUBLE)), 6) AS mean_pair_dot_ratio,
      |  ROUND(CAST(var_max AS DOUBLE) / CAST(var_tot AS DOUBLE), 6)
      |    AS top_var_share,
      |  ROUND(SQRT(CAST(n * sr4 - sr2 * sr2 AS DOUBLE))
      |    / CAST(sr2 AS DOUBLE), 6) AS norm_sq_cv
      |FROM agg, nn""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_dims" -> dimsQ,
    "q_embed_norms" -> normsQ,
    "q_embed_cka" -> ckaQ,
    "q_embed_isotropy" -> isotropyQ,
    "q_embed_jl" -> jlQ)

  def oracle: Map[String, String] = Map(
    "q_embed_dims" -> dimsSql,
    "q_embed_norms" -> normsSql,
    "q_embed_cka" -> ckaSql,
    "q_embed_isotropy" -> isotropySql,
    "q_embed_jl" -> jlSql)
}
