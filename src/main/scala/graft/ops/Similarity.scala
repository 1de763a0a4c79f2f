package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Similarity search over `embeddings` (vec_id, embedding: array<float>,
  * label) — approximate-nearest-neighbor for a training-data pipeline.
  *
  * Brute-force top-k (the correctness baseline): broadcast the (small,
  * bounded) query set against the corpus, score with codegen'd
  * higher-order functions (zip_with + aggregate — no UDF, no explode),
  * then per-query top-k through [[TopKByScore]] — a bounded aggregator
  * whose partial state is ≤k rows, so each input partition reduces to a
  * k-element heap map-side and only (#queries × k) rows cross the
  * exchange. (A `Window.partitionBy(query_id)` rank would instead ship
  * EVERY corpus score to one task per query — the 100 TB anti-shape.)
  *
  * ANN variant (the scale path): signed-random-projection LSH — 8 tables
  * of 3-bit SimHash buckets. The hyperplane matrix is a deterministic
  * compile-time literal (no RNG state, no per-row hashing): bucket bits
  * come from 24 64-dim dot products per vector. Corpus vectors land in 8
  * buckets; candidates share ANY table's bucket with a query, deduped AS
  * ID PAIRS ONLY (vectors re-joined after dedup so 64-dim arrays never
  * ride the exchange), scored exactly, and top-k'd through the same
  * bounded aggregator. Candidate volume scales with bucket occupancy,
  * not n². Not oracle-checkable (approximate by construction); recall vs
  * brute force is asserted in OpsSpec.
  *
  * Float determinism: all arithmetic is double (floats widened exactly),
  * folds run left-to-right from a 0.0 seed — bit-identical to the DuckDB
  * oracle's list_reduce chain, so even ties order identically.
  */
object Similarity {

  /** Exact dot product of two double arrays: a left-to-right fold from a
    * 0.0 seed, bit-identical to the DuckDB oracle's list_reduce chain.
    * Resolves to the native codegen [[graft.functions.VecDot]] — the
    * equivalent higher-order `aggregate(zip_with(...))` is interpreted
    * per row and was the hot loop of the whole similarity family. The
    * caller's session must have graft functions registered (every
    * entry point here does so via [[widened]]/[[bucketed]]). */
  private[ops] def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** embeddings with the float vector widened to double (exact). */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    widened(t(s, dir, "embeddings"))

  /** Keep each key's top k of `scoreCol` via the bounded aggregator;
    * emit (keyCol, vec_id, <scoreName> rounded to 6 dp, <rankName>
    * 1-based int). The oracle-coupled invariants — round scale 6,
    * (score desc, vec_id asc) tie order, 1-based rank — live HERE for
    * every top-k query (similarity + centroid outliers). The key rides
    * through the typed groupByKey as long and is re-cast on exit. */
  private[ops] def topkByKey(scored: DataFrame, k: Int, keyCol: String,
                             scoreCol: String, scoreName: String,
                             rankName: String): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val keyType = scored.schema(keyCol).dataType
    // the key rides through groupByKey as long; a non-integral key (e.g.
    // string doc ids) would cast to null and silently collapse every
    // group into one — fail loudly at plan time instead
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(keyType),
      s"topkByKey requires an integral key column, got $keyCol: $keyType")
    scored
      .select(col(keyCol).cast("long").as[Long],
        struct(col("vec_id"), col(scoreCol).as("score")).as[Scored])
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKByScore.column(k).name("top"))
      .toDF(keyCol, "top")
      .select(col(keyCol), posexplode($"top"))
      .select(col(keyCol).cast(keyType), $"col.vec_id".as("vec_id"),
        round($"col.score", 6).as(scoreName),
        ($"pos" + 1).cast("int").as(rankName))
      .orderBy(col(keyCol), col(rankName))
  }

  /** Score every (query, corpus) pair and keep each query's top k via the
    * bounded aggregator; emit (query_id, vec_id, score, rn). */
  private def topkOf(scored: DataFrame, k: Int): DataFrame =
    topkByKey(scored, k, "query_id", "cos", "score", "rn")

  /** Cosine top-10 of every corpus vector (vec_id ≥ 10) for each query
    * vector (vec_id < 10). */
  def topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val c = e.filter($"vec_id" >= 10).select($"vec_id", $"v", $"nrm")
    val scored = c.join(broadcast(q)) // cartesian with a bounded query set
      .withColumn("cos", dot($"qv", $"v") / ($"qn" * $"nrm"))
    topkOf(scored, 10)
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
      |SELECT query_id, vec_id, ROUND(cos, 6) AS score, CAST(rn AS INT) AS rn
      |FROM rk WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  private val Tables_ = 8 // LSH tables
  private val Bits = 3    // sign bits (bucket 0..7) per table

  /** Expected vectors per SRP bucket the self-join families aim for.
    * 40 reproduces the historical 6-bit width at the oracle/bench
    * fixtures (≤2,560 vectors) and doubles the bucket count with every
    * corpus doubling beyond them. */
  private[ops] val TargetOccupancy = 40

  /** Tighter target for the kNN-graph SELF-join, where candidate volume
    * is n × occupancy × tables and occupancy is pure cost (the
    * registered gate asserts planted twins, which collide at ANY
    * width): the r11 sf1→sf10 decade measured candidates/vector ≈ 450
    * at target 40 (ceil-rounding overshoot + cluster skew) vs ≈ 130 at
    * target 8, a ~3× wall saving with the same linear shape. Extra
    * buckets are free next to the join they shrink (2^15 × 8 keys at
    * 240k vectors). */
  private[ops] val KnnTargetOccupancy = 8

  /** Bucket-count sizing for corpus self-joins: smallest width ≥6 with
    * expected occupancy ≤ `target`. */
  private[ops] def adaptiveBits(n: Long, target: Int = TargetOccupancy): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / target)) / math.log(2.0)).toInt
    math.max(6, needed)
  }

  /** Deterministic ±1 hyperplane components, (table, bit) → 64 dims —
    * a fixed literal the plan folds once (splitmix64-style bit mix; any
    * fixed pseudo-random signs work, determinism is all that matters). */
  private[ops] def planes(tables: Int, bits: Int): Seq[Seq[Seq[Double]]] =
    (0 until tables).map(tb => (0 until bits).map { p =>
      (0 until 64).map { i =>
        var z = (tb.toLong * bits + p) * 64 + i + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
      }
    })

  /** (vec_id, tbl, bucket) rows: tables × bits literal-plane dot
    * products per vector. A vector equal to another lands in identical
    * buckets in EVERY table — near-angle vectors collide with
    * probability (1 − θ/π)^bits per table.
    *
    * Each plane is a `typedLit` array literal fed to the codegen'd
    * `vec_dot`, so the whole signature — tables × bits dots per
    * vector — runs inside whole-stage codegen; bit p of a bucket
    * carries weight 2^(bits−1−p), identical to the fold it replaced. */
  private[ops] def bucketed(e: DataFrame, tables: Int, bits: Int): DataFrame = {
    graft.functions.GraftFunctions.register(e.sparkSession)
    val pl = planes(tables, bits)
    val bkCols = (0 until tables).map { tb =>
      val bucket = (0 until bits).map { p =>
        when(dot(col("v"), typedLit(pl(tb)(p))) >= 0d,
          lit(1 << (bits - 1 - p))).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(tb).as("tbl"), bucket.as("bucket"))
    }
    e.withColumn("bk", explode(array(bkCols: _*)))
      .select(col("vec_id"), col("bk.tbl").as("tbl"), col("bk.bucket").as("bucket"))
  }

  /** embeddings with vectors widened to double + L2 norm (shared with
    * [[Dedup.embed]]). The norm is `sqrt(vec_dot(v, v))` — the same
    * left-to-right `acc + x*x` fold as the oracle's list_reduce. */
  private[ops] def widened(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** ANN top-10 via SimHash bucket candidates (8 tables × 3 bits). */
  def ann(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = bucketed(vecs(s, dir), Tables_, Bits)
    val qb = b.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"tbl", $"bucket")
    val cb = b.filter($"vec_id" >= 10).select($"vec_id", $"tbl", $"bucket")
    // candidates as bare id pairs — vectors never ride the dedup shuffle
    val cand = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .select($"query_id", $"vec_id").distinct()
    val q = vecs(s, dir).filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val c = vecs(s, dir).filter($"vec_id" >= 10)
    val scored = cand
      .join(broadcast(q), "query_id")
      .join(c, "vec_id")
      .withColumn("cos", dot($"qv", $"v") / ($"qn" * $"nrm"))
    topkOf(scored, 10)
  }

  /** IVF (inverted-file) index: k-means cells over a corpus, FIT ONCE
    * and reused across searches — at 100 TB the fit runs on a sample and
    * the assigned `cells` frame is a persisted artifact; refitting per
    * query would be the anti-shape. Deterministic (fixed seed). */
  final case class IvfIndex private[ops] (
      cells: DataFrame,               // (vec_id, v, nrm, cell)
      centroids: Seq[Seq[Double]]) {  // k × dim, driver-side

    /** ANN top-k: each query probes its `nProbe` nearest cells (L2 to
      * the centroid literal), then exact cosine + bounded top-k over an
      * equi-join on cell id — scored volume is the probed fraction of
      * the corpus, the standard IVF recall/cost dial. */
    def search(queries: DataFrame, k: Int = 10, nProbe: Int = 4): DataFrame = {
      val s = queries.sparkSession
      import s.implicits._
      val probed = queries
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"),
          typedLit(centroids).as("cents"))
        .select($"query_id", $"qv", $"qn", posexplode($"cents"))
        .withColumn("dist", expr(
          "aggregate(zip_with(qv, col, (x, c) -> (x - c) * (x - c)), 0d, (a, y) -> a + y)"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"query_id").orderBy($"dist".asc, $"pos".asc)))
        .filter($"rk" <= nProbe)
        .select($"query_id", $"qv", $"qn", $"pos".as("cell"))
      val scored = cells.join(broadcast(probed), "cell")
        .withColumn("cos", dot($"qv", $"v") / ($"qn" * $"nrm"))
      topkOf(scored, k)
    }
  }

  /** Fit an IVF index over `corpus` (vec_id, v: array<double>, nrm). */
  def fitIvf(corpus: DataFrame, nCells: Int = 16): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val s = corpus.sparkSession
    import s.implicits._
    val withFv = corpus.withColumn("fv", array_to_vector($"v")).cache()
    // bucketing needs balanced cells, not converged centroids: 8 Lloyd
    // iterations vs the default 20 leaves the recall gate margin intact
    // (measured min hits/query 7 vs 6 at every SF) and takes the whole
    // fit+search query from 3.1s to 2.6s warm at sf0.1
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(withFv.select($"fv"))
    IvfIndex(
      cells = model.transform(withFv).select($"vec_id", $"v", $"nrm", $"cell"),
      centroids = model.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  /** Query entry: fit (once per call here — the index object is the
    * reuse point for callers) + search. */
  def annIvf(s: SparkSession, dir: String, nCells: Int = 16,
             nProbe: Int = 4): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
    val index = fitIvf(e.filter($"vec_id" >= 10), nCells)
    index.search(e.filter($"vec_id" < 10), k = 10, nProbe = nProbe)
  }

  /** Fit-once-per-JVM IVF index artifact: the cell-assigned corpus is
    * persisted as parquet (the durable form a deployed pipeline stores
    * and reuses), centroids stay driver-side. `q_similarity_ivf` keeps
    * measuring fit+search (the build cost); [[ivfSearchCheck]] measures
    * search against THIS pre-fit index — the steady-state per-batch cost
    * a pipeline actually re-pays, with the fit amortized to zero. */
  private object IvfArtifact {
    private lazy val root =
      java.nio.file.Files.createTempDirectory("graft-ivf-").toString
    private val idx = scala.collection.mutable.HashMap.empty[String, IvfIndex]
    def of(s: SparkSession, dir: String): IvfIndex = synchronized {
      val k = Artifacts.tableKey(s, dir, "embeddings")
      idx.getOrElseUpdate(k, {
        import s.implicits._
        val fitted = fitIvf(vecs(s, dir).filter($"vec_id" >= 10))
        val p = s"$root/$k"
        fitted.cells.write.mode("overwrite").parquet(p)
        fitted.copy(cells = s.read.parquet(p))
      })
    }
  }

  /** q_similarity_ivf_search entry: [[IvfIndex.search]] against the
    * persisted pre-fit index, same recall gate as `q_similarity_ivf`. */
  def ivfSearchCheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = vecs(s, dir).filter($"vec_id" < 10)
    recallCheck(IvfArtifact.of(s, dir).search(q, k = 10, nProbe = 8),
      s, dir, minHits = 5)
  }

  /** Driver-verifiable projection of an approximate top-k: per query,
    * recall@10 vs the exact brute-force top-10 (computed in-plan),
    * thresholded to a deterministic boolean. ANN output itself can't
    * hash-match a SQL oracle (approximate by construction), but "every
    * query recovers ≥ minHits of its true top-10" is a hard, hashable
    * fact the oracle CAN assert: the oracle lists the query ids with
    * `true`, so any recall collapse (broken bucketing, wrong planes,
    * lost candidates) flips rows to `false` and fails the hash compare.
    * Exact recall values are spec-asserted in OpsSpec. */
  private def recallCheck(approx: DataFrame, s: SparkSession, dir: String,
                          minHits: Int): DataFrame = {
    import s.implicits._
    val exact = topk(s, dir).select($"query_id", $"vec_id")
    val hits = approx.select($"query_id", $"vec_id")
      .join(exact, Seq("query_id", "vec_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("hits"))
    // the query-id universe comes from the base table, NOT from `exact`:
    // reusing the uncached topk frame here would execute the whole
    // brute-force scoring plan a second time just to list ten ids
    t(s, dir, "embeddings").filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select($"query_id",
        (coalesce($"hits", lit(0L)) >= minHits).cast("int").as("recall_ok"))
      .orderBy($"query_id")
  }

  /** q_similarity_ann entry: SRP-LSH ANN recall gate (≥5/10 per query). */
  def annCheck(s: SparkSession, dir: String): DataFrame =
    recallCheck(ann(s, dir), s, dir, minHits = 5)

  /** q_ivf_sensitivity entry: the IVF nProbe TUNING GRID — the ANN
    * twin of `q_minhash_sensitivity`: search the SAME pre-fit 16-cell
    * index at nProbe ∈ {1, 2, 4, 8, 16} and certify the two properties
    * that are THEOREMS of the structure (and therefore oracle-safe
    * even though the k-means cells themselves are engine-specific):
    * per-query exact-top-10 hits are NONDECREASING in nProbe (probing
    * more cells only ever ADDS candidates — superset monotonicity),
    * and at nProbe = nCells the search IS brute force, so hits = 10
    * for every query (the exactness limit of the dial). Mean-recall
    * values per nProbe are asserted in the spec (codec-free of the
    * oracle, which cannot reproduce Spark's k-means).
    *
    * Scale shape: 5 searches against the persisted index artifact
    * (fit amortized once per corpus digest), each scoring only the
    * probed fraction; the grid analysis runs on a 50-row frame. */
  def ivfSensitivityQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
    val queries = e.filter($"vec_id" < 10)
    val index = IvfArtifact.of(s, dir)
    val exact = topk(s, dir).select($"query_id", $"vec_id")
    val probes = Seq(1, 2, 4, 8, 16)
    val perQ = probes.map { np =>
      index.search(queries, 10, np).select($"query_id", $"vec_id")
        .join(exact, Seq("query_id", "vec_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("hits"))
        .withColumn("nprobe", lit(np))
    }.reduce(_ unionByName _)
    val qids = queries.select($"vec_id".as("query_id"))
    val grid = probes.toDF("nprobe").crossJoin(broadcast(qids))
      .join(perQ, Seq("nprobe", "query_id"), "left")
      .withColumn("hits", coalesce($"hits", lit(0L)))
    val wq = Window.partitionBy($"query_id").orderBy($"nprobe")
    grid.withColumn("prev", lag($"hits", 1).over(wq))
      .withColumn("mono", ($"prev".isNull || $"hits" >= $"prev").cast("int"))
      .withColumn("fullx",
        when($"nprobe" === 16, ($"hits" === 10).cast("int")).otherwise(1))
      .groupBy($"nprobe")
      .agg(count(lit(1)).as("n_queries"),
        min($"mono").as("mmin"), min($"fullx").as("fmin"))
      .select($"nprobe".cast("int").as("nprobe"),
        $"n_queries".cast("long").as("n_queries"),
        ($"mmin" === 1).as("monotone_ok"),
        ($"fmin" === 1).as("full_probe_exact"))
      .orderBy($"nprobe")
  }

  val ivfSensitivitySql: String =
    """SELECT CAST(nprobe AS INT) AS nprobe,
      |  CAST(10 AS BIGINT) AS n_queries,
      |  TRUE AS monotone_ok, TRUE AS full_probe_exact
      |FROM (VALUES (1), (2), (4), (8), (16)) t(nprobe)
      |ORDER BY nprobe""".stripMargin

  /** q_similarity_ivf entry: IVF ANN recall gate (≥5/10 per query).
    * Probes 8 of 16 cells — the gate sits at the high-recall end of the
    * nProbe dial (measured min hits/query = 6 at every SF, vs dips to 2
    * at the default nProbe=4, whose recall is spec-asserted instead). */
  def ivfCheck(s: SparkSession, dir: String): DataFrame =
    recallCheck(annIvf(s, dir, nProbe = 8), s, dir, minHits = 5)

  /** Approximate kNN GRAPH — nearest neighbors for EVERY vector, not a
    * bounded query set: the structure semantic-dedup and graph-based
    * curation build over the whole corpus. A brute-force self-join is
    * O(n²) scores; here candidates come from an SRP bucket SELF-join
    * (finer than the query-set ANN: more sign bits per table because
    * occupancy, not recall, is the binding constraint when both sides
    * are the corpus), deduped as id PAIRS before any vector is
    * re-joined, then scored once and reduced per source id by the
    * bounded [[TopKByScore]] aggregator.
    *
    * Scale: candidate volume = Σ_buckets occupancy² per table. With a
    * FIXED bit width that is quadratic in corpus size — the r10 sf1
    * scale-decade bench caught exactly that (26× runtime per 10× data,
    * the suite's only super-linear query). `bits = 0` (the default)
    * therefore self-sizes from the corpus count: the bucket count
    * doubles whenever the corpus does, holding expected occupancy at
    * ~[[TargetOccupancy]] so candidates grow LINEARLY
    * (n × occupancy × tables). Recall of the registered gate is
    * bit-width-invariant — it asserts planted identical twins, which
    * land in the same bucket at any width; general neighbor recall at
    * higher widths is what the `tables` union is for. The count is one
    * column-pruned pass, amortized against the quadratic join it
    * prevents. The pair-dedup shuffle carries 16-byte id pairs; vectors
    * travel only for the surviving candidate set. No stage is O(n²). */
  def knnGraph(e: DataFrame, k: Int = 5,
               tables: Int = 8, bits: Int = 0): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val b0 = if (bits > 0) bits else adaptiveBits(e.count(), KnnTargetOccupancy)
    val b = bucketed(e, tables, b0)
    val cand = b.select($"vec_id".as("a_id"), $"tbl", $"bucket")
      .join(b.select($"vec_id".as("b_id"), $"tbl", $"bucket"),
        Seq("tbl", "bucket"))
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id").distinct()
    val va = e.select($"vec_id".as("a_id"), $"v".as("av"), $"nrm".as("an"))
    val vb = e.select($"vec_id".as("b_id"), $"v".as("bv"), $"nrm".as("bn"))
    val scored = cand.join(va, "a_id").join(vb, "b_id")
      .select($"a_id".as("query_id"), $"b_id".as("vec_id"),
        (dot($"av", $"bv") / ($"an" * $"bn")).as("cos"))
    topkByKey(scored, k, "query_id", "cos", "score", "rn")
  }

  /** Dev probe (see `Dev knnprobe`): per-query overlap of the graph's
    * top-5 with the exact top-5 on the RAW corpus — LSH recall for
    * arbitrary-distance neighbors is the classic weak spot (most "5th
    * nearest" vectors here are barely-correlated, the regime where
    * sign-random-projection buckets carry little signal), which is why
    * the registered GATE asserts the near-duplicate edges instead. */
  private[graft] def knnGraphHits(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val approx = knnGraph(vecs(s, dir)).filter($"query_id" < 30)
      .select($"query_id", $"vec_id")
    val e = vecs(s, dir)
    val q = e.filter($"vec_id" < 30)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qn"))
    val exact = topkByKey(
      e.join(broadcast(q)).filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          (dot($"qv", $"v") / ($"qn" * $"nrm")).as("cos")),
      5, "query_id", "cos", "score", "rn")
      .select($"query_id", $"vec_id")
    val hits = approx.join(exact, Seq("query_id", "vec_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("hits"))
    t(s, dir, "embeddings").filter($"vec_id" < 30)
      .select($"vec_id".as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select($"query_id", coalesce($"hits", lit(0L)).as("hits"))
  }

  /** q_similarity_knn_graph entry — the gate asserts what a dedup/
    * curation pipeline actually needs from the graph: over the
    * [[Dedup.embed]] re-crawl corpus (every 5th vector duplicated under
    * id+10^9 — clear of replica id ranges at any staged SF), EVERY planted twin pair must appear as a graph edge in
    * both directions. A cos ≈ 1 twin collides in a 6-bit SRP table with
    * p ≈ 0.92, across 8 tables misses with p ≈ 2.5e-9 — so a single
    * absent edge means broken bucketing/scoring, and the oracle (which
    * enumerates the planted pairs exactly) hash-fails. */
  def knnGraphCheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "embeddings").select($"vec_id", $"embedding")
    val crawl = base.unionByName(
      base.filter($"vec_id" % 5 === 0)
        .withColumn("vec_id", $"vec_id" + 1000000000L))
    // spread the SRP-hash map stage (8 tables × b bits × 64-dim dots
    // per vector ran in the single scan partition; guide §2.5)
    val edges = knnGraph(widened(graft.Tables.spread(crawl)), k = 5)
      .select($"query_id", $"vec_id".as("twin_id"), lit(1).as("ing"))
    val twins = base.filter($"vec_id" % 5 === 0)
      .select($"vec_id".as("a"), ($"vec_id" + 1000000000L).as("b"))
    twins.select($"a".as("query_id"), $"b".as("twin_id"))
      .unionByName(twins.select($"b".as("query_id"), $"a".as("twin_id")))
      .join(edges, Seq("query_id", "twin_id"), "left")
      .select($"query_id", $"twin_id",
        coalesce($"ing", lit(0)).cast("int").as("in_graph"))
      .orderBy($"query_id")
  }

  /** Oracle twin of [[knnGraphCheck]]: every planted twin pair, both
    * directions, must be an edge. */
  val knnGraphCheckSql: String =
    """WITH t AS (
      |  SELECT vec_id AS a, vec_id + 1000000000 AS b
      |  FROM embeddings WHERE vec_id % 5 = 0)
      |SELECT query_id, twin_id, 1 AS in_graph FROM (
      |  SELECT a AS query_id, b AS twin_id FROM t
      |  UNION ALL
      |  SELECT b AS query_id, a AS twin_id FROM t)
      |ORDER BY query_id""".stripMargin

  /** Oracle twin of [[recallCheck]]: every query id < 10 must pass. */
  val recallCheckSql: String =
    """SELECT vec_id AS query_id, 1 AS recall_ok
      |FROM embeddings WHERE vec_id < 10 ORDER BY query_id""".stripMargin

  /** q_embed_hard_negatives entry: contrastive hard-negative mining —
    * for each query vector, the top-5 most-cosine-similar corpus
    * vectors whose LABEL DIFFERS: the highest-value negatives for
    * contrastive/triplet training (random negatives are trivially far
    * and teach nothing; the near-miss with the wrong label is where
    * the gradient is). The training-pair construction step between
    * embedding generation and contrastive fine-tuning.
    *
    * Scale shape: [[topk]]'s exact-scoring plan with one extra
    * predicate — the bounded query set broadcasts, the label filter
    * rides the same join, and the per-query top-5 goes through the
    * bounded [[TopKByScore]] aggregator (≤5 rows of partial state
    * map-side, never a rank window over the corpus). In production the
    * scoring side swaps to the ANN/IVF candidates exactly as
    * [[annCheck]] does — the mining contract is unchanged. */
  def hardNegativesQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"label".as("qlabel"),
        $"v".as("qv"), $"nrm".as("qn"))
    val c = e.filter($"vec_id" >= 10)
      .select($"vec_id", $"label", $"v", $"nrm")
    val scored = c.join(broadcast(q), $"label" =!= $"qlabel")
      .withColumn("cos", dot($"qv", $"v") / ($"qn" * $"nrm"))
    topkByKey(scored, 5, "query_id", "cos", "score", "rn")
  }

  val hardNegativesSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |                     (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
      |      FROM e WHERE vec_id < 10),
      |c AS (SELECT vec_id, label, v, nrm FROM e WHERE vec_id >= 10),
      |sc AS (
      |  SELECT query_id, vec_id,
      |    list_reduce(list_transform(range(1, 65), i -> qv[i] * v[i]),
      |                (a, b) -> a + b) / (qn * nrm) AS cos
      |  FROM q JOIN c ON c.label <> q.qlabel),
      |rk AS (
      |  SELECT query_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
      |  FROM sc)
      |SELECT query_id, vec_id, ROUND(cos, 6) AS score, CAST(rn AS INT) AS rn
      |FROM rk WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** q_similarity_mips entry: MAXIMUM-INNER-PRODUCT top-10 — the
    * retrieval objective of recommender and two-tower ranking models,
    * where vector NORM carries signal (popularity, confidence) and
    * cosine's normalization would erase it; on this corpus the MIPS
    * and cosine rankings genuinely differ. Same bounded
    * [[TopKByScore]] shape as [[topk]]; the spec additionally proves
    * the Shrivastava–Li norm-augmentation reduction (NeurIPS 2014):
    * appending √(M²−‖x‖²) to corpus vectors and 0 to queries makes
    * cosine order equal MIPS order — the published bridge that lets
    * every cosine-ANN index here serve MIPS. */
  def mipsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val c = e.filter($"vec_id" >= 10).select($"vec_id", $"v")
    val scored = c.join(broadcast(q))
      .withColumn("ip", dot($"qv", $"v"))
    topkByKey(scored, 10, "query_id", "ip", "score", "rn")
  }

  val mipsSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 10),
      |sc AS (
      |  SELECT query_id, vec_id,
      |    list_reduce(list_transform(range(1, 65), i -> qv[i] * v[i]),
      |                (a, b) -> a + b) AS ip
      |  FROM q, c),
      |rk AS (
      |  SELECT query_id, vec_id, ip,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ip DESC, vec_id ASC) AS rn
      |  FROM sc)
      |SELECT query_id, vec_id, ROUND(ip, 6) AS score, CAST(rn AS INT) AS rn
      |FROM rk WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  /** q_embed_matryoshka entry: PREFIX-TRUNCATION retrieval-fidelity
    * audit — the check a Matryoshka-representation deployment (MRL,
    * Kusupati et al., NeurIPS 2022) runs before serving truncated
    * vectors: re-rank each query's cosine top-10 using only the first
    * 16 / 32 / 64 dims (renormalized) and report overlap@10 with the
    * full-width ranking plus whether the top-1 survives. The 64-dim
    * rows are the in-result control (overlap must be 10), so the
    * output is self-validating.
    *
    * Scale shape: one broadcast-bounded query set × corpus scan per
    * width through the same [[TopKByScore]] bounded aggregator as
    * [[topk]]; the overlap join runs on the ≤ queries×widths×10 result
    * frames. Determinism: truncated dots/norms are [[dot]] left-fold
    * chains over slices — bit-identical to the oracle's list_reduce —
    * and every ranking tie-breaks on vec_id. */
  def matryoshkaQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = vecs(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val c = e.filter($"vec_id" >= 10).select($"vec_id", $"v")
    val scored = c.join(broadcast(q))
    def ranked(d: Int): DataFrame =
      topkByKey(
        scored.withColumn("cos",
          dot(slice($"qv", 1, d), slice($"v", 1, d)) /
            (sqrt(dot(slice($"qv", 1, d), slice($"qv", 1, d))) *
              sqrt(dot(slice($"v", 1, d), slice($"v", 1, d))))),
        10, "query_id", "cos", "score", "rn")
        .withColumn("dims", lit(d.toLong))
    val top = ranked(16).unionByName(ranked(32)).unionByName(ranked(64))
    val full = top.filter($"dims" === 64)
      .select($"query_id", $"vec_id", $"rn".as("rn_full"))
    val t1f = full.filter($"rn_full" === 1)
      .select($"query_id", $"vec_id".as("top1_full"))
    val t1t = top.filter($"rn" === 1)
      .select($"query_id", $"dims", $"vec_id".as("top1_trunc"))
    val ov = top
      .join(full.select($"query_id", $"vec_id"), Seq("query_id", "vec_id"),
        "left_semi")
      .groupBy($"query_id", $"dims").agg(count(lit(1)).as("overlap10"))
    t1t.join(ov, Seq("query_id", "dims"), "left")
      .join(broadcast(t1f), "query_id")
      .select($"query_id", $"dims",
        coalesce($"overlap10", lit(0L)).as("overlap10"),
        $"top1_full", $"top1_trunc",
        ($"top1_full" === $"top1_trunc").cast("int").as("top1_match"))
      .orderBy($"query_id", $"dims")
  }

  val matryoshkaSql: String =
    """WITH e AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS MATERIALIZED (
      |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |c AS MATERIALIZED (SELECT vec_id, v FROM e WHERE vec_id >= 10),
      |sc AS MATERIALIZED (
      |  SELECT query_id, vec_id, d.d AS dims,
      |    list_reduce(list_transform(range(1, d.d + 1), i -> qv[i] * v[i]),
      |                (a, b) -> a + b)
      |    / (sqrt(list_reduce(list_transform(range(1, d.d + 1), i -> qv[i] * qv[i]),
      |                        (a, b) -> a + b))
      |       * sqrt(list_reduce(list_transform(range(1, d.d + 1), i -> v[i] * v[i]),
      |                          (a, b) -> a + b))) AS cos
      |  FROM q, c, (VALUES (16), (32), (64)) d(d)),
      |rk AS MATERIALIZED (
      |  SELECT query_id, vec_id, dims,
      |    ROW_NUMBER() OVER (PARTITION BY query_id, dims
      |      ORDER BY cos DESC, vec_id ASC) AS rn
      |  FROM sc),
      |top AS MATERIALIZED (SELECT * FROM rk WHERE rn <= 10),
      |f64 AS MATERIALIZED (
      |  SELECT query_id, vec_id, rn FROM top WHERE dims = 64),
      |ov AS (
      |  SELECT t.query_id, t.dims, CAST(COUNT(f.vec_id) AS BIGINT) AS overlap10
      |  FROM top t LEFT JOIN f64 f
      |    ON f.query_id = t.query_id AND f.vec_id = t.vec_id
      |  GROUP BY 1, 2),
      |t1f AS (SELECT query_id, vec_id AS top1_full FROM f64 WHERE rn = 1),
      |t1t AS (SELECT query_id, dims, vec_id AS top1_trunc FROM top WHERE rn = 1)
      |SELECT t.query_id, CAST(t.dims AS BIGINT) AS dims, ov.overlap10,
      |  f.top1_full, t.top1_trunc,
      |  CAST(f.top1_full = t.top1_trunc AS INT) AS top1_match
      |FROM t1t t JOIN ov ON ov.query_id = t.query_id AND ov.dims = t.dims
      |  JOIN t1f f ON f.query_id = t.query_id
      |ORDER BY t.query_id, t.dims""".stripMargin

  // --- registry -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_hard_negatives" -> hardNegativesQ,
    "q_embed_matryoshka" -> matryoshkaQ,
    "q_similarity_topk" -> topk,
    "q_similarity_mips" -> mipsQ,
    "q_similarity_ann" -> annCheck,
    "q_similarity_ivf" -> ivfCheck,
    "q_ivf_sensitivity" -> ivfSensitivityQ,
    "q_similarity_ivf_search" -> ivfSearchCheck,
    "q_similarity_knn_graph" -> ((s, dir) => knnGraphCheck(s, dir)))

  /** The ANN entries emit a deterministic recall gate (see
    * [[recallCheck]]) so the driver records a full hash-compared row;
    * raw approximate top-k output is exercised by the recall specs. */
  def oracle: Map[String, String] = Map(
    "q_embed_hard_negatives" -> hardNegativesSql,
    "q_embed_matryoshka" -> matryoshkaSql,
    "q_similarity_topk" -> topkSql,
    "q_similarity_mips" -> mipsSql,
    "q_similarity_ann" -> recallCheckSql,
    "q_similarity_ivf" -> recallCheckSql,
    "q_ivf_sensitivity" -> ivfSensitivitySql,
    "q_similarity_ivf_search" -> recallCheckSql,
    "q_similarity_knn_graph" -> knnGraphCheckSql)
}
