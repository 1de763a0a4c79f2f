package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches — the incremental-ingest shape for
  * cardinality tracking at 100 TB. `approx_count_distinct`
  * (q_agg_approx_distinct) answers "how many distinct NOW" with one
  * pass; this module materializes the sketch ITSELF (Spark's
  * DataSketches-backed HLL, binary-typed) as a durable per-source
  * artifact, because at scale the question is incremental: yesterday's
  * corpus is 100 TB you must not rescan, so yesterday IS a KB-sized
  * sketch row and today's batch unions into it —
  * `hll_union_agg` is associative and commutative, so daily/sourcewise
  * sketches merge in any order, across any partitioning, on any worker.
  *
  * Correctness gate, not a printed estimate: like the ANN recall gates
  * ([[Similarity]]), the query re-derives the EXACT distinct count
  * in-plan and emits a boolean per group asserting the estimate lands
  * within the sketch's error envelope (lgConfigK = 12 → RSE ≈ 1.04 /
  * √2¹² ≈ 1.6%; the gate allows 5% or ±2 absolute for tiny groups,
  * where dense-mode HLL is exact anyway). The DuckDB twin computes the
  * exact counts and expects every gate true — sketch bytes never cross
  * engines (DuckDB's own HLL is a different implementation; the
  * CONTRACT is the error envelope, which is the portable statement).
  *
  * Artifact pattern matches [[Similarity.IvfArtifact]] /
  * [[Dedup.PairArtifact]]: built once per JVM, persisted as parquet,
  * consumers pay a KB-sized read. */
object Sketches {

  /** Per-source HLL sketches of the distinct token population:
    * (source, sk binary, n_rows). One scan-speed aggregate; the result
    * is O(sources) rows × ~KB regardless of corpus size. */
  def tokenSketches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .groupBy($"source")
      .agg(hll_sketch_agg($"tok", lit(12)).as("sk"),
        count(lit(1)).as("n_tokens"))
  }

  /** Built once per JVM, persisted as parquet — the durable form a
    * pipeline stores per ingestion batch and re-merges forever after. */
  private object SketchArtifact {
    private lazy val root =
      java.nio.file.Files.createTempDirectory("graft-hll-").toString
    private val built = scala.collection.mutable.HashMap.empty[String, String]
    def of(s: SparkSession, dir: String): DataFrame = synchronized {
      val k = Artifacts.tableKey(s, dir, "documents")
      val p = built.getOrElseUpdate(k, {
        val path = s"$root/$k"
        tokenSketches(s, dir).write.mode("overwrite").parquet(path)
        path
      })
      s.read.parquet(p)
    }
  }

  /** q_agg_hll_merge entry: estimates from the persisted per-source
    * sketches, a global estimate from their union, and an in-plan gate
    * against the exact distinct counts. Output is engine-portable:
    * (source, n_exact, est_ok) — the estimate itself stays internal. */
  def hllMergeQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sk = SketchArtifact.of(s, dir)
    val perSource = sk.select($"source", hll_sketch_estimate($"sk").as("est"))
    val global = sk.agg(hll_union_agg($"sk").as("sk"))
      .select(lit("ALL").as("source"), hll_sketch_estimate($"sk").as("est"))
    val toks = t(s, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
    val exactPer = toks.groupBy($"source")
      .agg(countDistinct($"tok").as("n_exact"))
    val exactAll = toks.agg(countDistinct($"tok").as("n_exact"))
      .select(lit("ALL").as("source"), $"n_exact")
    perSource.unionByName(global)
      .join(exactPer.unionByName(exactAll), "source")
      .select($"source", $"n_exact",
        (abs($"est" - $"n_exact").cast("double") <=
          greatest(lit(2d), $"n_exact" * 0.05)).cast("int").as("est_ok"))
      .orderBy($"source")
  }

  /** DuckDB twin: exact distinct counts; every envelope gate must hold. */
  val hllMergeSql: String =
    """WITH e AS (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |per AS (SELECT source, COUNT(DISTINCT tok) AS n_exact FROM e GROUP BY source),
      |allr AS (SELECT 'ALL' AS source, COUNT(DISTINCT tok) AS n_exact FROM e)
      |SELECT source, n_exact, 1 AS est_ok FROM per
      |UNION ALL SELECT source, n_exact, 1 AS est_ok FROM allr
      |ORDER BY source""".stripMargin

  private val OverlapSrcs = Seq("src0", "src1", "src2", "src3", "src4")

  /** q_hll_overlap entry: AUDIENCE-OVERLAP estimation by sketch
    * INCLUSION–EXCLUSION — for each pair of the five pinned sources,
    * est|A∩B| = est|A| + est|B| − est|A∪B| from the persisted HLL
    * sketches (union via `hll_union`; HLL can merge but NOT intersect,
    * so inclusion–exclusion is how every audience/reach system answers
    * overlap questions from sketches), gated in-plan against the EXACT
    * vocabulary intersection. The gate envelope is wider than
    * [[hllMergeQ]]'s single-estimate bound because three estimate
    * errors compound — that compounding IS the documented cost of
    * sketch intersection, visible here next to the exact truth.
    *
    * Output stays engine-portable ([[hllMergeQ]] discipline): exact
    * counts + the gate bit; estimates stay internal. Scale shape: the
    * pair grid is 10 rows over the bounded sketch artifact; exact
    * intersections ride the vocabulary-bounded token join. */
  def hllOverlapQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sk = SketchArtifact.of(s, dir).filter($"source".isin(OverlapSrcs: _*))
    val pairs = sk.as("a").join(sk.as("b"), $"a.source" < $"b.source")
      .select($"a.source".as("src_a"), $"b.source".as("src_b"),
        hll_sketch_estimate($"a.sk").as("ea"),
        hll_sketch_estimate($"b.sk").as("eb"),
        hll_sketch_estimate(hll_union($"a.sk", $"b.sk")).as("eu"))
      .withColumn("est_inter", $"ea" + $"eb" - $"eu")
    val toks = t(s, dir, "documents")
      .filter($"source".isin(OverlapSrcs: _*))
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .distinct()
    val exact = toks.as("x").join(toks.as("y"),
        $"x.tok" === $"y.tok" && $"x.source" < $"y.source")
      .groupBy($"x.source".as("src_a"), $"y.source".as("src_b"))
      .agg(count(lit(1)).as("n_exact_inter"))
    val sizes = toks.groupBy($"source").agg(count(lit(1)).as("n"))
    pairs.join(exact, Seq("src_a", "src_b"))
      .join(sizes.select($"source".as("src_a"), $"n".as("n_exact_a")), "src_a")
      .join(sizes.select($"source".as("src_b"), $"n".as("n_exact_b")), "src_b")
      .select($"src_a", $"src_b", $"n_exact_a", $"n_exact_b",
        $"n_exact_inter",
        (abs($"est_inter" - $"n_exact_inter").cast("double") <=
          greatest(lit(50d), $"n_exact_inter" * 0.15)).cast("int")
          .as("incl_excl_ok"))
      .orderBy($"src_a", $"src_b")
  }

  /** DuckDB twin: exact pairwise vocabulary intersections; every
    * inclusion–exclusion gate must hold. */
  val hllOverlapSql: String = {
    val srcs = OverlapSrcs.map(s => s"'$s'").mkString(", ")
    s"""WITH v AS MATERIALIZED (
       |  SELECT DISTINCT source, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents WHERE source IN ($srcs)),
       |sz AS (SELECT source, COUNT(*) AS n FROM v GROUP BY 1),
       |inter AS (
       |  SELECT x.source AS src_a, y.source AS src_b,
       |    COUNT(*) AS n_exact_inter
       |  FROM v x JOIN v y ON x.tok = y.tok AND x.source < y.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b,
       |  CAST(sa.n AS BIGINT) AS n_exact_a, CAST(sb.n AS BIGINT) AS n_exact_b,
       |  CAST(n_exact_inter AS BIGINT) AS n_exact_inter,
       |  1 AS incl_excl_ok
       |FROM inter
       |JOIN sz sa ON sa.source = src_a
       |JOIN sz sb ON sb.source = src_b
       |ORDER BY src_a, src_b""".stripMargin
  }

  /** Cross-source VOCABULARY overlap matrix — the token-level
    * complement of [[Dedup]]'s doc-level source matrix: for every
    * source pair, the exact distinct-token intersection and its Jaccard
    * similarity. High vocab overlap between two crawl feeds flags
    * mirrored content before any document-level dedup runs — the cheap
    * early-warning the sketch family approximates and this query pins
    * exactly.
    *
    * Scale shape: the corpus collapses to DISTINCT (source, token)
    * first (map-side-combinable; vocabulary-bounded rows per source),
    * the pair join is keyed by token with per-token fan-out ≤
    * |sources|² — never a corpus scan on the join side — and the
    * per-source totals arrive by broadcast. */
  def sourceOverlapQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "documents")
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .distinct()
    val per = e.groupBy($"source").agg(countDistinct($"tok").as("n"))
    val pairs = e.as("a").join(e.as("b"),
        $"a.tok" === $"b.tok" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("s1"), $"b.source".as("s2"))
      .agg(count(lit(1)).as("n_common")) // (source, tok) rows are distinct
    pairs
      .join(broadcast(per.select($"source".as("s1"), $"n".as("n1"))), "s1")
      .join(broadcast(per.select($"source".as("s2"), $"n".as("n2"))), "s2")
      .select($"s1", $"s2", $"n_common", $"n1", $"n2",
        round($"n_common".cast("double") /
          ($"n1" + $"n2" - $"n_common"), 6).as("jaccard"))
      .orderBy($"s1", $"s2")
  }

  val sourceOverlapSql: String =
    """WITH e AS (SELECT DISTINCT source, tok FROM
      |  (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
      |   FROM documents)),
      |per AS (SELECT source, COUNT(*) AS n FROM e GROUP BY source),
      |p AS (SELECT a.source AS s1, b.source AS s2,
      |    CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM e a JOIN e b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s1, s2, n_common, x.n AS n1, y.n AS n2,
      |  ROUND(CAST(n_common AS DOUBLE) / (x.n + y.n - n_common), 6) AS jaccard
      |FROM p JOIN per x ON p.s1 = x.source JOIN per y ON p.s2 = y.source
      |ORDER BY s1, s2""".stripMargin

  // --- Count-min sketch -----------------------------------------------------

  /** Mergeable count-min frequency sketch: a (depth × width) counter
    * grid; each item increments one counter per row (row-seeded hash),
    * a point estimate is the MIN across rows. Merge = elementwise sum —
    * associative/commutative like the HLL sketch above, so per-batch /
    * per-source grids union in any order. The buffer is the input
    * POSITIONS, not tokens: the row hashes are computed in SQL
    * (`hash(tok, r)` — Spark's codegen murmur3) before the typed
    * aggregator, so the estimate side reuses the identical expressions
    * and no hash function is ever re-implemented in two places. */
  final class CmsAgg(size: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](size)
    override def reduce(b: Array[Long], pos: Seq[Int]): Array[Long] = {
      pos.foreach(p => b(p) += 1L); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < size) { a(i) += b(i); i += 1 }; a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  private val CmsDepth = 4
  private val CmsWidth = 2048

  /** The d absolute grid positions of a token, as one SQL expression —
    * shared verbatim by the build side and the estimate side. */
  private def cmsPositions(tok: Column): Column =
    array((0 until CmsDepth).map(r =>
      pmod(hash(tok, lit(r)), lit(CmsWidth)) + lit(r * CmsWidth)): _*)

  /** q_agg_cms entry: CMS-estimate the 40 most frequent tokens and gate
    * the estimates against the exact counts, in-plan: est ≥ exact holds
    * unconditionally (counters only ever over-count), and the excess is
    * gated at 32·N/width — by Markov each row's excess exceeds t·N/w
    * with prob ≤ 1/t, so the min over 4 independent rows fails at
    * ~t⁻⁴ = 1e-6 per candidate; with this fixture's vocabulary it would
    * take 3+ same-row collisions on every row, measured safe at sf0.001
    * through 0.1. Like the HLL gate, sketch internals never cross
    * engines — the DuckDB twin recomputes the exact counts and expects
    * every gate true.
    *
    * Scale shape: the sketch build is one pass with O(d·w) state per
    * partition merged map-side (32 KB — the whole corpus's frequency
    * table in one bounded row); the candidate side is an exact count of
    * 40 keys; the estimate is a broadcast of the 1-row grid. */
  def cmsQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") > 0)
    val sk = toks.select(cmsPositions($"tok").as("pos"))
      .as[Seq[Int]]
      .select(new CmsAgg(CmsDepth * CmsWidth).toColumn.name("sk"))
    val tot = toks.agg(count(lit(1)).cast("double").as("n_tot"))
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"tok").limit(40)
    val est = (0 until CmsDepth)
      .map(r => element_at($"sk", element_at($"pos", r + 1) + 1))
      .reduce(least(_, _))
    exact.crossJoin(broadcast(sk)).crossJoin(broadcast(tot))
      .withColumn("pos", cmsPositions($"tok"))
      .withColumn("est", est)
      .select($"tok", $"n_exact",
        ($"est" >= $"n_exact").cast("int").as("est_ge_exact"),
        ($"est" - $"n_exact" <= lit(32d) * $"n_tot" / lit(CmsWidth))
          .cast("int").as("est_within_bound"))
      .orderBy($"n_exact".desc, $"tok")
  }

  val cmsSql: String =
    """WITH e AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents)
      |SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact,
      |  1 AS est_ge_exact, 1 AS est_within_bound
      |FROM e WHERE len(tok) > 0
      |GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 40""".stripMargin

  /** q_join_size_est entry: SELF-JOIN SIZE (second frequency moment F₂)
    * estimation from a count-min grid — the AMS/CMS technique a planner
    * uses to predict whether a key's join or sessionization self-join
    * will explode, BEFORE paying for it. For each keyspace (event
    * user_ids, lineitem part keys) every row increments one counter per
    * grid row (d=4 row-seeded hashes into w=1024 buckets); the estimate
    * is min over rows of Σ_b c_b² — an upper bound on the true
    * Σ_k c_k² that collisions can only inflate. The exact F₂ rides
    * along as the row's own accuracy audit: excess ≥ 0 always, and the
    * Markov gate excess·w ≤ 32·N² holds per row with prob ≥ 1−1/32, so
    * the min over 4 independent rows fails at ~1e-6.
    *
    * 100 TB shape: the sketch side NEVER shuffles by the raw key — the
    * grid is d·w bounded cells built map-side-combinable; at real scale
    * you'd publish the grid per ingestion batch (merge = cell-wise sum)
    * and skip the exact side entirely. Determinism: positions come from
    * [[Hashing.md5Long60]] (the pinned cross-engine hash); every count
    * casts to DECIMAL BEFORE its square (a cell count reaches row
    * scale, so the int64 square wraps past 3·10⁹ — the q_stat_ad
    * overflow class), the comparison tail stays exact DECIMAL, and the
    * F2 columns leave as correctly-rounded doubles (F2 ≤ N² fits no
    * 64-bit integer at the design scale; exact below 2⁵³, identical in
    * both engines beyond). The estimate is bit-reproducible — unlike
    * the envelope-gated q_agg_cms, the oracle compares EST values
    * exactly. */
  def joinSizeEstQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = 4
    val w = 1024
    // r15 (guide §2.5): 4 string-md5s per row is the expensive map
    // stage, and the single-row-group test files plan lineitem as ONE
    // scan partition (measured: one 2.6 s task owns the whole stage) —
    // spread the narrow key rows before hashing; identity on real
    // many-split tables
    val ks = graft.Tables.spread(t(s, dir, "events")
      .select(lit("events.user_id").as("keyspace"),
        $"user_id".cast("string").as("k"))
      .unionAll(t(s, dir, "lineitem")
        .select(lit("lineitem.l_partkey").as("keyspace"),
          $"l_partkey".cast("string").as("k"))))
    val cells = ks
      .select($"keyspace", posexplode(array((0 until d).map(r =>
        Hashing.md5Long60(concat($"k", lit(s":$r"))) % w): _*))
        .as(Seq("r", "b")))
      .groupBy($"keyspace", $"r", $"b").agg(count(lit(1)).as("c"))
    // r14: squares cast BEFORE the multiply (c reaches row scale, so
    // c·c in int64 wraps past c ≈ 3·10⁹ — the q_stat_ad class); the
    // whole comparison tail stays exact DECIMAL (excess·w and 32·N²
    // reach N², past int64 at the same point), and the F2 columns
    // leave as correctly-rounded doubles (exact below 2⁵³; F2 ≤ N²
    // fits NO fixed 64-bit type at the design scale).
    def sq(c: Column) = c.cast("decimal(19,0)") * c
    val est = cells.groupBy($"keyspace", $"r")
      .agg(sum(sq($"c")).as("e"))
      .groupBy($"keyspace")
      .agg(min($"e").as("est_f2"))
    val exact = ks.groupBy($"keyspace", $"k").agg(count(lit(1)).as("c"))
      .groupBy($"keyspace")
      .agg(sum(sq($"c")).as("exact_f2"),
        sum($"c").cast("long").as("n_rows"))
    est.join(exact, "keyspace")
      .select($"keyspace", $"n_rows",
        lit(d.toLong).as("depth"), lit(w.toLong).as("width"),
        $"est_f2".cast("double").as("est_f2"),
        $"exact_f2".cast("double").as("exact_f2"),
        ($"est_f2" - $"exact_f2").cast("double").as("excess"),
        expr("(10000 * (est_f2 - exact_f2)) div exact_f2").as("rel_err_bp"),
        (($"est_f2" - $"exact_f2") * w <=
          lit(32).cast("decimal(19,0)") * $"n_rows" * $"n_rows")
          .cast("int").as("bound_ok"))
      .orderBy($"keyspace")
  }

  val joinSizeEstSql: String =
    """WITH ks AS (
      |  SELECT 'events.user_id' AS keyspace, user_id::VARCHAR AS k
      |  FROM events
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey', l_partkey::VARCHAR FROM lineitem),
      |cells AS (
      |  SELECT keyspace, r.x AS r,
      |    ('0x' || substr(md5(k || ':' || r.x::VARCHAR), 1, 15))
      |      ::UBIGINT::BIGINT % 1024 AS b,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM ks CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS x) r
      |  GROUP BY 1, 2, 3),
      |est AS (
      |  SELECT keyspace, MIN(e) AS est_f2
      |  FROM (SELECT keyspace, r,
      |          SUM(CAST(c AS HUGEINT) * c) AS e
      |        FROM cells GROUP BY 1, 2)
      |  GROUP BY 1),
      |ex AS (
      |  SELECT keyspace,
      |    SUM(CAST(c AS HUGEINT) * c) AS exact_f2,
      |    CAST(SUM(c) AS BIGINT) AS n_rows
      |  FROM (SELECT keyspace, k, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM ks GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT e.keyspace, x.n_rows,
      |  CAST(4 AS BIGINT) AS depth, CAST(1024 AS BIGINT) AS width,
      |  CAST(e.est_f2 AS DOUBLE) AS est_f2,
      |  CAST(x.exact_f2 AS DOUBLE) AS exact_f2,
      |  CAST(e.est_f2 - x.exact_f2 AS DOUBLE) AS excess,
      |  CAST((10000 * (e.est_f2 - x.exact_f2)) // x.exact_f2
      |    AS BIGINT) AS rel_err_bp,
      |  CAST((e.est_f2 - x.exact_f2) * 1024
      |      <= 32 * CAST(x.n_rows AS HUGEINT) * x.n_rows
      |    AS INTEGER) AS bound_ok
      |FROM est e JOIN ex x ON e.keyspace = x.keyspace
      |ORDER BY e.keyspace""".stripMargin

  /** q_bloom_fp entry: Bloom-filter behavior, measured exactly — build
    * an m=4096-bit, k=3 filter over the TRAIN split's content digests
    * (bit positions are md5-derived, the cross-engine hash contract),
    * probe every TEST doc, and report the observed false-positive rate
    * in basis points next to the filter's actual bit load. Every test
    * doc is a true negative (contents are distinct), so every positive
    * IS a false positive — the query measures exactly the quantity the
    * (m, k, n) theory predicts, and the spec checks the prediction.
    *
    * Distributed shape of a Bloom build at scale: the filter is the
    * DISTINCT SET of set-bit positions (≤ m rows — a combinable
    * distinct, not a bit-array in driver memory); membership probes
    * join the k probe positions against it and demand k hits. All
    * integers end to end. */
  def bloomFpQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = 4096
    val k = 3
    val docs = t(s, dir, "documents")
      .withColumn("split", Hashing.splitLabel($"doc_id".cast("string")))
      .withColumn("sha", sha2($"text", 256))
    def pos(i: Int): Column =
      Hashing.md5Long60(concat($"sha", lit(s":$i"))) % m
    val bits = docs.filter($"split" === "train")
      .select(explode(array((0 until k).map(pos): _*)).as("b"))
      .distinct()
      .withColumn("hit", lit(1L))
    val probes = docs.filter($"split" === "test")
      .select($"doc_id", posexplode(array((0 until k).map(pos): _*))
        .as(Seq("i", "b")))
    val perDoc = probes.join(bits, Seq("b"), "left")
      .groupBy($"doc_id")
      .agg((sum(coalesce($"hit", lit(0L))) === k).as("bloom_positive"))
    val trainN = docs.filter($"split" === "train")
      .agg(count(lit(1)).as("n_train"))
    perDoc
      .agg(count(lit(1)).as("n_test"),
        sum(when($"bloom_positive", 1L).otherwise(0L)).as("n_false_pos"))
      .crossJoin(broadcast(trainN))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("bits_set"))))
      .select(lit(m.toLong).as("m_bits"), lit(k.toLong).as("k_hashes"),
        $"n_train", $"bits_set", $"n_test", $"n_false_pos",
        expr("(10000 * n_false_pos) div n_test").as("fp_bp"))
  }

  val bloomFpSql: String =
    """WITH d AS (
      |  SELECT doc_id, sha256(text) AS sha,
      |    CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
      |           ::UBIGINT::BIGINT % 100 < 80 THEN 'train'
      |         WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
      |           ::UBIGINT::BIGINT % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |bits AS (
      |  SELECT DISTINCT
      |    ('0x' || substr(md5(sha || ':' || i.x::VARCHAR), 1, 15))
      |      ::UBIGINT::BIGINT % 4096 AS b
      |  FROM d CROSS JOIN (SELECT unnest([0, 1, 2]) AS x) i
      |  WHERE split = 'train'),
      |probes AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(sha || ':' || i.x::VARCHAR), 1, 15))
      |      ::UBIGINT::BIGINT % 4096 AS b
      |  FROM d CROSS JOIN (SELECT unnest([0, 1, 2]) AS x) i
      |  WHERE split = 'test'),
      |per AS (
      |  SELECT p.doc_id,
      |    (SUM(CASE WHEN bits.b IS NOT NULL THEN 1 ELSE 0 END) = 3)
      |      AS bloom_positive
      |  FROM probes p LEFT JOIN bits ON p.b = bits.b
      |  GROUP BY p.doc_id)
      |SELECT CAST(4096 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k_hashes,
      |  (SELECT COUNT(*) FROM d WHERE split = 'train') AS n_train,
      |  (SELECT COUNT(*) FROM bits) AS bits_set,
      |  COUNT(*) AS n_test,
      |  CAST(SUM(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_false_pos,
      |  CAST((10000 * SUM(CASE WHEN bloom_positive THEN 1 ELSE 0 END))
      |    // COUNT(*) AS BIGINT) AS fp_bp
      |FROM per""".stripMargin

  private val ThetaK = 100
  private val Hash60Max = 1.152921504606846976e18 // 2^60 as an exact double

  /** q_agg_theta entry: θ-SKETCH (KMV) SET-OPERATION estimates between
    * the src0 and src1 vocabularies — the sketch family that, unlike
    * HLL, supports INTERSECTION and difference estimates: keep each
    * set's k smallest hash values; θ = min of the two k-th minima; the
    * union estimate is |{h < θ}|·2⁶⁰/θ over the merged sketch and the
    * intersection estimate counts only hashes both sketches retain.
    * This is how data platforms answer "how many users/tokens do these
    * two feeds SHARE?" without co-shuffling the raw sets (Theta
    * sketches in Druid/DataSketches). Exact counts and relative errors
    * ride along so the row is its own accuracy audit.
    *
    * Determinism: the hash is the pinned [[Hashing.md5Long60]], so the
    * k-minima, θ, and every estimate are bit-identical cross-engine —
    * a θ-sketch can be ORACLE-CHECKED exactly, which no randomized-
    * hash implementation allows. Scale shape: per-source k-minima come
    * from one vocabulary-bounded window; everything downstream is
    * ≤2k-row frames. */
  def thetaQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // universe: distinct customer keys ACTIVE in 1996 vs in 1998 —
    // year-long activity windows overlap only through customers who
    // ordered in both years, so the intersection is a strict subset of
    // the union at every SF (part-level slices saturate — every part
    // ships in every band — and the closed ~31-token text vocabulary
    // is below any useful k)
    val o = t(s, dir, "orders")
    def yr(y: Int, tag: String) = o
      .filter(year($"o_orderdate") === y)
      .select(lit(tag).as("source"), $"o_custkey".cast("string").as("tok"))
    val e = yr(1996, "y1996").unionByName(yr(1998, "y1998"))
      .distinct()
      .withColumn("h", Hashing.md5Long60($"tok"))
    val sk = e
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"h")))
      .filter($"rn" <= ThetaK)
    val theta = sk.filter($"rn" === ThetaK)
      .agg(min($"h").as("theta")) // min of the two k-th minima
    val merged = sk.select($"source", $"h")
      .crossJoin(broadcast(theta))
      .filter($"h" < $"theta")
    val counts = merged.groupBy($"h", $"theta")
      .agg(count(lit(1)).as("n_src"))
      .groupBy($"theta")
      .agg(count(lit(1)).as("s_union"),
        sum(when($"n_src" === 2, 1L).otherwise(0L)).as("s_both"))
    val exact = e.groupBy($"tok").agg(count(lit(1)).as("n_src"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when($"n_src" === 2, 1L).otherwise(0L)).as("exact_inter"))
    counts.crossJoin(broadcast(exact))
      .select(lit(ThetaK.toLong).as("k"), $"s_union", $"s_both",
        round($"s_union".cast("double") * Hash60Max /
          $"theta".cast("double"), 3).as("est_union"),
        round($"s_both".cast("double") * Hash60Max /
          $"theta".cast("double"), 3).as("est_inter"),
        $"exact_union", $"exact_inter",
        round(abs($"s_union".cast("double") * Hash60Max /
          $"theta".cast("double") - $"exact_union") /
          $"exact_union", 6).as("err_union"),
        round(abs($"s_both".cast("double") * Hash60Max /
          $"theta".cast("double") - $"exact_inter") /
          $"exact_inter", 6).as("err_inter"))
  }

  val thetaSql: String =
    s"""WITH e AS (
      |  SELECT DISTINCT source, tok FROM (
      |    SELECT 'y1996' AS source, CAST(o_custkey AS VARCHAR) AS tok
      |    FROM orders WHERE year(o_orderdate) = 1996
      |    UNION ALL
      |    SELECT 'y1998' AS source, CAST(o_custkey AS VARCHAR) AS tok
      |    FROM orders WHERE year(o_orderdate) = 1998)),
      |h AS (
      |  SELECT source, tok,
      |    ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT AS h
      |  FROM e),
      |sk AS (
      |  SELECT source, h,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
      |  FROM h QUALIFY rn <= $ThetaK),
      |th AS (SELECT MIN(h) AS theta FROM sk WHERE rn = $ThetaK),
      |m AS (SELECT sk.h, th.theta FROM sk, th WHERE sk.h < th.theta),
      |c AS (
      |  SELECT theta, CAST(COUNT(*) AS BIGINT) AS s_union,
      |    CAST(SUM(CASE WHEN n_src = 2 THEN 1 ELSE 0 END) AS BIGINT) AS s_both
      |  FROM (SELECT h, theta, COUNT(*) AS n_src FROM m GROUP BY 1, 2)
      |  GROUP BY theta),
      |ex AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
      |    CAST(SUM(CASE WHEN n_src = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS exact_inter
      |  FROM (SELECT tok, COUNT(*) AS n_src FROM e GROUP BY tok))
      |SELECT CAST($ThetaK AS BIGINT) AS k, s_union, s_both,
      |  ROUND(CAST(s_union AS DOUBLE) * $Hash60Max
      |    / CAST(theta AS DOUBLE), 3) AS est_union,
      |  ROUND(CAST(s_both AS DOUBLE) * $Hash60Max
      |    / CAST(theta AS DOUBLE), 3) AS est_inter,
      |  exact_union, exact_inter,
      |  ROUND(ABS(CAST(s_union AS DOUBLE) * $Hash60Max
      |    / CAST(theta AS DOUBLE) - exact_union) / exact_union, 6) AS err_union,
      |  ROUND(ABS(CAST(s_both AS DOUBLE) * $Hash60Max
      |    / CAST(theta AS DOUBLE) - exact_inter) / exact_inter, 6) AS err_inter
      |FROM c, ex""".stripMargin

  /** q_join_bloom entry: BLOOM-PREFILTERED SEMI-JOIN AUDIT — THE
    * 100 TB join trick: before shuffling a huge probe table against a
    * selective build side, ship a Bloom filter of the build keys to
    * the probe scan and drop non-members at scan speed (what Spark's
    * own `spark.sql.optimizer.runtimeFilter.bloomFilter` injects).
    * Build = BUILDING-segment customers (k=3 seeded md5 hashes into
    * m=2¹⁷ bits); probe = every order's custkey. The audit reports the
    * filter's selectivity, the EXACT semi-join truth, the
    * false-positive count/rate, and the bit fill — the numbers that
    * decide whether the runtime filter pays for itself (fp rate
    * ≈ (1−e^(−kn/m))^k; fill ≈ 1−e^(−kn/m)).
    *
    * Scale shape: the oracle-checkable dataflow twin — bit indices are
    * a combinable distinct collapse of the build side (≤ k·|build|
    * rows); the probe explodes to 3 index rows and hash-joins the
    * bitset (narrow 8-byte keys), membership = all-3-matched. A
    * production cluster would broadcast the m/8-byte bitmap into a
    * native scan predicate instead of the index join — same semantics,
    * zero probe shuffle; this form is chosen because every bit is
    * oracle-verifiable. Determinism: [[Hashing.md5Long60]] everywhere;
    * counts exact integers; rates integer basis points. */
  def bloomJoinQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = 131072L // 2^17 bits
    def h(j: Int, c: Column): Column =
      Hashing.md5Long60(concat(lit(s"bl$j:"), c.cast("string"))) % m
    val build = t(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val bits = (0 to 2).map(j => build.select(h(j, $"c_custkey").as("idx")))
      .reduce(_ unionAll _).distinct()
    val probe = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    val probeIdx = probe.select($"o_orderkey",
      explode(array((0 to 2).map(j => h(j, $"o_custkey")): _*)).as("idx"))
    val passed = probeIdx.join(bits, "idx")
      .groupBy($"o_orderkey").agg(count(lit(1)).as("hits"))
      .filter($"hits" === 3)
      .select($"o_orderkey")
    val truth = probe.join(build,
      probe("o_custkey") === build("c_custkey"), "left_semi")
      .select($"o_orderkey")
    val agg = probe.agg(count(lit(1)).as("n_probe"))
      .crossJoin(passed.agg(count(lit(1)).as("n_pass")))
      .crossJoin(truth.agg(count(lit(1)).as("n_true")))
      .crossJoin(passed.join(truth, Seq("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_fp")))
      .crossJoin(bits.agg(count(lit(1)).as("bits_set")))
    agg.select(
      $"n_probe".cast("long").as("n_probe"),
      $"n_pass".cast("long").as("n_pass"),
      $"n_true".cast("long").as("n_true"),
      $"n_fp".cast("long").as("n_fp"),
      expr("(10000 * n_fp) div (n_probe - n_true)").as("fp_bp"),
      $"bits_set".cast("long").as("bits_set"),
      lit(m).as("m_bits"),
      expr(s"(10000 * bits_set) div $m").as("fill_bp"))
  }

  val bloomJoinSql: String = {
    def h(j: Int, c: String): String =
      s"('0x' || substr(md5('bl$j:' || CAST($c AS VARCHAR)), 1, 15))" +
        s"::UBIGINT::BIGINT % 131072"
    s"""WITH build AS (
       |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
       |bits AS (
       |  SELECT DISTINCT idx FROM (
       |    SELECT ${h(0, "c_custkey")} AS idx FROM build
       |    UNION ALL SELECT ${h(1, "c_custkey")} FROM build
       |    UNION ALL SELECT ${h(2, "c_custkey")} FROM build)),
       |probe AS (SELECT o_orderkey, o_custkey FROM orders),
       |pidx AS (
       |  SELECT o_orderkey, ${h(0, "o_custkey")} AS idx FROM probe
       |  UNION ALL SELECT o_orderkey, ${h(1, "o_custkey")} FROM probe
       |  UNION ALL SELECT o_orderkey, ${h(2, "o_custkey")} FROM probe),
       |passed AS (
       |  SELECT o_orderkey FROM pidx JOIN bits USING (idx)
       |  GROUP BY o_orderkey HAVING COUNT(*) = 3),
       |truth AS (
       |  SELECT o_orderkey FROM probe
       |  WHERE o_custkey IN (SELECT c_custkey FROM build)),
       |a AS (
       |  SELECT
       |    (SELECT COUNT(*) FROM probe) AS n_probe,
       |    (SELECT COUNT(*) FROM passed) AS n_pass,
       |    (SELECT COUNT(*) FROM truth) AS n_true,
       |    (SELECT COUNT(*) FROM passed
       |     WHERE o_orderkey NOT IN (SELECT o_orderkey FROM truth)) AS n_fp,
       |    (SELECT COUNT(*) FROM bits) AS bits_set)
       |SELECT CAST(n_probe AS BIGINT) AS n_probe,
       |  CAST(n_pass AS BIGINT) AS n_pass,
       |  CAST(n_true AS BIGINT) AS n_true,
       |  CAST(n_fp AS BIGINT) AS n_fp,
       |  CAST((10000 * n_fp) // (n_probe - n_true) AS BIGINT) AS fp_bp,
       |  CAST(bits_set AS BIGINT) AS bits_set,
       |  CAST(131072 AS BIGINT) AS m_bits,
       |  CAST((10000 * bits_set) // 131072 AS BIGINT) AS fill_bp
       |FROM a""".stripMargin
  }

  /** q_bloom_tune entry: BLOOM SIZING SENSITIVITY GRID — the
    * [[bloomJoinQ]] audit swept over filter sizes m ∈ {2¹⁵..2¹⁸} (k=3
    * fixed): per size, the bit fill, the measured false-positive rate
    * on the non-member probe population, and the THEORY rate fill^k
    * beside it. This is the m-vs-memory tuning table a platform team
    * reads before provisioning a runtime filter — the
    * [[graft.ops.MinHashTune]] / ivf_sensitivity harness pattern
    * applied to the third index family: measured, not assumed, and
    * the theory column certifies the implementation tracks the math.
    *
    * Scale shape: 4 grid cells × the bloomJoinQ dataflow (bitset
    * collapse + 3-index probe join); the grid is a bounded dim.
    * Determinism: md5 bits; counts exact; measured rates integer bp,
    * theory one shared exp/log-free chain (pow of an exact ratio). */
  def bloomTuneQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val build = t(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val probe = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    val truth = probe.join(build,
      probe("o_custkey") === build("c_custkey"), "left_semi")
      .select($"o_orderkey")
    def cell(m: Long): DataFrame = {
      def h(j: Int, c: Column): Column =
        Hashing.md5Long60(concat(lit(s"bl$j:"), c.cast("string"))) % m
      val bits = (0 to 2).map(j => build.select(h(j, $"c_custkey").as("idx")))
        .reduce(_ unionAll _).distinct()
      val passed = probe.select($"o_orderkey",
          explode(array((0 to 2).map(j => h(j, $"o_custkey")): _*)).as("idx"))
        .join(bits, "idx")
        .groupBy($"o_orderkey").agg(count(lit(1)).as("hits"))
        .filter($"hits" === 3)
        .select($"o_orderkey")
      probe.agg(count(lit(1)).as("n_probe"))
        .crossJoin(truth.agg(count(lit(1)).as("n_true")))
        .crossJoin(passed.join(truth, Seq("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_fp")))
        .crossJoin(bits.agg(count(lit(1)).as("bits_set")))
        .select(lit(m).as("m_bits"),
          $"bits_set".cast("long").as("bits_set"),
          expr(s"(10000 * bits_set) div $m").as("fill_bp"),
          $"n_fp".cast("long").as("n_fp"),
          expr("(10000 * n_fp) div (n_probe - n_true)").as("fp_bp"),
          round(lit(10000.0) *
            ($"bits_set".cast("double") / m) *
            ($"bits_set".cast("double") / m) *
            ($"bits_set".cast("double") / m), 6).as("theory_fp_bp"))
    }
    Seq(32768L, 65536L, 131072L, 262144L).map(cell).reduce(_ unionAll _)
      .orderBy($"m_bits")
  }

  val bloomTuneSql: String = {
    def cell(m: Long): String = {
      def h(j: Int, c: String): String =
        s"('0x' || substr(md5('bl$j:' || CAST($c AS VARCHAR)), 1, 15))" +
          s"::UBIGINT::BIGINT % $m"
      s"""SELECT CAST($m AS BIGINT) AS m_bits,
         |  CAST((SELECT COUNT(*) FROM (
         |    SELECT DISTINCT idx FROM (
         |      SELECT ${h(0, "c_custkey")} AS idx FROM build
         |      UNION ALL SELECT ${h(1, "c_custkey")} FROM build
         |      UNION ALL SELECT ${h(2, "c_custkey")} FROM build)))
         |    AS BIGINT) AS bits_set,
         |  CAST((SELECT COUNT(*) FROM (
         |    SELECT o_orderkey FROM (
         |      SELECT o_orderkey, ${h(0, "o_custkey")} AS idx FROM probe
         |      UNION ALL SELECT o_orderkey, ${h(1, "o_custkey")} FROM probe
         |      UNION ALL SELECT o_orderkey, ${h(2, "o_custkey")} FROM probe) px
         |    JOIN (SELECT DISTINCT idx FROM (
         |      SELECT ${h(0, "c_custkey")} AS idx FROM build
         |      UNION ALL SELECT ${h(1, "c_custkey")} FROM build
         |      UNION ALL SELECT ${h(2, "c_custkey")} FROM build)) bs
         |      USING (idx)
         |    GROUP BY o_orderkey HAVING COUNT(*) = 3) p
         |    WHERE p.o_orderkey NOT IN (SELECT o_orderkey FROM truth))
         |    AS BIGINT) AS n_fp
         |""".stripMargin
    }
    val cells = Seq(32768L, 65536L, 131072L, 262144L).map(cell)
      .mkString("\nUNION ALL\n")
    s"""WITH build AS (
       |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
       |probe AS (SELECT o_orderkey, o_custkey FROM orders),
       |truth AS (
       |  SELECT o_orderkey FROM probe
       |  WHERE o_custkey IN (SELECT c_custkey FROM build)),
       |tot AS (
       |  SELECT (SELECT COUNT(*) FROM probe) AS n_probe,
       |    (SELECT COUNT(*) FROM truth) AS n_true),
       |cells AS (
       |$cells)
       |SELECT m_bits, bits_set,
       |  CAST((10000 * bits_set) // m_bits AS BIGINT) AS fill_bp,
       |  n_fp,
       |  CAST((10000 * n_fp) // (n_probe - n_true) AS BIGINT) AS fp_bp,
       |  ROUND(10000.0 * (CAST(bits_set AS DOUBLE) / m_bits)
       |    * (CAST(bits_set AS DOUBLE) / m_bits)
       |    * (CAST(bits_set AS DOUBLE) / m_bits), 6) AS theory_fp_bp
       |FROM cells CROSS JOIN tot
       |ORDER BY m_bits""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_tune" -> bloomTuneQ,
    "q_join_bloom" -> bloomJoinQ,
    "q_agg_theta" -> thetaQ,
    "q_agg_hll_merge" -> hllMergeQ,
    "q_hll_overlap" -> hllOverlapQ,
    "q_source_overlap" -> sourceOverlapQ,
    "q_agg_cms" -> cmsQ,
    "q_bloom_fp" -> bloomFpQ,
    "q_join_size_est" -> joinSizeEstQ)

  def oracle: Map[String, String] = Map(
    "q_bloom_tune" -> bloomTuneSql,
    "q_join_bloom" -> bloomJoinSql,
    "q_agg_theta" -> thetaSql,
    "q_agg_hll_merge" -> hllMergeSql,
    "q_hll_overlap" -> hllOverlapSql,
    "q_source_overlap" -> sourceOverlapSql,
    "q_agg_cms" -> cmsSql,
    "q_bloom_fp" -> bloomFpSql,
    "q_join_size_est" -> joinSizeEstSql)
}
