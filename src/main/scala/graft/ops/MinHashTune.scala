package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash/LSH parameter sensitivity — the tuning harness behind the
  * production near-dup config. The bands×rows choice is THE recall/cost
  * dial of LSH dedup (collision prob per band = J^rows; miss prob =
  * (1−J^rows)^bands), and the honest way to pick it is to measure
  * recall and candidate volume against exact ground truth on a sample.
  * This operator IS that measurement: from one 16-lane MinHash
  * signature it derives every power-of-two banding (16×1, 8×2, 4×4,
  * 2×8), produces each config's LSH candidate pairs with the SAME
  * band-bucket self-join the production pipeline uses, and scores them
  * against the exact-Jaccard ≥ 0.8 truth set:
  *
  *   bands | rows_per_band | n_candidates | n_captured | recall_bp | precision_bp
  *
  * Reading it: 16×1 captures everything but admits a candidate flood
  * (P(single-lane collision) ≈ background J, so volume → all-pairs);
  * 2×8 is cheap but falls off the recall cliff at J≈0.8. The elbow in
  * between is the config worth running at corpus scale.
  *
  * Cross-engine contract: lanes here are [[Hashing.md5Long60]] of
  * (lane || '|' || shingle) — md5 is the one hash both Spark and the
  * DuckDB oracle compute identically, so signatures, buckets,
  * candidates, and both ratio columns (integer basis points) match
  * byte-for-byte. The production pipeline uses xxhash64 lanes (faster,
  * Spark-codegen'd); lane choice only permutes WHICH random
  * permutation each lane is, not the statistics being measured.
  *
  * Scale: a tuning harness runs on a SAMPLE (the full corpus answer is
  * what you tune to avoid computing). The plan is still the scalable
  * shape — signature aggregation is map-side-combinable over exploded
  * shingles, the candidate step is the keyed band self-join (never
  * all-pairs), and the truth set joins in as a broadcast. The one
  * knowing divergence: the 16×1 row's candidate volume approaches
  * n²·J_background by DESIGN — that row exists to show why you don't
  * ship that config. */
object MinHashTune {

  private val Lanes = 16
  private val RowConfigs = Seq(1, 2, 4, 8) // bands = Lanes / rows

  /** q_minhash_sensitivity: recall/volume grid over band configs. */
  def sensitivityQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // two independent 60-bit lanes per md5 (hex chars 1-15 and 16-30 of
    // the 128-bit digest): 16 lanes cost 8 hashes per shingle, not 16.
    // The digests are materialized in a projection BEFORE the aggregate
    // so the hash count is guaranteed (not left to expression CSE);
    // mirrored exactly in the oracle.
    val exh = Dedup.shingled(s, dir)
      .select($"doc_id", explode($"sh").as("g"))
      .select(Seq($"doc_id") ++ (0 until Lanes / 2).map(i =>
        md5(concat_ws("|", lit(i), $"g")).as(s"h$i")): _*)
    val laneMins = (0 until Lanes).map { j =>
      val off = 1 + 15 * (j % 2)
      min(conv(substring(col(s"h${j / 2}"), off, 15), 16, 10).cast("long"))
        .as(s"s$j")
    }
    val sig = exh.groupBy($"doc_id").agg(laneMins.head, laneMins.tail: _*)
    // every config's band keys from the one signature: 16+8+4+2 rows/doc
    val bandStructs = RowConfigs.flatMap { r =>
      (0 until Lanes / r).map { b =>
        struct(lit(r).as("r"), lit(b).as("band"),
          concat_ws(",", (0 until r).map(i => col(s"s${r * b + i}")): _*)
            .as("bkey"))
      }
    }
    val bands = sig
      .select($"doc_id", explode(array(bandStructs: _*)).as("b"))
      .select($"doc_id", $"b.r".as("r"), $"b.band".as("band"),
        $"b.bkey".as("bkey"))
    val cand = bands.as("x").join(bands.as("y"),
        $"x.r" === $"y.r" && $"x.band" === $"y.band" &&
          $"x.bkey" === $"y.bkey" && $"x.doc_id" < $"y.doc_id")
      .select($"x.r".as("r"), $"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    val truth = Dedup.verifiedPairs(s, dir).select($"doc_a", $"doc_b")
    val scored = cand
      .join(broadcast(truth.withColumn("hit", lit(1L))),
        Seq("doc_a", "doc_b"), "left")
      .groupBy($"r")
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce($"hit", lit(0L))).as("n_captured"))
    // seed frame guarantees a row per config even at zero candidates
    val cfg = RowConfigs.map(r => (Lanes / r, r))
      .toDF("bands", "rows_per_band")
    cfg
      .join(scored, $"rows_per_band" === $"r", "left")
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
      .select($"bands".cast("long").as("bands"),
        $"rows_per_band".cast("long").as("rows_per_band"),
        coalesce($"n_candidates", lit(0L)).as("n_candidates"),
        $"n_true",
        coalesce($"n_captured", lit(0L)).as("n_captured"))
      .withColumn("recall_bp", expr("(10000 * n_captured) div n_true"))
      .withColumn("precision_bp",
        when($"n_candidates" === 0L, lit(0L))
          .otherwise(expr("(10000 * n_captured) div n_candidates")))
      .orderBy($"rows_per_band")
  }

  val sensitivitySql: String =
    s"""${Dedup.shingledSql},
      |ex AS (SELECT doc_id, unnest(sh) AS g FROM shing),
      |lanes AS (
      |  SELECT doc_id, j,
      |    min(('0x' || substr(md5((j // 2)::VARCHAR || '|' || g),
      |                        1 + 15 * (j % 2), 15))
      |        ::UBIGINT::BIGINT) AS v
      |  FROM ex CROSS JOIN (SELECT unnest(range($Lanes)) AS j) l
      |  GROUP BY doc_id, j),
      |cfg AS (SELECT * FROM (VALUES (16, 1), (8, 2), (4, 4), (2, 8))
      |        c(bands, r)),
      |bands AS (
      |  SELECT doc_id, c.bands, c.r, j // c.r AS band,
      |    string_agg(v::VARCHAR, ',' ORDER BY j) AS bkey
      |  FROM lanes CROSS JOIN cfg c
      |  GROUP BY doc_id, c.bands, c.r, j // c.r),
      |cand AS (
      |  SELECT DISTINCT x.r, x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM bands x JOIN bands y
      |    ON x.r = y.r AND x.band = y.band AND x.bkey = y.bkey
      |      AND x.doc_id < y.doc_id),
      |truth AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM shing a JOIN shing b ON a.doc_id < b.doc_id
      |  WHERE CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
      |per AS (
      |  SELECT c.r, COUNT(*) AS n_candidates,
      |    CAST(SUM(CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_captured
      |  FROM cand c LEFT JOIN truth t
      |    ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
      |  GROUP BY c.r)
      |SELECT CAST(cfg.bands AS BIGINT) AS bands,
      |  CAST(cfg.r AS BIGINT) AS rows_per_band,
      |  CAST(COALESCE(p.n_candidates, 0) AS BIGINT) AS n_candidates,
      |  (SELECT COUNT(*) FROM truth) AS n_true,
      |  CAST(COALESCE(p.n_captured, 0) AS BIGINT) AS n_captured,
      |  (10000 * COALESCE(p.n_captured, 0))
      |    // (SELECT COUNT(*) FROM truth) AS recall_bp,
      |  CASE WHEN COALESCE(p.n_candidates, 0) = 0 THEN CAST(0 AS BIGINT)
      |       ELSE (10000 * COALESCE(p.n_captured, 0)) // p.n_candidates
      |  END AS precision_bp
      |FROM cfg LEFT JOIN per p ON cfg.r = p.r
      |ORDER BY rows_per_band""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_minhash_sensitivity" -> sensitivityQ)

  def oracle: Map[String, String] = Map(
    "q_minhash_sensitivity" -> sensitivitySql)
}
