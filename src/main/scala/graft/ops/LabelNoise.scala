package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Label-noise screening by k-nearest-neighbor agreement — the
  * embedding-space audit a labeled training set gets before the labels
  * are trusted (the kNN form of confident learning, Northcutt et al.
  * 2021 / classic Wilson editing): a point whose nearest neighbors
  * vote for a DIFFERENT label than its own is a candidate annotation
  * error, and the per-label disagreement rate localizes which class's
  * annotations are unreliable.
  *
  * Contract (pinned for the oracle): probes are the FIXED-SIZE
  * deterministic panel — the 100 vectors with the smallest
  * `md5(vec_id)` under the [[Hashing.md5Long60]] contract (hash order
  * is a uniform random order with no RNG state, so the panel is a
  * reproducible simple random sample whose SIZE does not grow with
  * the corpus — the property that keeps the audit O(100·n) at any
  * scale; a `% k` stride panel would grow linearly and turn the scan
  * quadratic, measured 159×/decade before this fix). Each probe's
  * k=5 exact cosine neighbors over the full corpus (self excluded),
  * ranked (cos DESC, vec_id ASC);
  * predicted label = neighbor majority with ties broken toward the
  * smallest label; a probe is FLAGGED when the majority disagrees with
  * its own label. Per own-label output: probe count, flagged count,
  * noise rate and mean neighbor-agreement in exact integer basis
  * points.
  *
  * Scale shape: the probe panel is a FIXED-SIZE hash sample (a
  * bounded TakeOrdered, not a corpus-fraction filter) and BROADCAST,
  * so the corpus is
  * scanned once with no corpus-side shuffle of vectors; per-probe
  * top-k state stays ≤k rows map-side via [[TopKByScore]], so only
  * (#probes × k) id rows cross the exchange — the same bounded-
  * aggregator shape as [[Similarity.topk]]. The majority vote and the
  * per-label rollup run over that tiny neighbor frame. Cosine is the
  * native codegen `vec_dot` fold — double, left-to-right, bit-equal
  * to the oracle's list_reduce chain, so even rank ties agree.
  */
object LabelNoise {

  /** q_label_noise entry: per-label kNN disagreement audit. */
  def noiseQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Similarity.widened(t(s, dir, "embeddings"))
    // fixed-size probe panel: 100 smallest md5(vec_id) — a bounded
    // TakeOrdered (top-k), never a corpus-fraction filter
    val probes = e
      .withColumn("hk", Hashing.md5Long60($"vec_id".cast("string")))
      .orderBy($"hk", $"vec_id").limit(100)
      .select($"vec_id".as("probe_id"), $"label".as("own_label"),
        $"v".as("qv"), $"nrm".as("qn"))
    val corpus = e.select($"vec_id", $"label".as("nlabel"), $"v", $"nrm")
    val scored = corpus
      .join(broadcast(probes.select($"probe_id", $"qv", $"qn")))
      .filter($"vec_id" =!= $"probe_id")
      .withColumn("cos", Similarity.dot($"qv", $"v") / ($"qn" * $"nrm"))
    val top = Similarity.topkByKey(scored, 5, "probe_id", "cos", "score", "rk")
    val nb = top.select($"probe_id", $"vec_id")
      .join(corpus.select($"vec_id", $"nlabel"), Seq("vec_id"))
    val pred = nb.groupBy($"probe_id", $"nlabel")
      .agg(count(lit(1)).as("c"))
      .withColumn("r", row_number.over(
        Window.partitionBy($"probe_id").orderBy($"c".desc, $"nlabel".asc)))
      .filter($"r" === 1)
      .select($"probe_id", $"nlabel".as("pred_label"))
    val own = probes.select($"probe_id", $"own_label")
    val agree = nb.join(own, Seq("probe_id"))
      .groupBy($"probe_id")
      .agg(sum(($"nlabel" === $"own_label").cast("long")).as("agree_cnt"))
    own
      .join(pred, Seq("probe_id"))
      .join(agree, Seq("probe_id"))
      .withColumn("flagged", ($"pred_label" =!= $"own_label").cast("long"))
      .groupBy($"own_label")
      .agg(count(lit(1)).as("n_probes"),
        sum($"flagged").as("n_flagged"),
        sum($"agree_cnt").as("sum_agree"))
      .select($"own_label".cast("int").as("label"),
        $"n_probes".cast("long").as("n_probes"),
        $"n_flagged".cast("long").as("n_flagged"),
        expr("(10000 * n_flagged) div n_probes").as("noise_bp"),
        expr("(10000 * sum_agree) div (5 * n_probes)").as("agree_bp"))
      .orderBy($"label")
  }

  /** DuckDB twin: brute-force window top-k (exact at oracle scale),
    * identical rank / majority / integer-bp contracts. */
  val noiseSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |                     (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      |p AS (SELECT vec_id AS probe_id, label AS own_label, v AS qv, nrm AS qn
      |  FROM e
      |  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))
      |    ::UBIGINT::BIGINT, vec_id
      |  LIMIT 100),
      |sc AS (
      |  SELECT probe_id, e.vec_id, e.label AS nlabel,
      |    list_reduce(list_transform(range(1, 65), i -> qv[i] * v[i]),
      |                (a, b) -> a + b) / (qn * nrm) AS cos
      |  FROM p, e WHERE e.vec_id <> probe_id),
      |rk AS (
      |  SELECT probe_id, vec_id, nlabel,
      |    ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY cos DESC, vec_id ASC) AS rn
      |  FROM sc),
      |nb AS (SELECT probe_id, nlabel FROM rk WHERE rn <= 5),
      |cnt AS (SELECT probe_id, nlabel, COUNT(*) AS c FROM nb GROUP BY 1, 2),
      |pred AS (
      |  SELECT probe_id, nlabel AS pred_label FROM (
      |    SELECT probe_id, nlabel, ROW_NUMBER() OVER (PARTITION BY probe_id
      |      ORDER BY c DESC, nlabel ASC) AS r
      |    FROM cnt)
      |  WHERE r = 1),
      |ag AS (
      |  SELECT nb.probe_id,
      |    SUM(CASE WHEN nb.nlabel = p.own_label THEN 1 ELSE 0 END) AS agree_cnt
      |  FROM nb JOIN p USING (probe_id) GROUP BY 1),
      |per AS (
      |  SELECT p.own_label, ag.agree_cnt,
      |    CASE WHEN pred.pred_label <> p.own_label THEN 1 ELSE 0 END AS flagged
      |  FROM p JOIN pred USING (probe_id) JOIN ag USING (probe_id))
      |SELECT own_label AS label, COUNT(*) AS n_probes,
      |  CAST(SUM(flagged) AS BIGINT) AS n_flagged,
      |  CAST((10000 * SUM(flagged)) // COUNT(*) AS BIGINT) AS noise_bp,
      |  CAST((10000 * SUM(agree_cnt)) // (5 * COUNT(*)) AS BIGINT) AS agree_bp
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_label_noise" -> noiseQ)

  def oracle: Map[String, String] = Map(
    "q_label_noise" -> noiseSql)
}
