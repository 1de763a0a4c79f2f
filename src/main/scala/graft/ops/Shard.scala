package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Shard-assignment stability under cluster resize — the reason
  * rendezvous (highest-random-weight) hashing exists: growing a
  * mod-hashed layout from S to S+1 shards moves ~S/(S+1) of ALL keys
  * (every byte reshuffles — at 100 TB that is the outage), while
  * rendezvous hashing moves only the ~1/(S+1) of keys whose new shard
  * WINS their weight race (Thaler & Ravishankar 1998; the same
  * property consistent-ring hashing buys, with no ring state — just a
  * per-(key, shard) hash and an argmax).
  *
  * The operator quantifies exactly that on the document corpus: assign
  * every doc under mod-16/mod-17 and rendezvous-16/rendezvous-17 and
  * report the moved fraction of each scheme in basis points. The
  * numbers a platform team reads before choosing a partitioning
  * scheme for a growing store.
  *
  * Scale shape: pure map stage — the per-doc rendezvous argmax runs
  * inside one higher-order expression over a 16/17-element array (no
  * explode, no shuffle; the row count never multiplies), mod
  * assignment is one hash; the report is a single combinable
  * aggregate. Weights ride the [[Hashing.md5Long60]] cross-engine
  * contract; argmax ties break (weight, shard)-lexicographic — exact
  * on both engines.
  */
object Shard {

  /** Rendezvous winner among shards 0..n-1 for the doc_id key, as an
    * int column: argmax over md5-derived per-(key, shard) weights. */
  private def rdv(n: Int): String =
    s"""array_max(transform(sequence(0, ${n - 1}), j -> struct(
       |  cast(conv(substring(md5(concat(cast(doc_id as string), ':',
       |    cast(j as string))), 1, 15), 16, 10) as bigint) as w,
       |  j as j))).j""".stripMargin

  /** q_shard_rebalance entry: moved-key accounting for the 16 → 17
    * shard grow under both schemes — one row. */
  def rebalanceQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = Hashing.md5Long60($"doc_id".cast("string"))
    t(s, dir, "documents")
      .select($"doc_id",
        (h % 16).as("m16"), (h % 17).as("m17"),
        expr(rdv(16)).as("r16"), expr(rdv(17)).as("r17"))
      .agg(count(lit(1)).as("n_docs"),
        sum(($"m16" =!= $"m17").cast("long")).as("moved_mod"),
        sum(($"r16" =!= $"r17").cast("long")).as("moved_rdv"))
      .select($"n_docs".cast("long").as("n_docs"),
        $"moved_mod".cast("long").as("moved_mod"),
        expr("(10000 * moved_mod) div n_docs").as("moved_mod_bp"),
        $"moved_rdv".cast("long").as("moved_rdv"),
        expr("(10000 * moved_rdv) div n_docs").as("moved_rdv_bp"))
  }

  /** DuckDB twin: the argmax races run as per-doc rank windows over an
    * unnested (doc, shard) grid — fine at oracle scale; tie order
    * (w DESC, j DESC) mirrors array_max's (w, j)-lexicographic max. */
  val rebalanceSql: String = {
    def win(n: Int, out: String): String =
      s"""$out AS (
         |  SELECT doc_id, j FROM (
         |    SELECT doc_id, j, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
         |        j::VARCHAR), 1, 15))::UBIGINT::BIGINT DESC, j DESC) AS rk
         |    FROM documents, range(0, $n) t(j))
         |  WHERE rk = 1)""".stripMargin
    s"""WITH ${win(16, "r16")},
      |${win(17, "r17")},
      |m AS (
      |  SELECT d.doc_id,
      |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
      |      % 16 AS m16,
      |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
      |      % 17 AS m17,
      |    r16.j AS rj16, r17.j AS rj17
      |  FROM documents d
      |  JOIN r16 ON d.doc_id = r16.doc_id
      |  JOIN r17 ON d.doc_id = r17.doc_id),
      |a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN m16 <> m17 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS moved_mod,
      |    CAST(SUM(CASE WHEN rj16 <> rj17 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS moved_rdv
      |  FROM m)
      |SELECT n_docs, moved_mod,
      |  CAST((10000 * moved_mod) // n_docs AS BIGINT) AS moved_mod_bp,
      |  moved_rdv,
      |  CAST((10000 * moved_rdv) // n_docs AS BIGINT) AS moved_rdv_bp
      |FROM a""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_shard_rebalance" -> rebalanceQ)

  def oracle: Map[String, String] = Map(
    "q_shard_rebalance" -> rebalanceSql)
}
