package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction — the retrieval-side artifact a corpus
  * pipeline materializes next to the text: per token, document
  * frequency, total occurrence count, and a BOUNDED top-k posting list
  * (highest-tf documents first). BM25/TF-IDF score *documents*; this is
  * the other direction — the token → documents map itself, the thing a
  * contamination scan, a keyword debugger, or a sparse retriever reads.
  */
object Index {

  /** q_text_inverted: df + n_occ per token, plus the top-5 posting list
    * by (tf desc, doc_id asc); top-40 tokens by (df desc, token asc).
    *
    * Scale shape: tf collapses the token stream to (token, doc) rows via
    * a map-side-combinable count — the text column never shuffles. The
    * posting list is bounded BEFORE any array exists: a row_number
    * window over the tf rows keeps k rows per token, and only those are
    * assembled into the array — never a collect_list of a stopword's
    * full posting set (at 100 TB a common token's postings are the
    * corpus; an unbounded per-group array is an OOM by construction).
    * The df/n_occ aggregate and the top-k branch share one tf frame and
    * rejoin on the token key. Posting order is pinned by the
    * (tf desc, doc_id) rank; the OUTPUT column is the list's canonical
    * comma-joined string — a pandas comparator cannot sort/hash a
    * list<int64> column, so array types never cross the result
    * boundary (the bounded array stays internal). */
  def invertedQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = t(s, dir, "documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("tok"))
      .filter(length($"tok") > 0)
      .groupBy($"tok", $"doc_id")
      .agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy($"tok")
      .agg(count(lit(1)).as("df"), sum($"tf").as("n_occ"))
    val wTok = Window.partitionBy($"tok").orderBy($"tf".desc, $"doc_id")
    val posts = tf
      .withColumn("rk", row_number().over(wTok))
      .filter($"rk" <= 5)
      .groupBy($"tok")
      .agg(array_join(transform(
        sort_array(collect_list(struct($"rk", $"doc_id"))),
        x => x("doc_id")), ",").as("top_docs"))
    stats.join(posts, "tok")
      .orderBy($"df".desc, $"tok")
      .limit(40)
      .select($"tok", $"df", $"n_occ", $"top_docs")
  }

  val invertedSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents),
      |tf AS (
      |  SELECT tok, doc_id, COUNT(*) AS tf FROM tok
      |  WHERE len(tok) > 0 GROUP BY 1, 2),
      |stats AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
      |    CAST(SUM(tf) AS BIGINT) AS n_occ
      |  FROM tf GROUP BY tok),
      |ranked AS (
      |  SELECT tok, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY tok ORDER BY tf DESC, doc_id) AS rk
      |  FROM tf),
      |posts AS (
      |  SELECT tok, array_to_string(list(doc_id ORDER BY rk), ',') AS top_docs
      |  FROM ranked WHERE rk <= 5 GROUP BY tok)
      |SELECT stats.tok, df, n_occ, top_docs
      |FROM stats JOIN posts USING (tok)
      |ORDER BY df DESC, stats.tok LIMIT 40""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_inverted" -> invertedQ)

  def oracle: Map[String, String] = Map(
    "q_text_inverted" -> invertedSql)
}
