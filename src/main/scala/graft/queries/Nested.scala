package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Nested / array / JSON coverage (SURVEY.md §2b rows "Array / nested",
  * "JSON scalar fns"): construction, indexing, explode/unnest, order-
  * normalized collect_list, higher-order lambdas over real embedding
  * vectors, and JSON extraction from the events.props payload.
  *
  * Higher-order folds accumulate left-to-right in both engines (Spark
  * `aggregate` with a 0.0 seed vs DuckDB `list_reduce` seeded by the first
  * element — identical chains since 0.0 + x == x exactly), so double
  * results are bit-identical in list order.
  */
object Nested {

  /** Array construction + indexing + membership + sorting + slicing.
    * Array-typed result columns are serialized to comma-joined strings —
    * the driver's pandas-based comparer cannot sort/hash ndarray cells
    * (ADVICE r1) — so every output column is scalar. */
  def arrayBasics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_partkey",
        array($"p_size", length($"p_name"), $"p_partkey".cast("int")).as("arr"))
      .select($"p_partkey",
        array_join($"arr", ",").as("arr_str"),
        element_at($"arr", 1).as("first_el"),
        size($"arr").as("arr_len"),
        array_contains($"arr", 10).as("has_ten"),
        array_join(sort_array($"arr"), ",").as("sorted_arr_str"),
        array_join(slice($"arr", 1, 2), ",").as("first_two_str"))
      .orderBy($"p_partkey")
      .limit(200)
  }

  val arrayBasicsSql: String =
    """WITH base AS (
      |  SELECT p_partkey,
      |    [p_size, CAST(LENGTH(p_name) AS INT), CAST(p_partkey AS INT)] AS arr
      |  FROM part)
      |SELECT p_partkey,
      |  array_to_string(arr, ',') AS arr_str,
      |  arr[1] AS first_el,
      |  CAST(LEN(arr) AS INT) AS arr_len,
      |  list_contains(arr, 10) AS has_ten,
      |  array_to_string(list_sort(arr), ',') AS sorted_arr_str,
      |  array_to_string(arr[1:2], ',') AS first_two_str
      |FROM base ORDER BY p_partkey LIMIT 200""".stripMargin

  /** explode/unnest: tokenize document text and count word frequencies —
    * the canonical map-side explode → shuffle-on-word → count pipeline
    * (same shape as a 100 TB wordcount; the explode happens before the
    * shuffle so only (word, count) partials move). */
  def explodeWords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"word")
      .limit(30)
  }

  val explodeWordsSql: String =
    """SELECT word, COUNT(*) AS freq FROM (
      |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      |WHERE LENGTH(word) > 0
      |GROUP BY word ORDER BY freq DESC, word LIMIT 30""".stripMargin

  /** collect_list with explicit order normalization (sort_array) — raw
    * collect_list order is partition-dependent, so the list is sorted to a
    * canonical form before comparison; serialized to strings so every
    * output column is scalar (ADVICE r1). collect_set ≡ sorted distinct. */
  def collectList(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "nation")
      .groupBy($"n_regionkey")
      .agg(
        array_join(sort_array(collect_list($"n_name")), "|").as("nations"),
        array_join(sort_array(collect_set($"n_regionkey" * 0 + $"n_nationkey" % 5)), "|")
          .as("key_mods"))
      .orderBy($"n_regionkey")
  }

  val collectListSql: String =
    """SELECT n_regionkey,
      |  array_to_string(list_sort(list(n_name)), '|') AS nations,
      |  array_to_string(list_sort(list_distinct(list(n_nationkey % 5))), '|') AS key_mods
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Higher-order lambdas over 64-dim embedding vectors: filter/transform/
    * aggregate — the same primitives the similarity operators build on,
    * codegen-free but whole-vector-at-a-time (no explode, no shuffle). */
  def higherOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings")
      .select($"vec_id",
        size(filter($"embedding", x => x > 0)).as("n_pos"),
        aggregate($"embedding", lit(0.0),
          (acc, x) => acc + abs(x.cast("double"))).as("l1_norm"),
        aggregate($"embedding", lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("sq_norm"),
        element_at($"embedding", 1).cast("double").as("first_dim"))
      .orderBy($"vec_id")
      .limit(300)
  }

  val higherOrderSql: String =
    """SELECT vec_id,
      |  CAST(LEN(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
      |  list_reduce(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE))),
      |              (a, b) -> a + b) AS l1_norm,
      |  list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |              (a, b) -> a + b) AS sq_norm,
      |  CAST(embedding[1] AS DOUBLE) AS first_dim
      |FROM embeddings ORDER BY vec_id LIMIT 300""".stripMargin

  /** JSON extraction from the events.props string payload (the reference
    * decodes whole-JSON structurally at scan — /root/reference/src/
    * execution.rs:183; per-field extraction is the query-time equivalent). */
  def jsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy(($"k" % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"k_bucket")
  }

  val jsonExtractSql: String =
    """SELECT k % 10 AS k_bucket, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin

  /** Positional explode: (doc, position, token) triples — the ordinal
    * unnest shape tokenizer pipelines need (DuckDB lacks WITH
    * ORDINALITY; its parallel `generate_subscripts` is 1-based, so the
    * 0-based posexplode is shifted to match). */
  def posExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", posexplode(split(lower($"text"), " ")))
      .select($"doc_id", ($"pos" + 1).cast("long").as("pos"), $"col".as("tok"))
      .filter($"pos" <= 5)
      .orderBy($"doc_id", $"pos")
      .limit(500)
  }

  val posExplodeSql: String =
    """SELECT doc_id, pos, tok FROM (
      |  SELECT doc_id,
      |    unnest(string_split(lower(text), ' ')) AS tok,
      |    generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      |  FROM documents)
      |WHERE pos <= 5 ORDER BY doc_id, pos LIMIT 500""".stripMargin

  /** MapType construction + lookup + keys/cardinality (SURVEY §2b "Map
    * functions" — DataFusion 43 has almost none; Spark's are complete).
    * DuckDB's map extraction returns a single-element LIST, so the
    * oracle unwraps with `[1]`; map_keys order is construction order in
    * both engines but sorted anyway for stability. */
  def mapOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_partkey",
        map(lit("size"), $"p_size", lit("len"), length($"p_type")).as("m"))
      .select($"p_partkey",
        element_at($"m", "size").as("size_val"),
        size($"m").as("n_keys"),
        array_join(sort_array(map_keys($"m")), ",").as("keys"),
        array_contains(map_keys($"m"), "len").as("has_len"))
      .orderBy($"p_partkey")
      .limit(200)
  }

  val mapOpsSql: String =
    """WITH mm AS (
      |  SELECT p_partkey,
      |    map(['size', 'len'], [p_size, CAST(LENGTH(p_type) AS INT)]) AS m
      |  FROM part)
      |SELECT p_partkey,
      |  m['size'][1] AS size_val,
      |  CAST(cardinality(m) AS INT) AS n_keys,
      |  array_to_string(list_sort(map_keys(m)), ',') AS keys,
      |  list_contains(map_keys(m), 'len') AS has_len
      |FROM mm ORDER BY p_partkey LIMIT 200""".stripMargin

  /** Struct build + dot access + to_json round-trip. */
  def structOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "nation")
      .select($"n_nationkey",
        struct($"n_name".as("name"), $"n_regionkey".as("region")).as("info"))
      .select($"n_nationkey",
        $"info.name".as("name"),
        $"info.region".as("region"),
        to_json($"info").as("info_json"))
      .orderBy($"n_nationkey")
  }

  val structOpsSql: String =
    """SELECT n_nationkey, name, region, CAST(to_json(info) AS VARCHAR) AS info_json FROM (
      |  SELECT n_nationkey,
      |    struct_pack(name := n_name, region := n_regionkey) AS info,
      |    n_name AS name, n_regionkey AS region
      |  FROM nation)
      |ORDER BY n_nationkey""".stripMargin

  // --- registry -------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_basics" -> arrayBasics,
    "q_explode_words" -> explodeWords,
    "q_collect_list" -> collectList,
    "q_higher_order" -> higherOrder,
    "q_json_extract" -> jsonExtract,
    "q_map_ops" -> mapOps,
    "q_posexplode" -> posExplode,
    "q_struct_ops" -> structOps)

  def oracle: Map[String, String] = Map(
    "q_array_basics" -> arrayBasicsSql,
    "q_explode_words" -> explodeWordsSql,
    "q_collect_list" -> collectListSql,
    "q_higher_order" -> higherOrderSql,
    "q_json_extract" -> jsonExtractSql,
    "q_map_ops" -> mapOpsSql,
    "q_posexplode" -> posExplodeSql,
    "q_struct_ops" -> structOpsSql)
}
