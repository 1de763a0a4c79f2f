package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Set operations + scalar-function families (SURVEY.md §2b rows "Set ops",
  * "Scalar: string/math/date-time/conditional").
  *
  * Math note: exp/ln/log10 are not required to be correctly rounded by
  * IEEE-754, so JVM vs DuckDB libm could differ in the last ulp — those
  * results are rounded to 6 decimals on both sides. sqrt IS exact, and
  * abs/ceil/floor/round/mod are integral-exact, so they stay raw.
  */
object SetOpsScalars {

  // --- Set operations -------------------------------------------------------

  /** UNION ALL keeps duplicates; the two branches are planned as one scan
    * each and concatenated without a shuffle. */
  def unionAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_totalprice")
    val big = o.filter($"o_totalprice" > 400000)
      .select($"o_orderkey", $"o_totalprice")
    urgent.unionAll(big)
      .orderBy($"o_orderkey", $"o_totalprice")
      .limit(500)
  }

  val unionAllSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000
      |ORDER BY o_orderkey, o_totalprice LIMIT 500""".stripMargin

  /** UNION (distinct): dedupe across branches = aggregate on all columns. */
  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_nationkey")
    val b = c.filter($"c_acctbal" > 5000).select($"c_nationkey")
    a.union(b).distinct()
      .orderBy($"c_nationkey")
  }

  val unionDistinctSql: String =
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
      |ORDER BY c_nationkey""".stripMargin

  /** INTERSECT (distinct): nations present in both segments. */
  def intersectQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_nationkey")
    val b = c.filter($"c_mktsegment" === "MACHINERY").select($"c_nationkey")
    a.intersect(b).orderBy($"c_nationkey")
  }

  val intersectSql: String =
    """SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |ORDER BY c_nationkey""".stripMargin

  /** INTERSECT ALL: multiplicity = min of the two sides (checked via the
    * per-key counts surviving). */
  def intersectAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val a = o.filter($"o_orderstatus" === "F").select($"o_custkey")
    val b = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    a.intersectAll(b)
      .groupBy($"o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy($"o_custkey")
      .limit(300)
  }

  val intersectAllSql: String =
    """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY o_custkey ORDER BY o_custkey LIMIT 300""".stripMargin

  /** EXCEPT (distinct): customers with a high-value order but no open
    * order — o_custkey repeats across orders, so the distinct-dedup
    * semantics of EXCEPT are exercised on a non-empty result (49 rows at
    * sf0.01; the earlier nationkey variant was vacuously empty). */
  def exceptQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val a = o.filter($"o_totalprice" > 150000).select($"o_custkey")
    val b = o.filter($"o_orderstatus" === "O").select($"o_custkey")
    a.except(b).orderBy($"o_custkey")
  }

  val exceptSql: String =
    """SELECT o_custkey FROM orders WHERE o_totalprice > 150000
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin

  /** EXCEPT ALL: bag difference — surviving multiplicity per key. */
  def exceptAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val a = o.select($"o_custkey")
    val b = o.filter($"o_orderstatus" === "O").select($"o_custkey")
    a.exceptAll(b)
      .groupBy($"o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy($"o_custkey")
      .limit(300)
  }

  val exceptAllSql: String =
    """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
      |  SELECT o_custkey FROM orders
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |GROUP BY o_custkey ORDER BY o_custkey LIMIT 300""".stripMargin

  // --- Scalar: string -------------------------------------------------------

  /** String-function sweep: case, substring, pad, replace, split_part,
    * regexp_extract, length, trim — all codegen'd built-ins. */
  def scalarString(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_custkey",
        upper($"c_mktsegment").as("seg_upper"),
        lower($"c_name").as("name_lower"),
        substring($"c_name", 10, 9).as("name_digits"),
        regexp_extract($"c_name", "([0-9]+)$", 1).cast("long").as("name_num"),
        length($"c_name").cast("long").as("name_len"),
        concat_ws("-", $"c_mktsegment", $"c_nationkey").as("seg_nation"),
        lpad($"c_nationkey".cast("string"), 4, "0").as("nation_padded"),
        replace($"c_name", lit("Customer"), lit("Cust")).as("name_short"),
        split_part($"c_name", lit("#"), lit(2)).as("name_suffix"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy($"c_custkey")
      .limit(200)
  }

  val scalarStringSql: String =
    """SELECT c_custkey,
      |  UPPER(c_mktsegment) AS seg_upper,
      |  LOWER(c_name) AS name_lower,
      |  SUBSTRING(c_name, 10, 9) AS name_digits,
      |  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
      |  LENGTH(c_name) AS name_len,
      |  CONCAT_WS('-', c_mktsegment, c_nationkey) AS seg_nation,
      |  LPAD(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
      |  REPLACE(c_name, 'Customer', 'Cust') AS name_short,
      |  SPLIT_PART(c_name, '#', 2) AS name_suffix,
      |  TRIM('  x  ') AS trimmed
      |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin

  /** q_scalar_regex entry: the REGEX scalar surface beyond
    * [[scalarString]]'s single extract — global regexp_replace (Spark
    * replaces all by default; the DuckDB twin passes the 'g' option),
    * regexp_extract_all counts, boolean rlike/regexp_matches, and an
    * anchored word extract. Patterns stay inside the RE2 ∩ java.util.regex
    * common subset (no backreferences/lookaround — RE2 has neither), which
    * is exactly the subset a cross-engine pipeline can rely on. */
  def scalarRegex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_partkey",
        $"p_name",
        regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
        regexp_extract($"p_name", "\\b([aeiou][a-z]*)", 1)
          .as("first_vowel_word"),
        regexp_replace($"p_name", "[aeiou]", "*").as("vowels_masked"),
        size(regexp_extract_all($"p_name", lit("[a-z]+"), lit(0)))
          .cast("long").as("n_words"),
        size(regexp_extract_all($"p_name", lit("a"), lit(0)))
          .cast("long").as("n_a"),
        $"p_name".rlike("^[^aeiou]").as("starts_consonant"),
        $"p_name".rlike("(ee|oo|ll|ss)").as("has_double"))
      .orderBy($"p_partkey")
      .limit(200)
  }

  val scalarRegexSql: String =
    """SELECT p_partkey, p_name,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  regexp_extract(p_name, '\b([aeiou][a-z]*)', 1) AS first_vowel_word,
      |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS vowels_masked,
      |  CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
      |  CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
      |  regexp_matches(p_name, '^[^aeiou]') AS starts_consonant,
      |  regexp_matches(p_name, '(ee|oo|ll|ss)') AS has_double
      |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin

  // --- Scalar: math ---------------------------------------------------------

  /** Math sweep. Exact group (abs/ceil/floor/round/sqrt/mod/greatest/least)
    * raw; libm group (exp/ln/log10/pow) rounded to 6 decimals — see object
    * doc. */
  def scalarMath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "supplier")
      .select($"s_suppkey",
        abs($"s_acctbal").as("abs_bal"),
        ceil($"s_acctbal").as("ceil_bal"),
        floor($"s_acctbal").as("floor_bal"),
        round($"s_acctbal", 0).as("round_bal"),
        sqrt(abs($"s_acctbal")).as("sqrt_bal"),
        signum($"s_acctbal").as("sign_bal"),
        ($"s_suppkey" % 7).as("mod7"),
        greatest($"s_acctbal", lit(0.0)).as("pos_bal"),
        least($"s_acctbal", lit(0.0)).as("neg_bal"),
        round(exp($"s_suppkey" % 5), 6).as("exp_r"),
        round(log(abs($"s_acctbal") + lit(1.0)), 6).as("ln_r"),
        round(pow($"s_suppkey" % 9 + 1, 3), 6).as("pow_r"))
      .orderBy($"s_suppkey")
      .limit(200)
  }

  val scalarMathSql: String =
    """SELECT s_suppkey,
      |  ABS(s_acctbal) AS abs_bal,
      |  CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
      |  CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
      |  ROUND(s_acctbal, 0) AS round_bal,
      |  SQRT(ABS(s_acctbal)) AS sqrt_bal,
      |  CAST(SIGN(s_acctbal) AS DOUBLE) AS sign_bal,
      |  s_suppkey % 7 AS mod7,
      |  GREATEST(s_acctbal, 0.0) AS pos_bal,
      |  LEAST(s_acctbal, 0.0) AS neg_bal,
      |  ROUND(EXP(s_suppkey % 5), 6) AS exp_r,
      |  ROUND(LN(ABS(s_acctbal) + 1.0), 6) AS ln_r,
      |  ROUND(POW(s_suppkey % 9 + 1, 3), 6) AS pow_r
      |FROM supplier ORDER BY s_suppkey LIMIT 200""".stripMargin

  // --- Scalar: date/time ----------------------------------------------------

  /** Temporal sweep over the event stream: truncation, field extraction,
    * date arithmetic, epoch conversion. */
  def scalarDatetime(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        date_trunc("hour", $"ts").as("ts_hour"),
        year($"ts").as("y"),
        month($"ts").as("m"),
        dayofmonth($"ts").as("d"),
        hour($"ts").as("h"),
        minute($"ts").as("mi"),
        to_date($"ts").as("dt"),
        date_add(to_date($"ts"), 30).as("dt_plus30"),
        unix_micros($"ts").as("epoch_us"))
      .orderBy($"event_id")
      .limit(300)
  }

  val scalarDatetimeSql: String =
    """SELECT event_id,
      |  date_trunc('hour', ts) AS ts_hour,
      |  CAST(EXTRACT(year FROM ts) AS INT) AS y,
      |  CAST(EXTRACT(month FROM ts) AS INT) AS m,
      |  CAST(EXTRACT(day FROM ts) AS INT) AS d,
      |  CAST(EXTRACT(hour FROM ts) AS INT) AS h,
      |  CAST(EXTRACT(minute FROM ts) AS INT) AS mi,
      |  CAST(ts AS DATE) AS dt,
      |  CAST(CAST(ts AS DATE) + INTERVAL 30 DAY AS DATE) AS dt_plus30,
      |  epoch_us(ts) AS epoch_us
      |FROM events ORDER BY event_id LIMIT 300""".stripMargin

  // --- Scalar: conditional / hash / cast ------------------------------------

  /** coalesce/nullif/casts/try_cast + md5/sha256 content hashing (the same
    * primitives the dedup operators build on). */
  def scalarConditional(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_custkey",
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("~masked~")).as("seg_masked"),
        nvl($"c_acctbal", lit(0.0)).as("bal_nvl"),
        $"c_acctbal".cast("int").as("bal_int"),
        $"c_custkey".cast("string").as("key_str"),
        $"c_mktsegment".try_cast(org.apache.spark.sql.types.IntegerType).as("seg_as_int"),
        md5($"c_name").as("name_md5"),
        sha2($"c_name", 256).as("name_sha256"),
        when($"c_acctbal" < 0, lit("overdrawn")).otherwise(lit("ok")).as("status"))
      .orderBy($"c_custkey")
      .limit(200)
  }

  val scalarConditionalSql: String =
    """SELECT c_custkey,
      |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '~masked~') AS seg_masked,
      |  COALESCE(c_acctbal, 0.0) AS bal_nvl,
      |  CAST(TRUNC(c_acctbal) AS INT) AS bal_int,
      |  CAST(c_custkey AS VARCHAR) AS key_str,
      |  TRY_CAST(c_mktsegment AS INT) AS seg_as_int,
      |  MD5(c_name) AS name_md5,
      |  SHA256(c_name) AS name_sha256,
      |  CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS status
      |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin

  // --- registry -------------------------------------------------------------

  /** q_scalar_bits entry: bitwise scalar surface — AND/OR/XOR, shifts,
    * popcount over integer keys; pure integer semantics identical on
    * every engine, codegen'd end to end (bit tricks are the backbone of
    * hash partitioners, bitmap indexes, and flag columns). */
  def scalarBits(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.t(s, dir, "lineitem")
      .filter($"l_orderkey" < 64)
      .select($"l_orderkey", $"l_linenumber",
        ($"l_orderkey" * 8 + $"l_linenumber").as("key"))
      .select($"l_orderkey", $"l_linenumber",
        expr("key & 255").as("band"),
        expr("key | 4096").as("flagged"),
        expr("key ^ 85").as("mixed"),
        expr("shiftleft(key, 3)").as("shl3"),
        expr("shiftright(key, 2)").as("shr2"),
        expr("bit_count(key)").cast("long").as("popcount"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val scalarBitsSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  key & 255 AS band,
      |  key | 4096 AS flagged,
      |  xor(key, 85) AS mixed,
      |  key << 3 AS shl3,
      |  key >> 2 AS shr2,
      |  CAST(bit_count(key) AS BIGINT) AS popcount
      |FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    l_orderkey * 8 + l_linenumber AS key
      |  FROM lineitem WHERE l_orderkey < 64)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_bits" -> scalarBits,
    "q_union_all" -> unionAll,
    "q_union_distinct" -> unionDistinct,
    "q_intersect" -> intersectQ,
    "q_intersect_all" -> intersectAll,
    "q_except" -> exceptQ,
    "q_except_all" -> exceptAll,
    "q_scalar_string" -> scalarString,
    "q_scalar_regex" -> scalarRegex,
    "q_scalar_math" -> scalarMath,
    "q_scalar_datetime" -> scalarDatetime,
    "q_scalar_conditional" -> scalarConditional)

  def oracle: Map[String, String] = Map(
    "q_scalar_bits" -> scalarBitsSql,
    "q_union_all" -> unionAllSql,
    "q_union_distinct" -> unionDistinctSql,
    "q_intersect" -> intersectSql,
    "q_intersect_all" -> intersectAllSql,
    "q_except" -> exceptSql,
    "q_except_all" -> exceptAllSql,
    "q_scalar_string" -> scalarStringSql,
    "q_scalar_regex" -> scalarRegexSql,
    "q_scalar_math" -> scalarMathSql,
    "q_scalar_datetime" -> scalarDatetimeSql,
    "q_scalar_conditional" -> scalarConditionalSql)
}
