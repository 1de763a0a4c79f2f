package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Native Jaro–Winkler expression: textbook reference values, codegen /
  * interpreted agreement over real data, metric properties, null and
  * arity handling. */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook reference values match to the last bit") {
    // the classic record-linkage examples (Winkler 1990 walkthroughs) —
    // identical to DuckDB's jaro_winkler_similarity on the same inputs
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("metric properties: symmetric, bounded, boost only above threshold") {
    val pairs = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("Customer#1", "Customer#2"), ("a", "b"), ("ab", "ba"))
    pairs.foreach { case (a, b) =>
      assert(jw(a, b) == jw(b, a), s"asymmetric on ($a,$b)")
      assert(jw(a, b) >= 0.0 && jw(a, b) <= 1.0)
    }
    // length-2 strings get a zero match window → full transposition
    // scores 0 (same as DuckDB)
    assert(jw("ab", "ba") == 0.0)
    // leading transposition: jaro > 0.7 but shared prefix length 0 →
    // Winkler boost adds nothing (DuckDB: 0.9333333333333332 for both)
    assert(jw("abcde", "bacde") == 0.9333333333333332)
  }

  test("codegen result equals the static scorer on real part names") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = graft.Tables.t(spark, sfDir, "part")
      .select($"p_name", reverse($"p_name").as("rev"))
      .selectExpr("p_name", "rev", "jaro_winkler(p_name, rev) AS s")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1))))
  }

  test("null propagates; wrong arity and wrong types are rejected") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler(NULL, 'a'), jaro_winkler('a', NULL)").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    intercept[IllegalArgumentException](
      GraftFunctions.jaroWinklerSpec._3(Seq.empty))
    val ex = intercept[Exception](
      spark.sql("SELECT jaro_winkler(1, 2)").collect())
    assert(ex.getMessage.contains("jaro_winkler requires two string"))
  }
}
