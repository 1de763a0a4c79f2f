package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Native rolling-hash expression: codegen/interpreted agreement, SQL
  * resolution through both registration paths, null/type handling. */
class RollingHashSpec extends AnyFunSuite with SparkSpec {

  test("codegen result equals the interpreted fallback on real docs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = graft.Tables.t(spark, sfDir, "documents")
      .select($"text", expr("rolling_hash(text)").as("rh"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = RollingHash.hash(UTF8String.fromString(r.getString(0)))
      assert(r.getLong(1) == expected)
    }
  }

  test("known value: empty string hashes to 0, 'a' to 97") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT rolling_hash(''), rolling_hash('a'), rolling_hash(NULL)")
      .head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 97L)
    assert(r.isNullAt(2))
  }

  test("hash is order-sensitive (a polynomial, not a bag hash)") {
    assert(RollingHash.hash(UTF8String.fromString("ab")) !=
      RollingHash.hash(UTF8String.fromString("ba")))
  }

  test("GraftExtensions injects the function spec without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw on an invalid spec
  }

  test("wrong arity is rejected instead of silently dropping arguments") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT rolling_hash('a', 'b')").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument") ||
      e.getMessage.toLowerCase.contains("rolling_hash"))
  }

  test("non-string input fails analysis with the type message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT rolling_hash(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("rolling_hash"))
  }
}
