package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vec_dot expression: bit-identity with the higher-order fold it
  * replaced, null/mismatch semantics, SQL resolution. */
class VecDotSpec extends AnyFunSuite with SparkSpec {

  test("bit-identical to the interpreted aggregate(zip_with(...)) fold on real embeddings") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = graft.Tables.t(spark, sfDir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("w", expr("reverse(v)"))
      .select(
        expr("vec_dot(v, w)").as("native"),
        expr("aggregate(zip_with(v, w, (x, y) -> x * y), 0d, (acc, p) -> acc + p)")
          .as("fold"))
      .collect()
    assert(rows.nonEmpty)
    // bitwise equality, not tolerance: the fold order is the contract
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("null element, length mismatch, and null array all yield null") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1d, 2d), array(3d, NULL)),
        |       vec_dot(array(1d, 2d), array(3d)),
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1d)),
        |       vec_dot(CAST(array() AS ARRAY<DOUBLE>),
        |               CAST(array() AS ARRAY<DOUBLE>))""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 0.0) // empty vectors: the fold's seed
  }

  test("both registration paths expose the same builders; vec_dot evaluates in SQL") {
    // the extensions path injects GraftFunctions.specs verbatim — assert
    // the spec set itself (a session built with the extension applied
    // can't be created here without tearing down the shared session)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val names = GraftFunctions.specs.map(_._1.funcName).toSet
    assert(names ==
      Set("rolling_hash", "vec_dot", "nfc_normalize", "jaro_winkler",
        "winnow_prints", "char_grams"))
    val (_, _, builder) = GraftFunctions.vecDotSpec
    assert(builder(Seq(Literal(1d), Literal(2d))).isInstanceOf[VecDot])
    intercept[IllegalArgumentException](builder(Seq(Literal(1d))))
    // explicit registration here so this test passes in isolation
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(2d, 3d), array(4d, 5d))")
      .head().getDouble(0) == 23.0)
  }
}
