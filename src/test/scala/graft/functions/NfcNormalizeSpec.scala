package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** NfcNormalize: real composed/decomposed Unicode behavior (the corpus
  * oracle only pins the ASCII path), codegen vs interpreted agreement,
  * and the zero-copy ASCII fast path. */
class NfcNormalizeSpec extends AnyFunSuite with SparkSpec {

  // same text twice: decomposed spells é as e + U+0301 COMBINING ACUTE,
  // composed as the precomposed U+00E9
  private val decomposed = "Cafe\u0301 du re\u0301ve"
  private val composed = "Caf\u00e9 du r\u00e9ve"

  test("decomposed input normalizes to the composed form") {
    assert(NfcNormalize.normalize(UTF8String.fromString(decomposed)).toString
      == composed)
    assert(NfcNormalize.normalize(UTF8String.fromString(composed)).toString
      == composed) // already NFC → unchanged
  }

  test("normalization is idempotent and ASCII passes through unchanged") {
    val once = NfcNormalize.normalize(UTF8String.fromString(decomposed))
    assert(NfcNormalize.normalize(once) == once)
    val ascii = UTF8String.fromString("plain ascii text")
    // fast path returns the SAME UTF8String instance, not a copy
    assert(NfcNormalize.normalize(ascii) eq ascii)
  }

  test("SQL surface: codegen result matches interpreted eval and handles nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(Some(decomposed), Some(composed), Some("ascii"), None)
      .toDF("s")
      .selectExpr("s", "nfc_normalize(s) AS n")
    val got = df.collect().map(r => Option(r.getString(1)))
    val exp = Seq(Some(composed), Some(composed), Some("ascii"), None)
    assert(got.toSeq == exp)
    // composed and decomposed spellings collide after normalization —
    // the dedup-facing property the expression exists for
    val distinct = spark.sql(
      s"""SELECT COUNT(DISTINCT nfc_normalize(s)) FROM VALUES
         |('$decomposed'), ('$composed') AS t(s)""".stripMargin)
      .collect().head.getLong(0)
    assert(distinct == 1L)
  }
}
