package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Native multi-order char-gram expression: codegen/interpreted
  * agreement on real docs, the packed-key layout (injective
  * `(n << 56) | bytes`), and arity/null handling. */
class CharGramsSpec extends AnyFunSuite with SparkSpec {

  private def brute(s: String, maxN: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    for {
      i <- b.indices
      n <- 1 to math.min(maxN, b.length - i)
    } yield {
      val packed = (0 until n).foldLeft(0L)((acc, j) =>
        (acc << 8) | (b(i + j) & 0xffL))
      (n.toLong << 56) | packed
    }
  }

  test("codegen equals interpreted equals brute force on real docs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = graft.Tables.t(spark, sfDir, "documents")
      .limit(50)
      .select($"text", expr("char_grams(text, 6)").as("g"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getSeq[Long](1)
      val interp = CharGrams.grams(
        UTF8String.fromString(r.getString(0)), 6).toSeq
      val bf = brute(r.getString(0), 6)
      assert(got == interp, "codegen vs interpreted")
      assert(got.sorted == bf.sorted, "vs brute force")
    }
  }

  test("packed key layout: order in the top byte, bytes below") {
    val g = CharGrams.grams(UTF8String.fromString("ab"), 6)
    // grams of "ab": (1,'a'), (2,'ab'), (1,'b')
    assert(g.toSet == Set(
      (1L << 56) | 0x61L,
      (2L << 56) | 0x6162L,
      (1L << 56) | 0x62L))
    // the key is injective: distinct (n, gram) -> distinct longs
    assert(g.distinct.length == g.length)
  }

  test("short and empty strings produce exactly the short orders") {
    assert(CharGrams.grams(UTF8String.fromString(""), 6).isEmpty)
    val one = CharGrams.grams(UTF8String.fromString("x"), 6)
    assert(one.toSeq == Seq((1L << 56) | 0x78L))
  }

  test("null input yields null; wrong arity is rejected") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT char_grams(NULL, 6)").head().isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT char_grams('a')").collect()
    }
  }

  test("oracle key parity: packed long equals (n<<56) + hex-pack") {
    // what the DuckDB oracle computes: ('0x' || hex(substr)) :: UBIGINT
    val s = "spark"
    val bf = brute(s, 6)
    val viaHex = for {
      i <- 0 until s.length
      n <- 1 to math.min(6, s.length - i)
    } yield {
      val hexed = s.substring(i, i + n).getBytes("UTF-8")
        .map(b => f"$b%02x").mkString
      (n.toLong << 56) | java.lang.Long.parseLong(hexed, 16)
    }
    assert(bf.sorted == viaHex.sorted)
  }
}
