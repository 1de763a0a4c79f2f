package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Native winnowing expression: codegen/interpreted agreement, a naive
  * O(n·k) reference recompute, the Schleimer selection guarantee, and
  * edge cases. */
class WinnowPrintsSpec extends AnyFunSuite with SparkSpec {

  /** Naive reference: hash every k-gram by direct fold, take every
    * w-window min, distinct+sort — no rolling update, no deque. */
  private def naive(text: String): Seq[Long] = {
    val K = WinnowPrints.K; val W = WinnowPrints.W
    if (text.length < K + W - 1) Seq.empty
    else {
      val hs = (0 to text.length - K).map { i =>
        text.substring(i, i + K).foldLeft(0L)((h, c) =>
          (h * WinnowPrints.Base + c) % WinnowPrints.Mod)
      }
      (0 to hs.length - W).map(i => hs.slice(i, i + W).min).distinct.sorted
    }
  }

  test("codegen result equals the naive reference on real docs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = graft.Tables.t(spark, sfDir, "documents")
      .select($"text", expr("winnow_prints(text)").as("wp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == naive(r.getString(0)), r.getString(0).take(40))
    }
  }

  test("interpreted fallback equals the naive reference") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", "abcabcabcabcabcabc", "01234567890")
    texts.foreach { t =>
      val got = {
        val a = WinnowPrints.compute(UTF8String.fromString(t))
        (0 until a.numElements()).map(a.getLong)
      }
      assert(got == naive(t), t)
    }
  }

  test("selection guarantee: a shared substring of length w+k-1 shares a print") {
    // two otherwise-different texts embedding the same 11-char run must
    // share at least one selected fingerprint (SIGMOD 2003, theorem 1)
    val shared = "SHARED-RUN!"
    val a = "xxxxxxxx" + shared + "yyyyyyyyyyyy"
    val b = "qqqqqqqqqqqq" + shared + "zzzzzzzz"
    assert(naive(a).toSet.intersect(naive(b).toSet).nonEmpty)
  }

  test("short and null inputs: empty array under k+w-1 chars, null passthrough") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT winnow_prints('0123456789'), winnow_prints(NULL)").head()
    assert(r.getSeq[Long](0).isEmpty) // 10 < 11
    assert(r.isNullAt(1))
  }

  test("density: selected fraction is near 2/(w+1) on long text") {
    val text = graft.Tables.t(spark, sfDir, "documents")
      .orderBy(org.apache.spark.sql.functions.length(col("text")).desc)
      .select("text").head().getString(0)
    val grams = text.length - WinnowPrints.K + 1
    val frac = naive(text).size.toDouble / grams
    assert(frac > 0.05 && frac < 0.8, s"density $frac implausible")
  }
}
