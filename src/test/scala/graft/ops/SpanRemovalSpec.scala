package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level proof that [[SpanRemoval.cleaned]]'s text surgery and
  * the oracle-checked accounting contract describe the SAME operation,
  * at sf0.001 where whole-corpus reconstruction is cheap. */
class SpanRemovalSpec extends AnyFunSuite with SparkSpec {

  private def docs = graft.Tables.t(spark, sfDir, "documents")

  test("span removal: reconstructed text length equals the accounted chars_kept for every doc") {
    import spark.implicits._
    val acct = SpanRemoval.removalQ(spark, sfDir)
      .select($"doc_id", $"chars_kept", $"n_chunks")
    val clean = SpanRemoval.cleaned(docs)
      .select($"doc_id", length($"clean_text").cast("long").as("len"))
    val joined = acct.join(clean, Seq("doc_id")).cache()
    val mismatch = joined.filter($"chars_kept" =!= $"len").count()
    assert(mismatch == 0, "accounting and surgery disagree on some doc")
    // re-chunk count is ceil(chars_kept / 512) — spot-check the formula
    val badChunks = joined
      .filter($"n_chunks" =!= ceil($"chars_kept" / lit(512.0)).cast("long"))
      .count()
    assert(badChunks == 0)
    joined.unpersist()
  }

  test("span removal: something was removed, and cross-doc duplication strictly shrinks") {
    import spark.implicits._
    val removed = SpanRemoval.removalQ(spark, sfDir)
      .agg(sum($"chars_removed")).first().getLong(0)
    assert(removed > 0, "fixture has seeded near-dups; removal must fire")

    // duplicated-position mass before vs after, same k, same policy basis
    def dupPositions(d: org.apache.spark.sql.DataFrame): Long = {
      val g = d
        .select($"doc_id", lower($"text").as("txt"))
        .filter(length($"txt") >= 40)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, length(txt) - 39), i -> substring(txt, i, 40))"))
          .as("gram"))
      g.groupBy($"gram")
        .agg(countDistinct($"doc_id").as("nd"), count(lit(1)).as("n"))
        .filter($"nd" >= 2)
        .agg(coalesce(sum($"n"), lit(0L))).first().getLong(0)
    }
    val before = dupPositions(docs)
    val after = dupPositions(
      SpanRemoval.cleaned(docs).select($"doc_id", $"clean_text".as("text")))
    assert(before > 0)
    assert(after < before,
      s"cleaning must reduce duplicated-position mass ($before -> $after)")
  }

  test("span removal: canonical owner keeps its copy — smallest doc of a removed span loses nothing") {
    import spark.implicits._
    // every doc with chars_removed > 0 must NOT be the corpus-min owner
    // of all its duplicated grams: by policy only non-owners are cut.
    // Equivalent check: the global minimum doc_id never loses chars.
    val minDoc = docs.agg(min($"doc_id")).first().getLong(0)
    val minDocRemoved = SpanRemoval.removalQ(spark, sfDir)
      .filter($"doc_id" === minDoc)
      .select($"chars_removed").first().getLong(0)
    assert(minDocRemoved == 0L, "the smallest doc_id owns every gram it holds")
  }
}
