package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inverted-index and batching-audit invariants beyond the oracle hash. */
class IndexSpec extends AnyFunSuite with SparkSpec {

  test("inverted: df/postings agree with a direct recount; lists bounded") {
    import spark.implicits._
    val rows = Index.invertedQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.t(spark, sfDir, "documents")
    // independent recount for the headline token
    val top = rows.head
    val tok = top.getAs[String]("tok")
    val dfRecount = docs
      .filter(array_contains(split(lower($"text"), " "), tok)).count()
    assert(top.getAs[Long]("df") == dfRecount,
      s"df(${tok}) ${top.getAs[Long]("df")} != recount $dfRecount")
    rows.foreach { r =>
      // top_docs is the canonical comma-joined string (driver contract)
      val posts = r.getAs[String]("top_docs").split(",").toSeq.map(_.toLong)
      assert(posts.nonEmpty && posts.size <= 5, "posting list must be bounded")
      assert(posts.distinct.size == posts.size, "no duplicate doc ids")
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("df"),
        "every posting doc contributes at least one occurrence")
    }
    // df ordering of the dumped page is monotone non-increasing
    val dfs = rows.map(_.getAs[Long]("df"))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
  }

  test("inverted: posting head is a genuine argmax-tf doc for its token") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val top = Index.invertedQ(spark, sfDir).collect().head
    val tok = top.getAs[String]("tok")
    val headDoc = top.getAs[String]("top_docs").split(",").head.toLong
    val tfs = docs
      .select($"doc_id", explode(split(lower($"text"), " ")).as("t"))
      .filter($"t" === tok)
      .groupBy($"doc_id").count()
    val maxTf = tfs.agg(max($"count")).head().getLong(0)
    val headTf = tfs.filter($"doc_id" === headDoc).head().getLong(1)
    assert(headTf == maxTf,
      s"posting head doc $headDoc has tf $headTf, corpus max is $maxTf")
  }

  test("buckets: partition of the corpus; pad arithmetic internally consistent") {
    import spark.implicits._
    val rows = Text.packBucketsQ(spark, sfDir).collect()
    val totalDocs = graft.Tables.t(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs,
      "every document must land in exactly one (lang, bucket)")
    rows.foreach { r =>
      val (cap, n, sumC, pad) = (r.getAs[Long]("bucket_cap"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars"),
        r.getAs[Long]("pad_chars"))
      assert(pad == cap * n - sumC, "pad must be exactly cap*n - chars")
      assert(sumC <= cap * n, "docs cannot exceed their bucket cap")
      // above the smallest rung every member is > cap/2 chars by the ladder
      if (cap > 64 && cap < 4096)
        assert(sumC > (cap / 2) * n,
          s"cap $cap holds $n docs totalling $sumC chars — some doc is in the wrong bucket")
      val frac = r.getAs[Double]("pad_frac")
      assert(frac >= 0 && frac < 0.5 + 1e-9 || cap == 64,
        s"pad fraction $frac implausible for pow2 buckets")
    }
  }
}
