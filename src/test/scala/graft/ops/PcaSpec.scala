package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class PcaSpec extends AnyFunSuite with SparkSpec {

  private def r9(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue

  test("pca: unit-norm loadings, positive spectrum, driver-side recurrence recompute") {
    import spark.implicits._
    val rows = Pca.pcaQ(spark, sfDir).collect()
    assert(rows.length == 64)
    val loadings = rows.map(_.getAs[Double]("loading"))
    assert(math.abs(loadings.map(x => x * x).sum - 1.0) < 1e-3)
    val lambda = rows.head.getAs[Double]("lambda")
    val explained = rows.head.getAs[Double]("explained")
    assert(lambda > 0 && explained > 0 && explained <= 1.0)

    // independent recompute: exact micro-unit Gram on the driver, then
    // the same rounded power recurrence
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        math.round(x.toDouble * 1e6)).toArray)
    val n = vecs.length
    val dim = 64
    val s1 = new Array[Long](dim)
    val g = new Array[Long](dim * dim)
    vecs.foreach { v =>
      var i = 0
      while (i < dim) {
        s1(i) += v(i)
        var j = 0
        while (j < dim) { g(i * dim + j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    val m = s1.map(_.toDouble / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      (g(i * dim + j).toDouble / n - m(i) * m(j)) / 1e12)
    var v = Array.fill(dim)(0.125)
    var nrm = 0.0
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dim) { i =>
        (0 until dim).map(j =>
          java.math.BigDecimal.valueOf(r9(cov(i)(j) * v(j))).setScale(9))
          .reduce(_.add(_)).doubleValue
      }
      nrm = math.sqrt(w.map(x =>
        java.math.BigDecimal.valueOf(r9(x * x)).setScale(9))
        .reduce(_.add(_)).doubleValue)
      v = w.map(x => r9(x / nrm))
    }
    rows.foreach { r =>
      val i = r.getAs[Long]("pos").toInt
      assert(math.abs(r.getAs[Double]("loading") - v(i)) < 1e-6,
        s"dim $i: query ${r.getAs[Double]("loading")} vs recompute ${v(i)}")
    }
    assert(math.abs(lambda - nrm) < 1e-6)
  }

  test("pca: result is invariant to input partitioning (exact merges)") {
    import spark.implicits._
    val base = Pca.pcaQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Double]("loading")).toMap
    // same aggregation over a skewed repartition must produce
    // bit-identical sums (integer Gram) and therefore identical output
    val agg = Centroids.micro(spark, sfDir)
      .repartition(7)
      .select($"mv".as[Seq[Long]])
      .select(Pca.GramSum.column(64)).toDF("n", "s1a", "ga")
      .collect().head
    val agg1 = Centroids.micro(spark, sfDir)
      .coalesce(1)
      .select($"mv".as[Seq[Long]])
      .select(Pca.GramSum.column(64)).toDF("n", "s1a", "ga")
      .collect().head
    assert(agg.getAs[Long]("n") == agg1.getAs[Long]("n"))
    assert(agg.getSeq[Long](agg.fieldIndex("s1a")) ==
      agg1.getSeq[Long](agg1.fieldIndex("s1a")))
    assert(agg.getSeq[Long](agg.fieldIndex("ga")) ==
      agg1.getSeq[Long](agg1.fieldIndex("ga")))
    assert(base.nonEmpty)
  }
}
