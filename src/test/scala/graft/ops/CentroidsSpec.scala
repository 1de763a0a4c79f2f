package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** VecSum centroid: the bounded-state scale path must reproduce the
  * posexplode reference plan bit-for-bit (fixed-point sums are exact
  * integer arithmetic), independent of partitioning. */
class CentroidsSpec extends AnyFunSuite with SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("aggregator centroid equals the posexplode reference plan exactly") {
    val agg = rows(Centroids.centroid(spark, sfDir))
    val ref = rows(Centroids.centroidExploded(spark, sfDir))
    assert(agg == ref)
  }

  test("centroid sums are invariant under repartitioning") {
    import spark.implicits._
    val base = Centroids.micro(spark, sfDir)
      .select($"label".as[Int], $"mv".as[Seq[Long]])
    def via(df: org.apache.spark.sql.Dataset[(Int, Seq[Long])]) =
      df.groupByKey(_._1).mapValues(_._2)
        .agg(Centroids.VecSum.column(64).name("agg"))
        .collect().map { case (l, (n, s)) => (l, n, s.toVector) }
        .sortBy(_._1).toSeq
    assert(via(base.repartition(13)) == via(base.repartition(2)))
  }

  test("semdedup prune: exactly n div 10 most-centroid-similar per label, disjoint from outliers") {
    import spark.implicits._
    val rows = Centroids.semDedupQ(spark, "/root/testdata/sf0.001").collect()
    val perLabel = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .groupBy($"label").count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    val pruned = rows.groupBy(_.getAs[Int]("label"))
    pruned.foreach { case (l, rs) =>
      assert(rs.length == (perLabel(l) / 10).toInt,
        s"label $l pruned ${rs.length} of ${perLabel(l)}")
      // ranks are 1..k and cosine is non-increasing in rank
      val byRk = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRk.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length))
      val cs = byRk.map(_.getAs[Double]("cos_centroid"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // the redundancy prune (closest to centroid) and the outlier list
    // (farthest) must never name the same vector
    val outliers = Centroids.outliers(spark, "/root/testdata/sf0.001")
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val prunedIds = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(prunedIds.intersect(outliers).isEmpty)
  }

  test("hard negatives: every mined vector has a different label and beats all other wrong-label vectors") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Similarity.hardNegativesQ(spark, dir).collect()
    val emb = graft.Tables.t(spark, dir, "embeddings").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = emb.map(e => e._1 -> e).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val (_, qlabel, qv) = byId(qid)
      assert(rs.length == 5)
      rs.foreach(r => assert(byId(r.getAs[Long]("vec_id"))._2 != qlabel))
      // driver-side exact top-5 over wrong-label corpus vectors
      val expect = emb.filter(e => e._1 >= 10 && e._2 != qlabel)
        .map(e => (e._1, cos(qv, e._3)))
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val got = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("vec_id")).toSeq
      assert(got == expect, s"query $qid: $got vs $expect")
    }
  }
}
