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
}
