package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ClusterSpec extends AnyFunSuite with SparkSpec {

  /** Spark/DuckDB `round(double)`: half away from zero — `math.round`
    * would send -2.5 to -2 instead of -3. */
  private def rnd(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Full JVM recompute of the quantized Lloyd loop — init, Rounds
    * assign/update rounds, final assignment — mirroring the exact
    * integer contract of [[Cluster.kmeansQ]]. */
  private def lloyd(vecs: Seq[(Long, Array[Long])], k: Int, rounds: Int)
      : Map[Int, (Long, BigInt)] = {
    def d2(a: Array[Long], b: Array[Long]): BigInt = {
      var s = 0L
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      BigInt(s)
    }
    def assign(cent: Seq[(Int, Array[Long])]): Map[Long, (Int, BigInt)] =
      vecs.map { case (id, v) =>
        val (cid, dist) = cent.map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, dist) => (dist, c) }
        id -> (cid, dist)
      }.toMap
    var cent = vecs.sortBy(_._1).take(k).zipWithIndex
      .map { case ((_, v), i) => (i, v) }
    for (_ <- 1 to rounds) {
      val a = assign(cent)
      cent = a.toSeq.groupBy(_._2._1).toSeq.map { case (cid, members) =>
        val vs = members.map { case (id, _) => vecs.find(_._1 == id).get._2 }
        val sums = vs.transpose.map(_.sum)
        (cid, sums.map(s => rnd(s.toDouble / vs.length)).toArray)
      }.sortBy(_._1)
    }
    assign(cent).toSeq.groupBy(_._2._1).view.mapValues { g =>
      (g.size.toLong, g.map(_._2._2).sum)
    }.toMap
  }

  test("kmeans: sizes and exact inertia match a JVM Lloyd recompute; clusters partition the corpus") {
    import spark.implicits._
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => rnd(x.toDouble * 1000000)).toArray))
      .toSeq
    val exp = lloyd(vecs, Cluster.K, Cluster.Rounds)
    val rows = Cluster.kmeansQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == vecs.length,
      "clusters must partition the corpus")
    rows.foreach { r =>
      val cid = r.getAs[Long]("cid").toInt
      val (n, inertia) = exp(cid)
      assert(r.getAs[Long]("n") == n, s"cluster $cid size")
      assert(BigInt(r.getAs[java.math.BigDecimal]("inertia_u2").toBigInteger)
        == inertia, s"cluster $cid inertia")
      assert(math.abs(r.getAs[Double]("mean_sq") -
        BigDecimal(inertia) .toDouble / n / 1e12) < 1e-5)
    }
  }

  test("kmeans: one Lloyd round strictly decreases total inertia on this corpus") {
    import spark.implicits._
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => rnd(x.toDouble * 1000000)).toArray))
      .toSeq
    val i0 = lloyd(vecs, Cluster.K, 0).values.map(_._2).sum
    val i1 = lloyd(vecs, Cluster.K, 1).values.map(_._2).sum
    val i2 = lloyd(vecs, Cluster.K, Cluster.Rounds).values.map(_._2).sum
    assert(i1 < i0, s"round 1 must improve: $i1 vs $i0")
    assert(i2 <= i1, s"round 2 must not regress: $i2 vs $i1")
  }

  test("pq: per-subspace cells match an independent JVM Lloyd on each 8-dim slice; distortion beats one shared codebook") {
    import spark.implicits._
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => rnd(x.toDouble * 1000000)).toArray))
      .toSeq
    val rows = Cluster.pqQ(spark, sfDir).collect()
    assert(rows.length <= Cluster.PqSubs * Cluster.PqK)
    // every subspace partitions the corpus
    rows.groupBy(_.getAs[Long]("sub")).foreach { case (sub, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == vecs.length, s"sub $sub")
    }
    var pqTotal = BigInt(0)
    (0 until Cluster.PqSubs).foreach { sub =>
      val sl = vecs.map { case (id, v) =>
        (id, v.slice(sub * Cluster.PqSubDim, (sub + 1) * Cluster.PqSubDim)) }
      val exp = lloyd(sl, Cluster.PqK, 1)
      rows.filter(_.getAs[Long]("sub") == sub).foreach { r =>
        val cid = r.getAs[Long]("cid").toInt
        val (n, dist) = exp(cid)
        assert(r.getAs[Long]("n") == n, s"sub $sub cell $cid size")
        assert(BigInt(r.getAs[java.math.BigDecimal]("distortion_u2")
          .toBigInteger) == dist, s"sub $sub cell $cid distortion")
      }
      pqTotal += exp.values.map(_._2).sum
    }
    // PQ's whole point: 8 independent 4-entry codebooks (4^8 effective
    // codewords) quantize tighter than ONE 4-entry full-width codebook
    val whole = lloyd(vecs, Cluster.PqK, 1).values.map(_._2).sum
    assert(pqTotal < whole, s"pq $pqTotal !< single codebook $whole")
  }
}
