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
      assert(r.getAs[Double]("inertia_u2")
        == BigDecimal(inertia).toDouble, s"cluster $cid inertia")
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
        assert(r.getAs[Double]("distortion_u2")
          == BigDecimal(dist).toDouble, s"sub $sub cell $cid distortion")
      }
      pqTotal += exp.values.map(_._2).sum
    }
    // PQ's whole point: 8 independent 4-entry codebooks (4^8 effective
    // codewords) quantize tighter than ONE 4-entry full-width codebook
    val whole = lloyd(vecs, Cluster.PqK, 1).values.map(_._2).sum
    assert(pqTotal < whole, s"pq $pqTotal !< single codebook $whole")
  }

  test("pq search: ADC values match a driver recompute and recall@10 vs exact top-10 is usable") {
    import spark.implicits._
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(x => rnd(x.toDouble * 1000000)).toArray))
      .toSeq
    val byId = vecs.toMap
    // retrain the codebook + codes on the driver (same exact contract)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val m = Cluster.PqSubs; val sd = Cluster.PqSubDim; val k = Cluster.PqK
    def sl(v: Array[Long], sub: Int) = v.slice(sub * sd, (sub + 1) * sd)
    val codebook: Map[Int, Seq[(Int, Array[Long])]] = (0 until m).map { sub =>
      val sv = vecs.map { case (id, v) => (id, sl(v, sub)) }
      var cent = sv.sortBy(_._1).take(k).zipWithIndex
        .map { case ((_, v), i) => (i, v) }
      // one Lloyd round
      val asg = sv.map { case (id, v) =>
        (id, cent.map { case (c, cv) => (c, d2(v, cv)) }
          .minBy { case (c, d) => (d, c) }._1) }
      cent = asg.groupBy(_._2).toSeq.map { case (cid, mem) =>
        val vs = mem.map { case (id, _) => sv.find(_._1 == id).get._2 }
        (cid, vs.transpose.map(_.sum)
          .map(x => rnd(x.toDouble / vs.length)).toArray)
      }.sortBy(_._1)
      sub -> cent
    }.toMap
    def code(v: Array[Long], sub: Int): Int =
      codebook(sub).map { case (c, cv) => (c, d2(sl(v, sub), cv)) }
        .minBy { case (c, d) => (d, c) }._1
    val rows = Cluster.pqSearchQ(spark, sfDir).collect()
    val qids = rows.map(_.getAs[Long]("qid")).distinct
    assert(qids.nonEmpty && qids.forall(_ % 97 == 0))
    var recallSum = 0.0
    qids.foreach { qid =>
      val got = rows.filter(_.getAs[Long]("qid") == qid)
        .sortBy(_.getAs[Long]("rank"))
      assert(got.length == 10)
      val q = byId(qid)
      // driver ADC: lut distance from q's subvector to candidate's code centroid
      got.foreach { r =>
        val vid = r.getAs[Long]("vec_id")
        val adc = (0 until m).map { sub =>
          d2(sl(q, sub), codebook(sub).find(_._1 == code(byId(vid), sub)).get._2)
        }.sum
        assert(r.getAs[Long]("adc_u2") == adc, s"q $qid cand $vid adc")
      }
      val exactAll = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, d2(q, v)) }
      val exact = exactAll.sortBy { case (id, d) => (d, id) }
        .take(10).map(_._1).toSet
      recallSum += got.map(_.getAs[Long]("vec_id")).count(exact) / 10.0
      // retrieved candidates must be genuinely closer than average —
      // the robust quality property that survives the distance
      // concentration of near-uniform synthetic embeddings
      val dAll = exactAll.map(_._2.toDouble).sum / exactAll.length
      val dGot = got.map(r => d2(q, byId(r.getAs[Long]("vec_id"))).toDouble)
        .sum / got.length
      assert(dGot < dAll, s"q $qid: retrieved mean $dGot !< corpus mean $dAll")
    }
    // near-uniform random embeddings are PQ's worst case (distances
    // concentrate), so absolute recall is low by construction — the
    // gate is "far better than chance" (chance = 10/(n-1) ~ 0.02)
    val recall = recallSum / qids.length
    val chance = 10.0 / (vecs.length - 1)
    assert(recall >= 3 * chance,
      s"mean recall@10 $recall below 3x chance ${3 * chance}")
  }

  test("kcenter: traversal equals a driver greedy farthest-point; radius monotone non-increasing") {
    import spark.implicits._
    val rows = Cluster.kcenterQ(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("center_rank"))
    assert(rows.length == 8)
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id".as[Long], $"embedding".as[Seq[Float]]).collect()
      .map { case (id, e) =>
        id -> e.map(x => math.round(x.toDouble * 1000000)).toArray
      }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // driver greedy: start at 0, then argmax of running min-distance
    var centers = Vector(0L)
    var md = vecs.map { case (id, v) => id -> d2(v, vecs(0L)) }
    val expected = Vector.newBuilder[(Int, Long, Long)]
    expected += ((1, 0L, md.values.max))
    for (j <- 2 to 8) {
      val next = md.toSeq.sortBy { case (id, d) => (-d, id) }.head._1
      centers :+= next
      md = md.map { case (id, d) => id -> math.min(d, d2(vecs(id), vecs(next))) }
      expected += ((j, next, md.values.max))
    }
    val got = rows.map(r => (r.getAs[Int]("center_rank"),
      r.getAs[Long]("vec_id"), r.getAs[Long]("radius_u2")))
    assert(got.toVector == expected.result(), "greedy traversal mismatch")
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, "radius must not increase as centers are added")
    case _ => ()
    }
    assert(centers.distinct.length == 8, "centers must be distinct")
  }
}
