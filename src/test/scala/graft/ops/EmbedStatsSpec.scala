package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** EmbedStats: the bounded-state moments aggregator must reproduce the
  * posexplode reference exactly and be partition-invariant; Skyline's
  * two-pass distributed frontier must equal the single-window reference
  * and satisfy the dominance property it claims. */
class EmbedStatsSpec extends AnyFunSuite with SparkSpec {

  test("VecMoments equals the posexplode reference plan exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val agg = Centroids.micro(spark, sfDir)
      .select($"mv".as[Seq[Long]])
      .select(EmbedStats.VecMoments.column(64))
      .toDF("n", "s1a", "s2a")
      .select($"n", posexplode(arrays_zip($"s1a", $"s2a")))
      .select($"pos", $"n", $"col.s1a".as("s1"), $"col.s2a".as("s2"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val ref = Centroids.micro(spark, sfDir)
      .select(posexplode($"mv"))
      .groupBy($"pos")
      .agg(count(lit(1)).as("n"), sum($"col").as("s1"),
        sum($"col" * $"col").as("s2"))
      .orderBy($"pos")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(agg.sortBy(_._1) == ref)
  }

  test("moments are invariant under repartitioning") {
    import spark.implicits._
    val base = Centroids.micro(spark, sfDir).select($"mv".as[Seq[Long]])
    def via(ds: org.apache.spark.sql.Dataset[Seq[Long]]) =
      ds.select(EmbedStats.VecMoments.column(64))
        .collect().map { case (n, s1, s2) => (n, s1.toVector, s2.toVector) }.head
    assert(via(base.repartition(13)) == via(base.repartition(2)))
  }

  test("dims: exactly TopDims selected, ranks are a permutation, variance nonnegative") {
    val rows = EmbedStats.dimsQ(spark, sfDir).collect()
    assert(rows.length == 64)
    assert(rows.count(_.getAs[Boolean]("selected")) == 16)
    assert(rows.map(_.getAs[Int]("var_rank")).sorted.toSeq == (1 to 64))
    rows.foreach(r => assert(r.getAs[Double]("variance") >= 0.0))
  }

  test("norms: buckets partition the corpus and bounds are consistent") {
    import spark.implicits._
    val rows = EmbedStats.normsQ(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total == graft.Tables.t(spark, sfDir, "embeddings").count())
    rows.foreach { r =>
      val (b, lo, hi) = (r.getAs[Int]("bucket"),
        r.getAs[Double]("min_norm"), r.getAs[Double]("max_norm"))
      assert(lo <= hi)
      assert(lo >= b / 10.0 - 1e-6 && hi < (b + 1) / 10.0 + 1e-6)
      val mean = r.getAs[Double]("mean_norm")
      assert(mean >= lo - 1e-6 && mean <= hi + 1e-6)
    }
  }

  test("skyline: two-pass frontier equals the single-window reference") {
    val twoPass = Skyline.skylineQ(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSeq
    val ref = Skyline.windowRef(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSeq
    assert(twoPass == ref)
    assert(twoPass.nonEmpty)
  }

  test("skyline: no frontier point is dominated and every part is dominated-or-on-frontier") {
    import spark.implicits._
    val sky = Skyline.skylineQ(spark, sfDir).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).toSeq
    // frontier is strictly increasing in both price and size
    sky.sliding(2).foreach {
      case Seq((p1, s1), (p2, s2)) => assert(p1 < p2 && s1 < s2)
      case _ =>
    }
    // dominance: every part has a frontier point at ≤ price with ≥ size
    val parts = graft.Tables.t(spark, sfDir, "part")
      .select($"p_retailprice", $"p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    parts.foreach { case (p, sz) =>
      assert(sky.exists { case (fp, fs) => fp <= p && fs >= sz },
        s"part ($p, $sz) not covered by any frontier point")
    }
  }

  test("isotropy: pairwise-mean identity matches an explicit pair-loop recompute") {
    import spark.implicits._
    val r = EmbedStats.isotropyQ(spark, sfDir).collect().head
    val mv = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(x => BigDecimal(x.toDouble * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val n = mv.length
    assert(r.getAs[Long]("n") == n)
    // explicit O(n²) pair loop — the identity ‖Σx‖² − Σ‖x‖² must equal it
    val sums = Array.tabulate(64)(d => mv.map(_(d)).sum)
    val q = mv.map(v => v.map(x => x * x).sum).sum
    val s2 = sums.map(s => BigInt(s) * BigInt(s)).sum
    val pairSum = s2 - q // = Σ_{i≠j} ⟨x_i, x_j⟩ by algebra
    var explicit = BigInt(0)
    for (i <- 0 until math.min(n, 60); j <- 0 until math.min(n, 60) if i != j)
      explicit += (0 until 64).map(d => mv(i)(d) * mv(j)(d)).sum
    // spot-verify the identity on the 60-vector prefix
    val sums60 = Array.tabulate(64)(d => mv.take(60).map(_(d)).sum)
    val q60 = mv.take(60).map(v => v.map(x => x * x).sum).sum
    assert(sums60.map(s => BigInt(s) * BigInt(s)).sum - q60 == explicit)
    val want = (s2.toDouble - q.toDouble) / ((n - 1).toDouble * q.toDouble)
    assert(math.abs(r.getAs[Double]("mean_pair_dot_ratio") - want) < 1e-6)
    assert(r.getAs[Double]("top_var_share") >= 1.0 / 64 - 1e-6)
    assert(r.getAs[Double]("norm_sq_cv") >= 0)
  }

  test("cka: width-64 control is exactly 1, curve is monotone, and width-16 matches a driver recompute") {
    import spark.implicits._
    val rows = EmbedStats.ckaQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("width") -> r).toMap
    assert(rows.keySet == Set(8L, 16L, 32L, 64L))
    assert(rows(64L).getAs[Double]("cka") == 1.0)
    assert(rows(64L).getAs[Double]("frob_share") == 1.0)
    val ckas = Seq(8L, 16L, 32L, 64L).map(w => rows(w).getAs[Double]("cka"))
    assert(ckas == ckas.sorted, s"cka not monotone in width: $ckas")
    // driver recompute of width 16 from the exact milli-int moments
    val mv = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
    val n = BigInt(mv.length)
    val sx = Array.tabulate(64)(i => BigInt(mv.map(_(i)).sum))
    def a(i: Int, j: Int): BigInt =
      n * BigInt(mv.map(v => v(i) * v(j)).sum) - sx(i) * sx(j)
    var (fxy, fyy, fxx) = (BigInt(0), BigInt(0), BigInt(0))
    for (i <- 0 until 64; j <- 0 until 64) {
      val sq = a(i, j) * a(i, j)
      fxx += sq
      if (j < 16) fxy += sq
      if (i < 16 && j < 16) fyy += sq
    }
    val want = fxy.toDouble / (math.sqrt(fxx.toDouble) * math.sqrt(fyy.toDouble))
    assert(math.abs(rows(16L).getAs[Double]("cka") - want) < 1e-6)
    assert(math.abs(rows(16L).getAs[Double]("frob_share") -
      math.sqrt(fyy.toDouble) / math.sqrt(fxx.toDouble)) < 1e-6)
  }
}
