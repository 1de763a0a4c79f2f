package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Driver-side recomputes for the r8 analytics operators: each query's
  * statistic is re-derived from first principles in plain Scala on the
  * collected (tiny at sf0.001) inputs and compared to the distributed
  * result — independent of both the Spark plan and the DuckDB oracle. */
class AnalyticsSpec extends AnyFunSuite with SparkSpec {

  test("gini: matches the textbook sorted-rank formula and sits in [0, 1)") {
    import spark.implicits._
    val got = Profile.giniQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("n"), r.getAs[Double]("gini"))).toMap
    val rows = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_totalprice").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    rows.groupBy(_._1).foreach { case (prio, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.size
      val sumX = sorted.sum
      val sumIx = sorted.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val gini = 2.0 * sumIx.toDouble / (n * sumX.toDouble) - (n + 1.0) / n
      val (gn, gg) = got(prio)
      assert(gn == n, s"$prio count")
      assert(math.abs(gg - gini) < 1e-6, s"$prio: $gg vs $gini")
      assert(gg >= 0.0 && gg < 1.0)
    }
  }

  test("wasserstein: equals a direct pooled-support CDF integral and bounds KS from below on a unit grid") {
    import spark.implicits._
    val r = Drift.wassersteinQ(spark, sfDir).collect().head
    val (n1, n2, w1) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Double]("w1_dist"))
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val s1 = docs.collect { case ("src0", v) => v }.sorted
    val s2 = docs.collect { case ("src1", v) => v }.sorted
    assert(n1 == s1.length && n2 == s2.length)
    val support = (s1 ++ s2).distinct.sorted
    val direct = support.zip(support.tail).map { case (v, nxt) =>
      val f1 = s1.count(_ <= v).toDouble / s1.length
      val f2 = s2.count(_ <= v).toDouble / s2.length
      BigDecimal(math.abs(f1 - f2) * (nxt - v))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(w1 - direct) < 1e-5, s"$w1 vs $direct")
    assert(w1 >= 0.0)
  }

  test("pmi: counts and scores match a driver recompute; output ordering is (pmi desc, words)") {
    import spark.implicits._
    val got = Colloc.pmiQ(spark, sfDir).collect()
    assert(got.nonEmpty && got.length <= 25)
    val toks = graft.Tables.t(spark, sfDir, "documents")
      .select(lower($"text")).as[String].collect()
      .map(_.split(" ", -1).filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairs = toks.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = uni.values.sum.toDouble
    val nPairs = pairs.values.sum.toDouble
    got.foreach { r =>
      val (w1, w2, c12, pmi) = (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c12"), r.getAs[Double]("pmi"))
      assert(pairs((w1, w2)) == c12, s"($w1,$w2) count")
      assert(c12 >= 5)
      val exp = math.log((c12 / nPairs) / ((uni(w1) / nUni) * (uni(w2) / nUni)))
      assert(math.abs(pmi - exp) < 1e-5, s"($w1,$w2): $pmi vs $exp")
    }
    val keys = got.map(r => (-r.getAs[Double]("pmi"),
      r.getAs[String]("w1"), r.getAs[String]("w2"))).toSeq
    assert(keys == keys.sorted, "not ordered by (pmi desc, w1, w2)")
  }

  test("freqfreq: N_r counts bigrams exactly and r* follows the Good-Turing identity") {
    import spark.implicits._
    val got = Colloc.freqFreqQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("r") ->
        (r.getAs[Long]("n_r"), r.getAs[Double]("r_star"))).toMap
    val counts = graft.Tables.t(spark, sfDir, "documents")
      .select(lower($"text")).as[String].collect()
      .map(_.split(" ", -1).filter(_.nonEmpty).toSeq)
      .flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
    val nr = counts.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    nr.filter(_._1 <= 10).foreach { case (r, n) =>
      val (gn, gstar) = got(r)
      assert(gn == n, s"N_$r")
      val expStar = (r + 1.0) * nr.getOrElse(r + 1, 0L) / n
      assert(math.abs(gstar - expStar) < 1e-6, s"r*_$r: $gstar vs $expStar")
    }
    assert(got.keySet == nr.keySet.filter(_ <= 10))
  }

  test("energy distance: matches a brute-force pairwise driver replay; D2 >= 0") {
    import spark.implicits._
    val r = Drift.energyQ(spark, sfDir).collect().head
    val vals = graft.Tables.t(spark, sfDir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val x = vals.collect { case ("src0", v) => v }
    val y = vals.collect { case ("src1", v) => v }
    assert(r.getAs[Long]("n1") == x.length && r.getAs[Long]("n2") == y.length)
    def meanAbs(a: Array[Long], b: Array[Long]): Double = {
      var s = 0L // <= pairs x max-gap ~ 1e9 at the gate scale
      a.foreach(u => b.foreach(w => s += (u - w).abs))
      s.toDouble / a.length / b.length
    }
    val eXY = meanAbs(x, y)
    val d2 = 2 * eXY - meanAbs(x, x) - meanAbs(y, y)
    assert(math.abs(r.getAs[Double]("mean_cross") - eXY) < 1e-4,
      s"mean_cross ${r.getAs[Double]("mean_cross")} vs replay $eXY")
    assert(math.abs(r.getAs[Double]("e_dist") - d2) < 1e-4,
      s"e_dist ${r.getAs[Double]("e_dist")} vs replay $d2")
    assert(r.getAs[Double]("e_dist") >= 0.0,
      "energy distance is nonnegative (zero iff identical distributions)")
    val t = x.length.toDouble * y.length / (x.length + y.length) * d2
    assert(math.abs(r.getAs[Double]("e_stat") - t) < 1e-3)
  }

  test("chao1: V/F1/F2 exact vs a driver bigram recount; estimator identities hold") {
    import spark.implicits._
    val r = Colloc.chao1Q(spark, sfDir).collect().head
    val counts = graft.Tables.t(spark, sfDir, "documents")
      .select(lower($"text")).as[String].collect()
      .map(_.split(" ", -1).toSeq)
      .flatMap(ts => ts.zip(ts.drop(1))
        .filter(p => p._1.nonEmpty && p._2.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = counts.size.toLong
    val n = counts.values.sum
    val f1 = counts.values.count(_ == 1L).toLong
    val f2 = counts.values.count(_ == 2L).toLong
    assert(r.getAs[Long]("v_obs") == v)
    assert(r.getAs[Long]("n_tokens") == n)
    assert(r.getAs[Long]("f1") == f1)
    assert(r.getAs[Long]("f2") == f2)
    val chao1 = v + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))
    assert(math.abs(r.getAs[Double]("chao1") - chao1) < 1e-6)
    // identities: estimate never below the observed richness;
    // coverage complements the Good-Turing unseen mass in [0, 1]
    assert(r.getAs[Double]("chao1") >= v)
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.0 && cov <= 1.0)
    assert(math.abs(cov - (1.0 - f1.toDouble / n)) < 1e-6)
  }

  test("ece: matches a driver recompute from the calibration bins; mce >= ece") {
    import spark.implicits._
    val r = Classify.eceQ(spark, sfDir).collect().head
    val bins = Classify.calibrationQ(spark, sfDir).collect()
      .map(b => (b.getAs[Long]("n"), b.getAs[Double]("mean_p"),
        b.getAs[Double]("frac_pos")))
    val n = bins.map(_._1).sum
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_bins") == bins.length.toLong)
    // replay on the rounded table is within the 6-dp output tolerance
    val ece = bins.map { case (nb, mp, fp) =>
      math.abs(fp - mp) * nb }.sum / n
    assert(math.abs(r.getAs[Double]("ece") - ece) < 1e-4,
      s"ece ${r.getAs[Double]("ece")} vs replay $ece")
    val mce = r.getAs[Double]("mce")
    assert(mce >= r.getAs[Double]("ece") - 1e-9, "MCE bounds ECE above")
  }

  test("triangles: per-node counts match a naive enumeration of the collected edge list") {
    import spark.implicits._
    val got = Graph.trianglesQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering"))).toMap
    // rebuild the undirected graph naively from the same corpus joins
    val cn = graft.Tables.t(spark, sfDir, "customer")
      .join(graft.Tables.t(spark, sfDir, "nation"), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey".as("ck"), $"n_name".as("cn"))
    val sn = graft.Tables.t(spark, sfDir, "supplier")
      .join(graft.Tables.t(spark, sfDir, "nation"), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey".as("sk"), $"n_name".as("sn"))
    val und = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(cn, $"o_custkey" === $"ck").join(sn, $"l_suppkey" === $"sk")
      .filter($"cn" =!= $"sn")
      .select($"cn", $"sn").distinct().collect()
      .map(r => { val (a, b) = (r.getString(0), r.getString(1))
        if (a < b) (a, b) else (b, a) }).toSet
    val adj = (und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    adj.foreach { case (node, nbrs) =>
      val (deg, tri, coeff) = got(node)
      assert(deg == nbrs.size, s"$node degree")
      val expTri = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      assert(tri == expTri, s"$node triangles: $tri vs $expTri")
      val expCoeff = if (deg > 1)
        BigDecimal(2.0 * expTri / (deg.toDouble * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(math.abs(coeff - expCoeff) < 1e-9, s"$node clustering")
    }
    assert(got.keySet == adj.keySet)
  }

  test("corr matrix: 6 cells, symmetric-range values, matches plain-Scala Pearson") {
    import spark.implicits._
    val got = Profile.corrQ(spark, sfDir).collect()
      .map(r => (r.getAs[String]("col_x"), r.getAs[String]("col_y")) ->
        r.getAs[Double]("corr")).toMap
    assert(got.size == 6)
    got.values.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val data = graft.Tables.t(spark, sfDir, "lineitem")
      .select(cols.map(c => round(col(c).cast("double"), 2)): _*).collect()
      .map(r => cols.indices.map(r.getDouble).toArray)
    def pearson(i: Int, j: Int): Double = {
      val n = data.length.toDouble
      val (xs, ys) = (data.map(_(i)), data.map(_(j)))
      val (sx, sy) = (BigDecimal(xs.map(BigDecimal(_)).sum.toDouble),
        BigDecimal(ys.map(BigDecimal(_)).sum.toDouble))
      val sxy = xs.zip(ys).map { case (a, b) => BigDecimal(a) * BigDecimal(b) }.sum
      val sxx = xs.map(a => BigDecimal(a) * BigDecimal(a)).sum
      val syy = ys.map(a => BigDecimal(a) * BigDecimal(a)).sum
      ((n * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((n * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n * syy.toDouble - sy.toDouble * sy.toDouble)))
    }
    for (Seq(a, b) <- cols.combinations(2)) {
      val exp = pearson(cols.indexOf(a), cols.indexOf(b))
      assert(math.abs(got((a, b)) - exp) < 1e-5, s"($a,$b): ${got((a, b))} vs $exp")
    }
  }

  test("theil: decomposition identity holds and total matches a driver recompute") {
    import spark.implicits._
    val r = Profile.theilQ(spark, sfDir).collect().head
    val (tot, btw, wth) = (r.getAs[Double]("theil_total"),
      r.getAs[Double]("theil_between"), r.getAs[Double]("theil_within"))
    assert(tot >= 0 && btw >= 0 && wth >= 0)
    assert(math.abs(tot - (btw + wth)) < 1e-5,
      s"decomposition: $tot != $btw + $wth")
    val xs = graft.Tables.t(spark, sfDir, "orders")
      .select(round($"o_totalprice".cast("double"), 2)).collect()
      .map(_.getDouble(0))
    assert(r.getAs[Long]("n") == xs.length)
    val mu = xs.map(BigDecimal(_)).sum.toDouble / xs.length
    val exp = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
    assert(math.abs(tot - exp) < 1e-5, s"total $tot vs $exp")
  }

  test("fd audit: key-determined FDs hold, part-to-supplier fails, violation rows match a naive recount") {
    import spark.implicits._
    val got = Validate.fdQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("fd") -> (r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_violating_groups"), r.getAs[Long]("n_violating_rows"))).toMap
    assert(got("nation_to_region")._2 == 0, "nationkey determines regionkey")
    assert(got("cust_to_segment")._2 == 0, "custkey is a key")
    val li = graft.Tables.t(spark, sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = li.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expGroups = byPart.size.toLong
    val violating = byPart.filter(_._2.distinct.size > 1)
    val expViolRows = violating.values.map { supps =>
      supps.size - supps.groupBy(identity).values.map(_.size).max
    }.sum.toLong
    assert(got("part_to_supp") ==
      ((expGroups, violating.size.toLong, expViolRows)))
  }

  test("seq trigrams: counts match a driver-side per-user sequence recount") {
    import spark.implicits._
    val got = Patterns.trigramsQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("trigram") -> r.getAs[Long]("n"))
    assert(got.nonEmpty && got.length <= 20)
    val events = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val counts = events.groupBy(_._1).values.flatMap { evs =>
      val seq = evs.sortBy(e => (e._2, e._3)).map(_._4).toSeq
      seq.sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (tri, n) =>
      assert(counts(tri) == n, s"$tri: $n vs ${counts(tri)}") }
    // the emitted page is the true top of the distribution
    val floor = got.map(_._2).min
    assert(counts.values.count(_ > floor) <= got.count(_._2 > floor),
      "a higher-count trigram was left out of the top-20 page")
    val ns = got.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("silhouette: bounded in [-1,1], matches a driver recompute, plan is explode-free") {
    import spark.implicits._
    val q = Centroids.silhouetteQ(spark, sfDir)
    assert(!q.queryExecution.executedPlan.toString.contains("Generate"),
      "silhouette must not explode the per-vector distance rows")
    val got = q.collect().map(r => r.getAs[Int]("label") ->
      (r.getAs[Long]("n"), r.getAs[Double]("avg_silhouette"))).toMap
    got.values.foreach { case (_, s) => assert(s >= -1.0 && s <= 1.0) }
    // driver recompute: micro-quantized centroids, per-vector a/b/s
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"label", $"embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(x =>
        math.round(x.toDouble * 1000000).toDouble / 1000000).toArray))
    val cents = vecs.groupBy(_._1).view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim)(i => vs.map(_._2(i)).sum / vs.size)
    }.toMap
    def dist(x: Array[Double], c: Array[Double]) =
      math.sqrt(x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
    val expected = vecs.groupBy(_._1).map { case (lab, vs) =>
      val ss = vs.map { case (_, v) =>
        val a = dist(v, cents(lab))
        val b = cents.collect { case (l, c) if l != lab => dist(v, c) }.min
        BigDecimal((b - a) / math.max(a, b))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      lab -> (vs.size.toLong, (ss.sum.toDouble / vs.size))
    }
    expected.foreach { case (lab, (n, s)) =>
      val (gn, gs) = got(lab)
      assert(gn == n, s"label $lab n")
      assert(math.abs(gs - s) < 1e-4, s"label $lab: $gs vs $s")
    }
  }

  test("jl projection: distortion stats match a driver recompute of the same arithmetic matrix") {
    import spark.implicits._
    val r = EmbedStats.jlQ(spark, sfDir).collect().head
    val k = 16
    def sign(idx: Long): Double =
      if ((((idx * 2654435761L) % 4294967296L) / 65536) % 2 == 0) 1.0 else -1.0
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(x => x.getLong(0) -> x.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(k)(j =>
        (0 until 64).map(i => v(i) * sign(i.toLong * k + j)).sum / math.sqrt(k))
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val byId = vecs.toMap
    val ratios = vecs.collect { case (id, v) if byId.contains(id + 1) =>
      val w = byId(id + 1)
      val dOrig = dist(v, w)
      (dOrig, dist(proj(v), proj(w)) / dOrig)
    }.collect { case (d, ratio) if d > 0 =>
      BigDecimal(ratio).setScale(9, BigDecimal.RoundingMode.HALF_UP) }
    assert(r.getAs[Long]("n_pairs") == ratios.length)
    assert(math.abs(r.getAs[Double]("mean_ratio") -
      ratios.sum.toDouble / ratios.length) < 1e-5)
    assert(math.abs(r.getAs[Double]("min_ratio") - ratios.min.toDouble) < 1e-5)
    assert(math.abs(r.getAs[Double]("max_ratio") - ratios.max.toDouble) < 1e-5)
    // JL promise at k=16: the BULK of pairs inside a loose band; mean near 1
    assert(r.getAs[Double]("mean_ratio") > 0.7 && r.getAs[Double]("mean_ratio") < 1.3)
  }

  test("curate funnel: covers the corpus, narrows monotonically, dedup stage equals dropNearDuplicates") {
    import spark.implicits._
    val rows = Curate.curateQ(spark, sfDir).collect()
    val docs = graft.Tables.t(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val (n, q, d, f) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_dedup"), r.getAs[Long]("n_final"))
      assert(n >= q && q >= d && d >= f, s"${r.getAs[String]("source")} funnel must narrow")
    }
    // the dedup stage must agree with the standalone operator composed
    // with the same quality gate
    val expDedup = Dedup.dropNearDuplicates(spark, sfDir)
      .filter($"n_chars" >= 100 && size(split(lower($"text"), " ")) >= 20)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dedup") ==
        expDedup.getOrElse(r.getAs[String]("source"), 0L),
        s"${r.getAs[String]("source")} dedup stage")
    }
  }

  test("tokenize coverage: per-doc token counts conserve and oov equals a recount against the top-25 vocab") {
    import spark.implicits._
    val got = Curate.tokenizeCoverageQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"))).toMap
    val texts = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).filter(_.nonEmpty).toSeq }
    val counts = texts.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(25)
      .map(_._1).toSet
    texts.foreach { case (id, toks) =>
      val (n, oov) = got(id)
      assert(n == toks.size, s"doc $id token count")
      assert(oov == toks.count(!vocab.contains(_)), s"doc $id oov")
    }
    assert(got.keySet == texts.map(_._1).toSet)
  }

  test("fk audit: TPC-H edges are orphan-free and a planted orphan is counted") {
    import spark.implicits._
    val got = Validate.fkQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("edge") ->
        (r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans"))).toMap
    assert(got.size == 6)
    // the generated star schema is referentially intact
    got.foreach { case (e, (n, o)) =>
      assert(o == 0, s"$e: unexpected orphans $o")
      assert(n > 0, s"$e: empty child side")
    }
    assert(got("customer_nation")._1 ==
      graft.Tables.t(spark, sfDir, "customer").count())
    // the audit actually detects: a child frame with a planted bad key
    val bad = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_nationkey").limit(5)
      .unionByName(Seq(-999).toDF("c_nationkey"))
    val orphan = bad.join(
      graft.Tables.t(spark, sfDir, "nation").select($"n_nationkey"),
      $"c_nationkey" === $"n_nationkey", "left_anti").count()
    assert(orphan == 1L, "planted orphan must surface in an anti-join")
  }

  test("reciprocity: matches a driver recount over the collected directed edge list") {
    import spark.implicits._
    val r = Graph.reciprocityQ(spark, sfDir).collect().head
    val edges = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(graft.Tables.t(spark, sfDir, "customer")
          .join(graft.Tables.t(spark, sfDir, "nation"), $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey".as("ck"), $"n_name".as("cn")), $"o_custkey" === $"ck")
      .join(graft.Tables.t(spark, sfDir, "supplier")
          .join(graft.Tables.t(spark, sfDir, "nation"), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey".as("sk"), $"n_name".as("sn")), $"l_suppkey" === $"sk")
      .filter($"cn" =!= $"sn")
      .groupBy($"cn", $"sn").count().collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val nRec = edges.keys.count { case (u, v) => edges.contains((v, u)) }
    val wMutual = edges.collect { case ((u, v), w) if edges.contains((v, u)) =>
      math.min(w, edges((v, u))) }.sum
    assert(r.getAs[Long]("n_edges") == edges.size)
    assert(r.getAs[Long]("n_reciprocal") == nRec)
    assert(math.abs(r.getAs[Double]("reciprocity") -
      BigDecimal(nRec.toDouble / edges.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(r.getAs[Double]("weighted_reciprocity") -
      BigDecimal(wMutual.toDouble / edges.values.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("one-scan proofs: corr, bootstrap, and rules each read their table exactly once") {
    import org.apache.spark.sql.execution.ExplainMode
    for ((name, df) <- Seq(
        "corr" -> Profile.corrQ(spark, sfDir),
        "bootstrap" -> Stats.bootstrapQ(spark, sfDir),
        "rules" -> Validate.rulesQ(spark, sfDir))) {
      // AQE query stages hide subplans from plan.collect, so count scan
      // nodes in the formatted explain instead
      val formatted = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(formatted).length
      assert(scans == 1,
        s"$name must scan its table exactly once, saw $scans:\n$formatted")
    }
  }

  test("dow profile: cells conserve the corpus, shares normalize, ISO weekday pinning is correct") {
    import spark.implicits._
    val rows = TimeSeries.dowProfileQ(spark, sfDir).collect()
    val events = graft.Tables.t(spark, sfDir, "events")
    assert(rows.map(_.getAs[Long]("n")).sum == events.count())
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Int]("iso_dow") >= 1 && r.getAs[Int]("iso_dow") <= 7)
      assert(r.getAs[Int]("hour") >= 0 && r.getAs[Int]("hour") <= 23)
    }
    // ISO pinning: recount one cell driver-side from the raw timestamps
    val (d0, h0) = (rows.head.getAs[Int]("iso_dow"), rows.head.getAs[Int]("hour"))
    val exp = events.select($"ts").collect().count { r =>
      val ldt = r.getTimestamp(0).toLocalDateTime
      ldt.getDayOfWeek.getValue == d0 && ldt.getHour == h0
    }
    assert(rows.head.getAs[Long]("n") == exp, s"cell ($d0,$h0)")
  }

  test("hapax: per-source bigram accounting matches a driver recount") {
    import spark.implicits._
    val got = Colloc.hapaxQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("n_hapax"))).toMap
    val bySource = graft.Tables.t(spark, sfDir, "documents")
      .select($"source", lower($"text")).as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.flatMap { case (_, t) =>
        val toks = t.split(" ", -1).filter(_.nonEmpty).toSeq
        toks.zip(toks.drop(1))
      }.groupBy(identity).view.mapValues(_.size).toMap)
    bySource.foreach { case (src, counts) =>
      val (occ, dis, hap) = got(src)
      assert(occ == counts.values.sum, s"$src occurrences")
      assert(dis == counts.size, s"$src distinct")
      assert(hap == counts.values.count(_ == 1), s"$src hapax")
    }
    assert(got.keySet == bySource.keySet)
  }

  test("label sim: 45 ordered pairs, cosine within [-1,1], self-consistent with collected centroids") {
    import spark.implicits._
    val rows = Centroids.labelSimQ(spark, sfDir).collect()
    assert(rows.length == 45) // C(10,2)
    rows.foreach { r =>
      assert(r.getAs[Int]("label_a") < r.getAs[Int]("label_b"))
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // independent centroid recompute (micro-unit quantization) + cosine
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"label", $"embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(x =>
        math.round(x.toDouble * 1000000).toDouble / 1000000)))
    val cents = vecs.groupBy(_._1).view.mapValues { vs =>
      val n = vs.size
      val dim = vs.head._2.size
      (0 until dim).map(i => vs.map(_._2(i)).sum / n)
    }.toMap
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    rows.foreach { r =>
      val (a, b) = (r.getAs[Int]("label_a"), r.getAs[Int]("label_b"))
      val exp = dot(cents(a), cents(b)) /
        (math.sqrt(dot(cents(a), cents(a))) * math.sqrt(dot(cents(b), cents(b))))
      assert(math.abs(r.getAs[Double]("cosine") - exp) < 1e-4,
        s"($a,$b): ${r.getAs[Double]("cosine")} vs $exp")
    }
  }

  test("percentile disc: selection matches a driver-side sort and the ladder is ordered") {
    import spark.implicits._
    val rows = Profile.percentileDiscQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[String]("g")
      val vs = graft.Tables.t(spark, sfDir, "lineitem")
        .filter($"l_returnflag" === g).select($"l_quantity")
        .collect().map(_.getDouble(0)).sorted
      assert(r.getAs[Long]("n_rows") == vs.length)
      def disc(p: Int): Double = vs((p * vs.length + 99) / 100 - 1)
      assert(r.getAs[Double]("p25") == disc(25))
      assert(r.getAs[Double]("p50") == disc(50))
      assert(r.getAs[Double]("p75") == disc(75))
      assert(r.getAs[Double]("p90") == disc(90))
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p75"))
      assert(r.getAs[Double]("p75") <= r.getAs[Double]("p90"))
    }
  }

  test("interarrival: gap accounting is per-user consistent and bounded") {
    val rows = TimeSeries.interarrivalQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gaps") == r.getAs[Long]("n_events") - 1)
      val mn = r.getAs[Long]("min_gap_us"); val md = r.getAs[Long]("median_gap_us")
      val me = r.getAs[Long]("mean_gap_us"); val mx = r.getAs[Long]("max_gap_us")
      assert(mn >= 0 && mn <= md && md <= mx)
      assert(me >= mn && me <= mx)
    }
  }

  test("edit matrix: pairs ordered, distances in (0, 4], consistent with a JVM Levenshtein") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = Fuzzy.editMatrixQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[String]("name_a"); val b = r.getAs[String]("name_b")
      assert(a < b)
      val d = r.getAs[Long]("lev")
      assert(d > 0 && d <= 4)
      assert(d == lev(a, b).toLong, s"($a,$b)")
    }
  }

  test("neighbor sim: jaccard bounded by degree identities on every pair") {
    val rows = Graph.neighborSimQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val da = r.getAs[Long]("deg_a"); val db = r.getAs[Long]("deg_b")
      val c = r.getAs[Long]("n_common"); val j = r.getAs[Long]("jaccard_bp")
      assert(c <= math.min(da, db))
      assert(j >= 0 && j <= 10000)
      // exact integer identity: bp = floor(10000*c/(da+db-c))
      assert(j == 10000 * c / (da + db - c))
    }
  }

  test("canonical selection: the kept doc maximizes n_chars within its cluster") {
    import spark.implicits._
    val canon = Curate.canonicalQ(spark, sfDir).collect()
    assert(canon.nonEmpty)
    val lens = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = Dedup.clustersQ(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    canon.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val keep = r.getAs[Long]("keep_id")
      val members = clusters(cid)
      assert(r.getAs[Long]("n_members") >= 2)
      assert(members.contains(keep))
      val best = members.map(m => (lens(m), -m)).max
      assert(lens(keep) == best._1 && keep == -best._2)
      assert(r.getAs[Long]("kept_chars") == lens(keep))
      assert(r.getAs[Long]("dropped_chars") ==
        members.map(lens).sum - lens(keep))
    }
  }

  test("mode: matches a driver-side frequency recount with smallest-value tiebreak") {
    import spark.implicits._
    val rows = Profile.modeQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[String]("g")
      val vs = graft.Tables.t(spark, sfDir, "lineitem")
        .filter($"l_returnflag" === g).select($"l_quantity")
        .collect().map(_.getDouble(0))
      val freq = vs.groupBy(identity).view.mapValues(_.length).toMap
      val best = freq.toSeq.map { case (v, c) => (c, -v) }.max
      assert(r.getAs[Double]("mode_value") == -best._2)
      assert(r.getAs[Long]("mode_n") == best._1.toLong)
      assert(r.getAs[Long]("n_rows") == vs.length.toLong)
      assert(r.getAs[Long]("mode_share_bp") ==
        10000L * best._1 / vs.length)
    }
  }

  test("islands: the whole event-id space partitions into the per-type runs") {
    val rows = Validate.islandsQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.t(spark, sfDir, "events").count()
    assert(rows.map(_.getAs[Long]("n_ids")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_run") >= 1L)
      assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("n_ids"))
      assert(r.getAs[Long]("n_missing_internal") >= 0L)
    }
    // the id space is dense 0..N-1 and types interleave: every type's
    // span holes are exactly the other types' ids inside its span
    val spans = rows.map(r => (r.getAs[Long]("n_ids"),
      r.getAs[Long]("n_missing_internal")))
    assert(spans.forall { case (ids, miss) => ids + miss >= ids })
  }

  test("disorder: jitter makes some events late relative to their user stream, bounded by jitter width") {
    val rows = graft.streaming.EventStreams.disorderBatch(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nDis = rows.map(_.getAs[Long]("n_disordered")).sum
    assert(nDis > 0, "the md5 jitter must produce some reordering")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_late_10m") <= r.getAs[Long]("n_disordered"))
      assert(r.getAs[Long]("n_disordered") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("max_lag_us") >= 0L)
    }
  }

  test("balanced sample: every class keeps exactly the minority count, ids verified by digest") {
    import spark.implicits._
    val rows = graft.ops.Text.balancedSample(spark, sfDir).collect()
    assert(rows.length >= 2)
    val minClass = rows.map(_.getAs[Long]("n_before")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") == minClass)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_before"))
    }
    // digest equals a driver-side recompute of the same hash-order pick
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"lang", $"doc_id",
        shiftright(graft.ops.Hashing.md5Long60($"doc_id".cast("string")), 7)
          .as("hv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val kept = ds.sortBy(d => (d._3, d._2)).take(minClass.toInt)
      val expSum = kept.map(_._2).sum
      val got = rows.find(_.getAs[String]("lang") == lang).get
      assert(got.getAs[Long]("kept_id_sum") == expSum, s"lang $lang digest")
    }
  }

  test("abc: two-level cumulative classification equals a global-sort recompute") {
    import spark.implicits._
    val rows = Profile.abcQ(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rev = graft.Tables.t(spark, sfDir, "orders")
      .groupBy($"o_custkey")
      .agg((sum($"o_totalprice".cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(r => (-r._2, r._1))
    val total = rev.map(_._2).sum
    var cum = 0L
    val classed = rev.map { case (_, c) =>
      val cls = if (cum * 100 < total * 80) "A"
        else if (cum * 100 < total * 95) "B" else "C"
      cum += c
      (cls, c)
    }
    val expected = classed.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(_._2).sum)).toMap
    assert(rows == expected, s"got $rows expected $expected")
    assert(rows("A")._2 * 100 >= total * 79, "class A carries ~80% of revenue")
  }

  test("spatial join: grid-bucketed pairs equal a naive all-pairs distance scan") {
    import spark.implicits._
    val got = Spatial.spatialQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // derive the same md5 positions driver-side
    def h60(sfx: String)(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + sfx).getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16) % 9000
    }
    val ids = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_custkey").collect().map(_.getLong(0))
    val pos = ids.map(id => id -> (h60(":x")(id), h60(":y")(id))).toMap
    val expected = (for {
      i <- ids; j <- ids if i < j
      dx = pos(i)._1 - pos(j)._1; dy = pos(i)._2 - pos(j)._2
      d2 = dx * dx + dy * dy if d2 <= 10000L
    } yield (i, j) -> d2).toMap
    assert(got == expected,
      s"pair sets differ: got ${got.size} expected ${expected.size}")
    assert(got.nonEmpty, "the 90x90 plane should yield close pairs")
  }

  test("concurrency: two-level prefix sweep equals an in-memory sweep line") {
    import spark.implicits._
    val got = TimeSeries.concurrencyQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val spans = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.min(unix_micros($"ts")).as("t0"),
        org.apache.spark.sql.functions.max(unix_micros($"ts")).as("t1"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val deltas = (spans.map(s => (s._1, 1L)) ++ spans.map(s => (s._2 + 1, -1L)))
      .sortBy(d => (d._1, -d._2))
    var level = 0L
    val byDay = scala.collection.mutable.LinkedHashMap[Long, (Long, Long, Long)]()
    deltas.foreach { case (t, d) =>
      val day = t / 86400000000L
      // a day's peak starts at the level carried INTO the day
      val entry = byDay.getOrElse(day, (0L, 0L, level))
      level += d
      byDay(day) = (entry._1 + (if (d > 0) 1 else 0),
        entry._2 + (if (d < 0) 1 else 0),
        math.max(entry._3, level))
    }
    val expected = byDay.toSeq.map { case (day, (st, en, pk)) =>
      (day, st, en, pk) }.sortBy(_._1)
    assert(got.toSeq == expected,
      s"sweep mismatch:\n got ${got.toSeq}\n exp $expected")
  }

  test("compression ratio: deterministic, bounded, and ranks repetitive text below novel text") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val a = Text.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = Text.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(a == b, "deflate output must be run-deterministic")
    assert(a.nonEmpty)
    a.values.foreach(v => assert(v > 0 && v < 12000))
    // a planted pathological pair: pure repetition compresses far
    // better than the same-length word soup
    val planted = Seq(
      (900001L, "spam " * 200),
      (900002L, (1 to 200).map(i => s"w${i * 7919 % 997}").mkString(" ")))
      .toDF("doc_id", "text")
    val p = Text.compressionRatio(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(p(900001L) < p(900002L) / 2,
      s"repetition ${p(900001L)} vs novel ${p(900002L)}")
  }

  test("budget selection: greedy prefix matches a driver knapsack replay per source") {
    import spark.implicits._
    val got = Curate.budgetQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"source", $"text").collect()
      .map { r =>
        val toks = r.getString(2).toLowerCase.split(" ").toSeq
        (r.getLong(0), r.getString(1), toks.length.toLong,
          toks.distinct.length.toLong)
      }
    docs.groupBy(_._2).foreach { case (src, g) =>
      def d9(u: Long, n: Long) = BigDecimal(u.toDouble / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val budget = g.map(_._3).sum / 2
      val order = g.sortBy { case (id, _, n, u) => (-d9(u, n), id) }
      var cum = 0L
      val taken = order.takeWhile { case (_, _, n, _) => cum += n; cum <= budget }
      val r = got(src)
      assert(r.getAs[Long]("budget") == budget, s"$src budget")
      assert(r.getAs[Long]("n_selected") == taken.length, s"$src n_selected")
      assert(r.getAs[Long]("tokens_selected") == taken.map(_._3).sum)
      assert(r.getAs[Long]("uniq_yield") == taken.map(_._4).sum)
      // the greedy is budget-feasible and the FIRST reject would overflow
      assert(r.getAs[Long]("tokens_selected") <= budget)
      val rej = order.drop(taken.length).headOption
      assert(r.getAs[Long]("first_reject_doc") == rej.map(_._1).getOrElse(-1L))
      rej.foreach { rj =>
        assert(taken.map(_._3).sum + rj._3 > budget, s"$src reject overflow") }
    }
  }

  test("curriculum: phases partition each language track and quartile cuts are respected") {
    val rows = Curate.curriculumQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val langTotals = graft.Tables.t(spark, sfDir, "documents")
      .groupBy(org.apache.spark.sql.functions.col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rs) =>
      val n = langTotals(lang)
      assert(rs.map(_.getAs[Long]("n_docs")).sum == n, s"$lang partition")
      // each phase's total across shards is the quartile slice width
      val perPhase = rs.groupBy(_.getAs[Long]("phase")).view
        .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
      def cut(p: Long) = (p * n + 99) / 100
      assert(perPhase.getOrElse(1L, 0L) == cut(25))
      assert(perPhase.getOrElse(2L, 0L) == cut(50) - cut(25))
      assert(perPhase.getOrElse(3L, 0L) == cut(75) - cut(50))
      assert(perPhase.getOrElse(4L, 0L) == n - cut(75))
    }
  }

  test("negatives: sampled pairs are true non-interactions in deterministic hash order") {
    import spark.implicits._
    val rows = Curate.negativesQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val pos = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .join(graft.Tables.t(spark, sfDir, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"o_custkey", $"p_brand").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    rows.foreach { r =>
      val (c, b) = (r.getAs[Long]("c_custkey"), r.getAs[String]("neg_brand"))
      assert(!pos.contains((c, b)), s"($c, $b) was actually purchased")
      assert(r.getAs[Int]("rk") >= 1 && r.getAs[Int]("rk") <= 5)
    }
    // determinism: one customer's negatives follow the md5(cust:brand) order
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s0: String): Long = java.lang.Long.parseLong(
      md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val brands = graft.Tables.t(spark, sfDir, "part")
      .select($"p_brand").distinct().collect().map(_.getString(0))
    val c0 = rows.head.getAs[Long]("c_custkey")
    val expect = brands.filterNot(b => pos.contains((c0, b)))
      .sortBy(b => (h(s"$c0:$b"), b)).take(5).toSeq
    val got = rows.filter(_.getAs[Long]("c_custkey") == c0)
      .sortBy(_.getAs[Int]("rk")).map(_.getAs[String]("neg_brand")).toSeq
    assert(got == expect)
  }

  test("dsir: weights match a driver-side hashed-ngram recompute and separate the target slice") {
    import spark.implicits._
    val got = Curate.dsirQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Double]("logw"))).toMap
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang", lower($"text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Int = {
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 256).toInt
    }
    val tokens = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ", -1).map(bucket)) }
    val nr = tokens.map(_._3.length.toLong).sum
    val nt = tokens.filter(_._2 == "en").map(_._3.length.toLong).sum
    val cr = tokens.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = tokens.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r9(d: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d).setScale(9, java.math.RoundingMode.HALF_UP)
    val lr = cr.keys.map(b => b -> r9(
      math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nt + 256)) -
        math.log((cr(b) + 1).toDouble / (nr + 256)))).toMap
    tokens.filter(_._1 < 300).foreach { case (id, _, bs) =>
      val w = bs.groupBy(identity).map { case (b, os) =>
        lr(b).multiply(java.math.BigDecimal.valueOf(os.length.toLong)) }
        .reduce(_.add(_))
      val expect = w.setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      val (nToks, logw) = got(id)
      assert(nToks == bs.length, s"doc $id n_toks")
      assert(math.abs(logw - expect) < 2e-6, s"doc $id: $logw vs $expect")
    }
    // the operator's point: the target slice scores higher on average
    val byLang = docs.filter(_._1 < 300).map(d => (d._2 == "en", got(d._1)._2))
    val enMean = byLang.filter(_._1).map(_._2).sum / byLang.count(_._1)
    val restMean = byLang.filterNot(_._1).map(_._2).sum / byLang.count(!_._1)
    assert(enMean > restMean, s"en mean $enMean !> rest mean $restMean")
  }

  test("freshness: statuses match a driver trailing-median recompute; day accounting closes") {
    import spark.implicits._
    val rows = Validate.freshnessQ(spark, sfDir).collect()
    val daily = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", to_date($"ts").as("day")).count().collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay), r.getLong(2)))
      .toMap
    val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val cs = (0 until 30).map(i => daily.getOrElse((ty, d0 + i), 0L))
      var (ok, low, missing) = (0L, 0L, 0L)
      var worst = Double.MaxValue
      (7 until 30).foreach { i =>
        val med = cs.slice(i - 7, i).sorted.apply(3)
        val c = cs(i)
        if (c == 0) missing += 1
        else if (c * 2 < med) low += 1
        else ok += 1
        if (med > 0) worst = math.min(worst,
          BigDecimal(c.toDouble / med).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      assert(r.getAs[Long]("n_days_checked") == 23, s"$ty days")
      assert(r.getAs[Long]("n_ok") == ok, s"$ty ok")
      assert(r.getAs[Long]("n_low") == low, s"$ty low")
      assert(r.getAs[Long]("n_missing") == missing, s"$ty missing")
      assert(math.abs(r.getAs[Double]("worst_ratio") - worst) < 1e-9, s"$ty worst")
      assert(ok + low + missing == 23)
    }
  }

  test("ndcg: identities hold and DCG/IDCG match a recompute from the BM25 ranking and raw text") {
    import spark.implicits._
    val r = Text.ndcgQ(spark, sfDir).collect().head
    val (dcg, idcg, ndcg) = (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
      r.getAs[Double]("ndcg"))
    assert(dcg > 0 && idcg >= dcg - 1e-9, "IDCG bounds DCG")
    assert(math.abs(ndcg - dcg / idcg) < 1e-5)
    assert(ndcg > 0 && ndcg <= 1 + 1e-9)
    // relevance from raw text: distinct query terms present
    val q = Set("dup", "vector", "spark")
    val rels = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(x => (x.getLong(0),
        x.getString(1).toLowerCase.split(" ").filter(q).distinct.length))
      .filter(_._2 > 0)
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // IDCG recompute: ideal = rel desc, doc_id asc, top 20
    val ideal = rels.sortBy { case (id, rel) => (-rel, id) }.take(20)
    val expIdcg = ideal.zipWithIndex.map { case ((_, rel), i) =>
      r9((math.pow(2, rel) - 1) / (math.log(i + 2) / math.log(2))) }.sum.toDouble
    assert(math.abs(idcg - expIdcg) < 1e-5, s"idcg $idcg vs $expIdcg")
    // DCG recompute from the BM25 top-20 ordering + recomputed rel
    val relMap = rels.toMap
    val top = Text.bm25(spark, sfDir).collect()
    val expDcg = top.zipWithIndex.map { case (row, i) =>
      val rel = relMap(row.getAs[Long]("doc_id"))
      assert(rel == row.getAs[Int]("n_terms_hit"), "rel = distinct terms hit")
      r9((math.pow(2, rel) - 1) / (math.log(i + 2) / math.log(2)))
    }.sum.toDouble
    assert(math.abs(dcg - expDcg) < 1e-5, s"dcg $dcg vs $expDcg")
  }

  test("err: cascade fold matches a driver replay over the BM25 top-20; @10 <= @20 <= 1") {
    val r = Text.errQ(spark, sfDir).collect().head
    val top = Text.bm25(spark, sfDir).collect()
      .map(_.getAs[Int]("n_terms_hit"))
    assert(r.getAs[Long]("n_ranked") == top.length)
    def errAt(k: Int): Double = {
      var s = 0.0; var p = 1.0; var rank = 1
      top.take(k).foreach { rel =>
        val rr = (math.pow(2.0, rel) - 1.0) / 8.0
        s += p * rr / rank; p *= (1.0 - rr); rank += 1
      }
      s
    }
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("err_at_10") - r6(errAt(10))) < 1e-9,
      s"err@10 ${r.getAs[Double]("err_at_10")} vs replay ${errAt(10)}")
    assert(math.abs(r.getAs[Double]("err_at_20") - r6(errAt(20))) < 1e-9)
    assert(r.getAs[Double]("err_at_10") > 0)
    assert(r.getAs[Double]("err_at_10") <= r.getAs[Double]("err_at_20") + 1e-9)
    assert(r.getAs[Double]("err_at_20") <= 1.0)
  }

  /** Dense hourly (or daily) count series per event type from the raw
    * events, over the pinned 2024-01-01..2024-01-30 grid. */
  private def denseCounts(truncTo: String): Map[String, Array[Long]] = {
    import spark.implicits._
    val raw = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", date_trunc(truncTo, $"ts").as("b"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val step = if (truncTo == "hour") 3600000L else 86400000L
    val n = if (truncTo == "hour") 720 else 30
    val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = raw.keySet.map(_._1)
    types.map { tp =>
      tp -> (0 until n).map(i =>
        raw.getOrElse((tp, start + i * step), 0L)).toArray
    }.toMap
  }

  test("ljung-box: Q matches a classical-acf driver replay on the dense hourly grid") {
    val rows = TimeSeries.ljungBoxQ(spark, sfDir).collect()
    val series = denseCounts("hour")
    assert(rows.length == series.size)
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { r =>
      val xs = series(r.getAs[String]("event_type"))
      val n = xs.length
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("m") == 12)
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val xbar = sx.toDouble / n
      val den = sxx.toDouble - sx.toDouble * sx.toDouble / n
      val tsum = (1 to 12).map { k =>
        var sxy = 0L; var sxw = 0L; var syw = 0L; var cw = 0L
        for (i <- k until n) {
          sxy += xs(i) * xs(i - k); sxw += xs(i); syw += xs(i - k); cw += 1
        }
        val num = sxy.toDouble - xbar * (sxw + syw) + cw * xbar * xbar
        r12((num / den) * (num / den) / (n - k))
      }.sum.toDouble
      val q = n.toDouble * (n + 2) * tsum
      def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("q_stat") - r6(q)) < 1e-9,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("q_stat")} vs $q")
      assert(r.getAs[Double]("q_stat") >= 0.0)
    }
  }

  test("mase: seasonal-naive holdout accuracy matches a driver replay") {
    val rows = TimeSeries.maseQ(spark, sfDir).collect()
    val series = denseCounts("day")
    assert(rows.length == series.size)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    rows.foreach { r =>
      val xs = series(r.getAs[String]("event_type"))
      // forecast f(i) = xs(i-7); test = days 24..30 (idx 23..29)
      val test = (23 until 30).map(i => (xs(i), xs(i - 7)))
      val train = (7 until 23).map(i => (xs(i), xs(i - 7)))
      assert(r.getAs[Long]("n_test") == test.length)
      val maeT = test.map { case (a, f) => math.abs(a - f) }.sum.toDouble / test.length
      val maeTr = train.map { case (a, f) => math.abs(a - f) }.sum.toDouble / train.length
      val sm = test.map { case (a, f) =>
        if (a + f == 0) BigDecimal(0)
        else r12(2.0 * math.abs(a - f).toDouble / (a + f).toDouble)
      }.sum.toDouble
      assert(math.abs(r.getAs[Double]("mae_test") - r6(maeT)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mase") - r6(maeT / maeTr)) < 1e-9)
      assert(math.abs(r.getAs[Double]("smape") - r6(100.0 * sm / test.length)) < 1e-9)
    }
  }

  test("rank agreement: overlap/tau/rho match a two-ranker driver replay") {
    import spark.implicits._
    val r = Retrieval.rankAgreementQ(spark, sfDir).collect().head
    val q = Set("dup", "vector", "spark")
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(x => (x.getLong(0), x.getString(1).toLowerCase.split(" ")))
    val n = docs.length.toDouble
    val dl = docs.map { case (id, ts) => id -> ts.length.toDouble }.toMap
    val avgdl = dl.values.sum / n
    val tf = docs.flatMap { case (id, ts) =>
      ts.filter(q).groupBy(identity).map { case (t, xs) => (id, t, xs.length) } }
    val df = tf.groupBy(_._2).view.mapValues(_.length).toMap
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val bmScore = tf.groupBy(_._1).view.mapValues(_.map { case (id, t, f) =>
      val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
      r9(idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)))
    }.sum).toMap
    val bmRank = bmScore.toSeq.sortBy { case (id, sc) => (-sc, id) }
      .take(10).zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // QLM
    val cTotal = docs.map(_._2.length.toLong).sum
    val cf = tf.groupBy(_._2).view.mapValues(_.map(_._3.toLong).sum).toMap
    val mu = 500
    val qlScore = docs.map { case (id, ts) =>
      val hits = tf.filter(_._1 == id).map { case (_, t, f) =>
        r9(math.log(1.0 + (f * cTotal) * 1.0 / (mu.toDouble * cf(t)))) }.sum
      id -> (hits - 3 * r9(math.log(ts.length + mu)))
    }.toMap
    val qlRank = qlScore.toSeq.sortBy { case (id, sc) => (-sc, id) }
      .take(10).zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val common = bmRank.keySet.intersect(qlRank.keySet).toSeq.sorted
    assert(r.getAs[Long]("n_common") == common.length)
    assert(r.getAs[Long]("overlap_bp") == 10000L * common.length / 10)
    val pairsSeq = for {
      i <- common.indices; j <- common.indices if common(i) < common(j)
    } yield ((bmRank(common(i)) < bmRank(common(j))) ==
      (qlRank(common(i)) < qlRank(common(j))))
    val tau = (2.0 * pairsSeq.count(identity) - pairsSeq.length) / pairsSeq.length
    val d2 = common.map(id =>
      math.pow(bmRank(id) - qlRank(id), 2)).sum
    val m = common.length
    val rho = 1.0 - 6.0 * d2 / (m.toDouble * (m * m - 1))
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("kendall_tau") - r6(tau)) < 1e-9,
      s"tau ${r.getAs[Double]("kendall_tau")} vs replay $tau")
    assert(math.abs(r.getAs[Double]("spearman_rho") - r6(rho)) < 1e-9)
  }

  test("mcc: confusion cells exact vs f1's; mcc/balanced-acc/youden identities hold") {
    val r = Classify.mccQ(spark, sfDir).collect().head
    val (tp, tn, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("tn"),
      r.getAs[Long]("fp"), r.getAs[Long]("fn"))
    // cells must agree with the f1 query's confusion accounting
    val f1 = Classify.f1Q(spark, sfDir).collect()
    val pos = f1.find(_.getAs[Long]("cls") == 1L).get
    val neg = f1.find(_.getAs[Long]("cls") == 0L).get
    assert(tp == pos.getAs[Long]("tp"))
    assert(tn == neg.getAs[Long]("tp"))
    assert(tp + fn == pos.getAs[Long]("n_true"))
    assert(tn + fp == neg.getAs[Long]("n_true"))
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mcc = (tp.toDouble * tn - fp.toDouble * fn) /
      math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
    val sens = tp.toDouble / (tp + fn); val spec = tn.toDouble / (tn + fp)
    assert(math.abs(r.getAs[Double]("mcc") - r6(mcc)) < 1e-9)
    assert(math.abs(r.getAs[Double]("balanced_acc") - r6((sens + spec) / 2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("youden_j") - r6(sens + spec - 1.0)) < 1e-9)
    // J = 2*BA - 1 identity; both bounded
    assert(math.abs(r.getAs[Double]("youden_j") -
      (2 * r.getAs[Double]("balanced_acc") - 1.0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("mcc")) <= 1.0)
  }

  test("url dedup: canonical groups collapse all four planted spellings; total docs conserved") {
    import spark.implicits._
    val rows = Dedup.urlDedupQ(spark, sfDir).collect()
    assert(rows.length == 20)
    // replay canonicalization in the driver
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"source").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    def canonical(docId: Long, source: String): String = {
      // the plant always canonicalizes to http://<source>.example.com/p/<id%50>?id=7
      s"http://$source.example.com/p/${docId % 50}?id=7"
    }
    val groups = docs.groupBy { case (id, src) => canonical(id, src) }
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val c = r.getAs[String]("canonical")
      assert(groups.contains(c), s"unexpected canonical $c")
      assert(r.getAs[Long]("n_docs") == groups(c))
      // 4 spellings exist whenever the group has docs in all 4 residues
      assert(r.getAs[Long]("n_raw_forms") <= 4)
    }
    // top-20 ordering by doc count desc
    val ns = rows.map(_.getAs[Long]("n_docs"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("fleiss: kappa matches a driver multi-rater replay; designed noise bounds agreement") {
    import spark.implicits._
    val row = Text.fleissQ(spark, sfDir).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val r = 3
    val labels = docs.map { case (id, lang) =>
      (0 until r).map(j =>
        if (h60(s"fk:$j:$id") % 10 == 0) "xx" else lang)
    }
    val n = docs.length
    assert(row.getAs[Long]("n_items") == n)
    val s2 = labels.map(ls =>
      ls.groupBy(identity).values.map(g => g.size.toLong * g.size).sum).sum
    val pBar = (s2.toDouble - n.toDouble * r) / (n.toDouble * r * (r - 1))
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val cj = labels.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val pe = cj.values.map { c =>
      r12((c.toDouble / (n.toLong * r)) * (c.toDouble / (n.toLong * r)))
    }.sum.toDouble
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("p_bar") - r6(pBar)) < 1e-9)
    assert(math.abs(row.getAs[Double]("p_e") - r6(pe)) < 1e-9)
    assert(math.abs(row.getAs[Double]("fleiss_kappa") -
      r6((pBar - pe) / (1.0 - pe))) < 1e-9)
    // designed 10%-noise raters: strong but imperfect agreement
    assert(row.getAs[Double]("fleiss_kappa") > 0.5 &&
      row.getAs[Double]("fleiss_kappa") < 1.0)
  }

  test("turning points: counts match a driver scan; null moments correct") {
    val rows = TimeSeries.turningPointsQ(spark, sfDir).collect()
    val series = denseCounts("hour")
    assert(rows.length == series.size)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val xs = series(r.getAs[String]("event_type"))
      val n = xs.length
      assert(r.getAs[Long]("n") == n)
      val t = (1 until n - 1).count { i =>
        (xs(i) > xs(i - 1) && xs(i) > xs(i + 1)) ||
          (xs(i) < xs(i - 1) && xs(i) < xs(i + 1))
      }
      assert(r.getAs[Long]("n_turning") == t)
      val e = 2.0 * (n - 2) / 3
      assert(math.abs(r.getAs[Double]("expected") - r6(e)) < 1e-9)
      assert(math.abs(r.getAs[Double]("z") -
        r6((t - e) / math.sqrt((16.0 * n - 29) / 90))) < 1e-9)
    }
  }

  test("page-hinkley: alarms match a sequential driver replay of the detector") {
    val rows = TimeSeries.pageHinkleyQ(spark, sfDir).collect()
    val series = denseCounts("hour")
    assert(rows.length == series.size)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val xs = series(r.getAs[String]("event_type"))
      val n = xs.length
      assert(r.getAs[Long]("n") == n)
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val mu = sx.toDouble / n
      val sigma = math.sqrt((sxx.toDouble - sx.toDouble * sx / n) / (n - 1))
      assert(math.abs(r.getAs[Double]("lambda") - r6(3.0 * sigma)) < 1e-9)
      var cum = 0L; var runmin = Double.MaxValue
      var alarms = 0L; var firstIdx = -1; var maxExc = Double.MinValue
      xs.zipWithIndex.foreach { case (x, i) =>
        cum += x
        val ph = cum.toDouble - (i + 1) * (mu + 0.5)
        runmin = math.min(runmin, ph)
        val exc = ph - runmin
        maxExc = math.max(maxExc, exc)
        if (exc > 3.0 * sigma) {
          alarms += 1
          if (firstIdx < 0) firstIdx = i
        }
      }
      assert(r.getAs[Long]("n_alarm_hours") == alarms,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Long]("n_alarm_hours")} vs $alarms")
      assert(math.abs(r.getAs[Double]("max_excursion") - r6(maxExc)) < 1e-9)
      val fa = r.getAs[java.sql.Timestamp]("first_alarm")
      if (firstIdx < 0) assert(fa == null)
      else {
        val start = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        assert(fa.getTime == start + firstIdx.toLong * 3600000L)
      }
    }
  }

  test("dtw: wavefront fold equals the classical sequential DP; no-warp bound holds") {
    val rows = TimeSeries.dtwQ(spark, sfDir).collect()
    val series = denseCounts("day")
    assert(rows.length == series.size - 1)
    def dtwSeq(a: Array[Long], b: Array[Long]): Long = {
      val n = a.length; val m = b.length
      val dp = Array.fill(n, m)(0L)
      for (i <- 0 until n; j <- 0 until m) {
        val c = math.abs(a(i) - b(j))
        dp(i)(j) = c + ((i, j) match {
          case (0, 0) => 0L
          case (0, _) => dp(0)(j - 1)
          case (_, 0) => dp(i - 1)(0)
          case _ => math.min(dp(i - 1)(j),
            math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        })
      }
      dp(n - 1)(m - 1)
    }
    rows.foreach { r =>
      val a = series(r.getAs[String]("type_a"))
      val b = series(r.getAs[String]("type_b"))
      val exp = dtwSeq(a, b)
      assert(r.getAs[Long]("dtw") == exp,
        s"${r.getAs[String]("type_a")}/${r.getAs[String]("type_b")}: " +
          s"wavefront ${r.getAs[Long]("dtw")} vs sequential $exp")
      // the diagonal (no-warp) path upper-bounds DTW
      val noWarp = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(r.getAs[Long]("dtw") <= noWarp)
    }
  }

  test("dtw band: banded wavefront equals a banded sequential DP; band >= full") {
    val rows = TimeSeries.dtwBandQ(spark, sfDir).collect()
    val series = denseCounts("day")
    assert(rows.length == series.size - 1)
    val big = Long.MaxValue / 4
    def dtwBandSeq(a: Array[Long], b: Array[Long], r: Int): Long = {
      val n = a.length; val m = b.length
      val dp = Array.fill(n, m)(big)
      for (i <- 0 until n; j <- 0 until m if math.abs(i - j) <= r) {
        val c = math.abs(a(i) - b(j))
        def at(x: Int, y: Int): Long =
          if (x < 0 || y < 0 || math.abs(x - y) > r) big else dp(x)(y)
        dp(i)(j) = c + ((i, j) match {
          case (0, 0) => 0L
          case _ => math.min(at(i - 1, j), math.min(at(i, j - 1), at(i - 1, j - 1)))
        })
      }
      dp(n - 1)(m - 1)
    }
    rows.foreach { r =>
      val a = series(r.getAs[String]("type_a"))
      val b = series(r.getAs[String]("type_b"))
      assert(r.getAs[Long]("radius") == 3)
      val expBand = dtwBandSeq(a, b, 3)
      val expFull = dtwBandSeq(a, b, a.length)
      assert(r.getAs[Long]("dtw_band") == expBand,
        s"band ${r.getAs[Long]("dtw_band")} vs sequential $expBand")
      assert(r.getAs[Long]("dtw_full") == expFull)
      assert(r.getAs[Long]("band_gap") >= 0, "restricting paths cannot lower DTW")
      assert(r.getAs[Long]("band_gap") == expBand - expFull)
    }
  }

  test("walsh: integer coefficients match a driver popcount replay; entropy in [0, 1]") {
    val rows = TimeSeries.walshQ(spark, sfDir).collect()
    val series = denseCounts("hour")
    assert(rows.length == series.size)
    def r12(d: Double) = BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val xs = series(r.getAs[String]("event_type")).take(512)
      val pw = (1 until 64).map { j =>
        val wj = xs.zipWithIndex.map { case (x, t) =>
          if (java.lang.Long.bitCount(j & t) % 2 == 0) x else -x
        }.sum
        j -> wj * wj
      }
      val ptot = pw.map(_._2).sum
      assert(r.getAs[Long]("total_power") == ptot)
      val (dj, dp) = pw.sortBy { case (j, p) => (-p, j) }.head
      assert(r.getAs[Long]("dominant_j") == dj)
      assert(r.getAs[Long]("dominant_power") == dp)
      val h = pw.filter(_._2 > 0).map { case (_, p) =>
        val pn = p.toDouble / ptot
        r12(-pn * math.log(pn))
      }.sum.toDouble / math.log(63.0)
      assert(math.abs(r.getAs[Double]("spectral_entropy") -
        r6(h * math.log(63.0) / math.log(63.0))) < 1e-6)
      val se = r.getAs[Double]("spectral_entropy")
      assert(se >= 0.0 && se <= 1.0 + 1e-9)
    }
  }

  test("dice: association scores match a driver bigram recount; identities hold") {
    import spark.implicits._
    val rows = Colloc.diceQ(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val toks = graft.Tables.t(spark, sfDir, "documents")
      .select($"text").collect()
      .map(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // recompute pairs exactly as the query does: adjacent in the raw
    // split (empty tokens keep positions apart), both sides non-empty
    val raw = graft.Tables.t(spark, sfDir, "documents")
      .select($"text").collect().map(_.getString(0).toLowerCase.split(" ", -1))
    val pairCounts = raw.flatMap(ws => ws.sliding(2).filter(p =>
        p.length == 2 && p(0).nonEmpty && p(1).nonEmpty)
      .map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c12 = pairCounts((w1, w2)); val c1 = uni(w1); val c2 = uni(w2)
      assert(r.getAs[Long]("c12") == c12 && r.getAs[Long]("c1") == c1 &&
        r.getAs[Long]("c2") == c2)
      assert(math.abs(r.getAs[Double]("dice") -
        r6(2.0 * c12 / (c1 + c2).toDouble)) < 1e-9)
      assert(math.abs(r.getAs[Double]("jaccard") -
        r6(c12.toDouble / (c1 + c2 - c12).toDouble)) < 1e-9)
      assert(math.abs(r.getAs[Double]("ochiai") -
        r6(c12.toDouble / math.sqrt(c1.toDouble * c2.toDouble))) < 1e-9)
      // dice <= 2*jaccard/(1+jaccard) identity: dice = 2j/(1+j) exactly
      val j = c12.toDouble / (c1 + c2 - c12).toDouble
      assert(math.abs(2 * j / (1 + j) - 2.0 * c12 / (c1 + c2).toDouble) < 1e-12)
    }
    // top-20 really is by count: descending
    val cs = rows.map(_.getAs[Long]("c12"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("yule: K/D/C match a driver token recount per source") {
    import spark.implicits._
    val rows = Text.yuleQ(spark, sfDir).collect()
    val bySource = graft.Tables.t(spark, sfDir, "documents")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    assert(rows.map(_.getAs[String]("source")).toSet == bySource.keySet)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val texts = bySource(r.getAs[String]("source")).map(_._2)
      val counts = texts.flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.length.toLong).values.toSeq
      val n = counts.sum; val v = counts.length.toLong
      assert(r.getAs[Long]("n_tokens") == n && r.getAs[Long]("n_types") == v)
      val m2 = counts.map(c => c * c).sum
      val rep = counts.map(c => c * (c - 1)).sum
      assert(math.abs(r.getAs[Double]("yule_k") -
        r6(10000.0 * (m2 - n).toDouble / (n.toDouble * n.toDouble))) < 1e-9)
      assert(math.abs(r.getAs[Double]("simpson_d") -
        r6(rep.toDouble / (n.toDouble * (n - 1).toDouble))) < 1e-9)
      assert(math.abs(r.getAs[Double]("herdan_c") -
        r6(math.log(v.toDouble) / math.log(n.toDouble))) < 1e-9)
      assert(r.getAs[Double]("herdan_c") < 1.0, "V < N always")
    }
  }

  test("range bounds: boundaries are sample order statistics; partitions cover all rows; shares roughly balanced") {
    import spark.implicits._
    val rows = Shard.rangeBoundsQ(spark, sfDir).collect()
    assert(rows.length == 8, "all 8 partitions non-empty at sf0.001+")
    val orders = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2)))
    assert(rows.map(_.getAs[Long]("n_rows")).sum == orders.length)
    // replay the sample + order statistics
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val sample = orders.filter { case (k, _) => h60(s"rb:$k") % 16 == 0 }
      .sortBy { case (k, p) => (p, k) }
    val ns = sample.length
    val bnds = (1 until 8).map(i => sample(ns * i / 8 - 1)._2)
    // per-row assignment replay
    val pids = orders.map { case (_, p) => bnds.count(b => p > b) }
    val byPid = pids.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == byPid(r.getAs[Int]("pid")))
    }
    // sampling-theory promise: each partition within 3x of fair share
    rows.foreach { r =>
      val bp = r.getAs[Long]("share_bp")
      assert(bp > 1250 / 3 && bp < 1250 * 3, s"pid ${r.getAs[Int]("pid")}: $bp bp")
    }
  }

  test("durbin-watson: OLS residual replay matches; statistic inside (0, 4)") {
    import spark.implicits._
    val r = TimeSeries.dwQ(spark, sfDir).collect().head
    val days = graft.Tables.t(spark, sfDir, "orders")
      .select(date_trunc("day", $"o_orderdate").as("d")).collect()
      .map(_.getTimestamp(0).getTime)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy(_._1).map(_._2).toArray
    val n = days.length
    assert(r.getAs[Long]("n_days") == n)
    var st = 0L; var sy = 0L; var stt = 0L; var sty = 0L
    for (i <- 0 until n) {
      val t = i + 1L; val y = days(i)
      st += t; sy += y; stt += t * t; sty += t * y
    }
    val slope = (n * sty - st * sy).toDouble / (n * stt - st * st).toDouble
    val icept = sy.toDouble / n - slope * st.toDouble / n
    val e = (0 until n).map(i => days(i).toDouble - (icept + slope * (i + 1)))
    def r10(d: Double) = BigDecimal(d).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val den = e.map(x => r10(x * x)).sum.toDouble
    val num = (1 until n).map(i => r10((e(i) - e(i - 1)) * (e(i) - e(i - 1)))).sum.toDouble
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("slope") -
      BigDecimal(slope).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(math.abs(r.getAs[Double]("dw") - r6(num / den)) < 1e-9)
    assert(r.getAs[Double]("dw") > 0.0 && r.getAs[Double]("dw") < 4.0)
  }

  test("auc: rank-statistic AUC equals a naive pairwise scan; gini identity holds") {
    import spark.implicits._
    val r = Classify.aucQ(spark, sfDir).collect().head
    // driver recompute: score every doc the same way, then the O(n1*n0)
    // definition AUC = P(score_pos > score_neg) + 0.5 P(tie)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % 1024
    }
    val scores = docs.map { case (id, text, lang) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val sw = toks.map(t => (bucket(t) * 2654435761L) % 2001L - 1000L).sum
      val score = BigDecimal(sw.toDouble / (toks.length * 1000.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (score, lang == "en")
    }
    val pos = scores.filter(_._2).map(_._1)
    val neg = scores.filterNot(_._2).map(_._1)
    assert(r.getAs[Long]("n_pos") == pos.length)
    assert(r.getAs[Long]("n_neg") == neg.length)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val auc = num / (pos.length.toLong * neg.length)
    assert(math.abs(r.getAs[Double]("auc") - auc) < 1e-5, s"auc vs $auc")
    assert(math.abs(r.getAs[Double]("gini") -
      (2 * r.getAs[Double]("auc") - 1)) < 1e-5)
  }

  test("rec coverage: audit matches a driver top-k replay; gini and coverage bounded") {
    import spark.implicits._
    val r = Affinity.recCoverageQ(spark, sfDir).collect().head
    val baskets = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val nB = baskets.groupBy(_._2).view.mapValues(_.length).toMap
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val co = byOrder.values.toSeq
      .flatMap(bs => for (a <- bs; b <- bs if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size).toMap
    def cos(a: String, b: String): BigDecimal =
      co.get((a, b)).map(c => BigDecimal(
        c / math.sqrt(nB(a).toDouble * nB(b).toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).getOrElse(BigDecimal(0))
    val srcs = co.keys.map(_._1).toSeq.distinct
    val lists = srcs.map { s =>
      s -> co.keys.filter(_._1 == s).map(_._2).toSeq
        .sortBy(d => (-cos(s, d), d)).take(5)
    }.toMap
    val allBrands = graft.Tables.t(spark, sfDir, "part")
      .select($"p_brand").distinct().collect().map(_.getString(0))
    val exposure = allBrands.map(b =>
      b -> lists.values.map(_.count(_ == b)).sum).toMap
    val n = allBrands.length
    assert(r.getAs[Long]("n_items") == n)
    assert(r.getAs[Long]("n_lists") == lists.size)
    val covered = exposure.count(_._2 > 0)
    assert(math.abs(r.getAs[Double]("catalog_coverage") -
      covered.toDouble / n) < 1e-6)
    val xs = exposure.toSeq.sortBy { case (b, x) => (x, b) }.map(_._2)
    val sx = xs.map(_.toLong).sum
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val gini = (2.0 * six - (n + 1).toDouble * sx) / (n.toDouble * sx)
    assert(math.abs(r.getAs[Double]("exposure_gini") - gini) < 1e-6)
    assert(r.getAs[Double]("exposure_gini") >= 0 &&
      r.getAs[Double]("exposure_gini") <= 1)
    val pairCos = lists.values.toSeq.flatMap { l =>
      for (i <- l.indices; j <- l.indices if l(i) < l(j)) yield cos(l(i), l(j))
    }
    assert(math.abs(r.getAs[Double]("mean_intralist_cos") -
      (pairCos.sum / pairCos.length).toDouble) < 1e-5)
  }

  test("stickiness: DAU/WAU/MAU averages match a driver recompute and obey containment bounds") {
    import spark.implicits._
    val rows = Behavior.stickinessQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"user_id", to_date($"ts").as("d"),
        weekofyear($"ts").as("w"), year($"ts").as("y"),
        date_trunc("month", $"ts").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDate(2), (r.getInt(4), r.getInt(3)), r.getTimestamp(5)))
    val byType = ev.groupBy(_._1)
    rows.foreach { r =>
      val ty = r.getAs[String]("event_type")
      val g = byType(ty)
      val dau = g.groupBy(_._3).values.map(_.map(_._2).distinct.size)
      val wau = g.groupBy(_._4).values.map(_.map(_._2).distinct.size)
      val mau = g.groupBy(_._5).values.map(_.map(_._2).distinct.size)
      assert(r.getAs[Long]("n_days") == dau.size)
      assert(r.getAs[Long]("n_weeks") == wau.size)
      assert(r.getAs[Long]("n_months") == mau.size)
      val aDau = dau.sum.toDouble / dau.size
      val aWau = wau.sum.toDouble / wau.size
      val aMau = mau.sum.toDouble / mau.size
      assert(math.abs(r.getAs[Double]("avg_dau") - aDau) < 1e-5)
      assert(math.abs(r.getAs[Double]("avg_wau") - aWau) < 1e-5)
      assert(math.abs(r.getAs[Double]("avg_mau") - aMau) < 1e-5)
      assert(math.abs(r.getAs[Double]("stickiness") - aDau / aMau) < 1e-5)
      // containment: a day's actives are a subset of the month's
      assert(aDau <= aWau + 1e-9 && aWau <= aMau + 1e-9)
      assert(r.getAs[Double]("stickiness") > 0 &&
        r.getAs[Double]("stickiness") <= 1.0 + 1e-9)
    }
  }

  test("association rules: metrics match a driver recompute; conviction guarded at confidence 1") {
    import spark.implicits._
    val rows = Affinity.rulesQ(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val baskets = graft.Tables.t(spark, sfDir, "lineitem")
      .join(graft.Tables.t(spark, sfDir, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nTot = baskets.map(_._1).distinct.length
    val nB = baskets.groupBy(_._2).view.mapValues(_.length).toMap
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val coCounts = byOrder.values.toSeq
      .flatMap(bs => for (a <- bs; b <- bs if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size).toMap
    // lifts are sorted descending (the declared order)
    val lifts = rows.map(_.getAs[Double]("lift")).toSeq
    assert(lifts == lifts.sorted.reverse)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("ante"), r.getAs[String]("cons"))
      val co = coCounts((a, b))
      assert(co >= 20 && r.getAs[Long]("n_both") == co)
      val conf = co.toDouble / nB(a)
      assert(math.abs(r.getAs[Double]("support") - co.toDouble / nTot) < 1e-5)
      assert(math.abs(r.getAs[Double]("confidence") - conf) < 1e-5)
      assert(math.abs(r.getAs[Double]("lift") -
        conf / (nB(b).toDouble / nTot)) < 1e-5)
      if (co < nB(a))
        assert(math.abs(r.getAs[Double]("conviction") -
          (1 - nB(b).toDouble / nTot) / (1 - conf)) < 1e-4)
      else assert(r.isNullAt(r.fieldIndex("conviction")))
    }
  }

  test("groupfold: folds partition users, counts match a driver replay, zero leaky users") {
    import spark.implicits._
    val rows = Text.groupFoldQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("fold")).toSet == (0L to 4L).toSet)
    rows.foreach(r => assert(r.getAs[Long]("leaky_users") == 0))
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fold(uid: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16) % 5
    }
    val byFold = ev.groupBy(e => fold(e._1))
    val nTotal = ev.length
    rows.foreach { r =>
      val f = r.getAs[Long]("fold")
      val g = byFold(f)
      assert(r.getAs[Long]("n_events") == g.length, s"fold $f events")
      assert(r.getAs[Long]("n_users") == g.map(_._1).distinct.length)
      assert(math.abs(r.getAs[Double]("event_share") -
        g.length.toDouble / nTotal) < 1e-5)
      assert(math.abs(r.getAs[Double]("purchase_rate") -
        g.count(_._2 == "purchase").toDouble / g.length) < 1e-5)
    }
    // grouped assignment means a user's fold is a function of the user
    assert(ev.map(_._1).distinct.forall(u => byFold(fold(u)).exists(_._1 == u)))
  }

  test("brier: Murphy decomposition matches a driver recompute and the binned identity holds") {
    val r = Classify.brierQ(spark, sfDir).collect().head
    // identity: brier_binned = REL - RES + UNC (assembled in-query; here
    // re-asserted from the reported components)
    assert(math.abs(r.getAs[Double]("brier_binned") -
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution")
        + r.getAs[Double]("uncertainty"))) < 2e-6)
    // driver recompute from the scored frame (same (score, y) contract)
    val sc = Classify.scored(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("score"),
        org.apache.spark.sql.functions.col("y"))
      .collect().map(x => (x.getDouble(0), x.getLong(1)))
    val n = sc.length
    val base = sc.map(_._2).sum.toDouble / n
    val ps = sc.map { case (score, y) => ((score + 1) / 2, y) }
    val raw = ps.map { case (p, y) => (p - y) * (p - y) }.sum / n
    val bins = ps.groupBy { case (p, _) => math.min((p * 10).toInt, 9) }
    val rel = bins.values.map { g =>
      val pb = g.map(_._1).sum / g.length
      val ob = g.map(_._2).sum.toDouble / g.length
      g.length * (pb - ob) * (pb - ob) }.sum / n
    val res = bins.values.map { g =>
      val ob = g.map(_._2).sum.toDouble / g.length
      g.length * (ob - base) * (ob - base) }.sum / n
    assert(r.getAs[Long]("n") == n)
    assert(math.abs(r.getAs[Double]("base_rate") - base) < 1e-5)
    assert(math.abs(r.getAs[Double]("brier_raw") - raw) < 1e-5)
    assert(math.abs(r.getAs[Double]("reliability") - rel) < 1e-5)
    assert(math.abs(r.getAs[Double]("resolution") - res) < 1e-5)
    assert(math.abs(r.getAs[Double]("uncertainty") - base * (1 - base)) < 1e-5)
    // the binned Brier differs from raw only by the within-bin variance,
    // which is nonnegative: brier_raw >= brier_binned
    assert(r.getAs[Double]("brier_raw") >= r.getAs[Double]("brier_binned") - 1e-6)
  }

  test("calibration: bins partition the corpus, gaps are consistent, ECE is bounded") {
    val rows = Classify.calibrationQ(spark, sfDir).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    val docs = graft.Tables.t(spark, sfDir, "documents").count()
    assert(n == docs, "bins must partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") <= 9)
      assert(r.getAs[Double]("mean_p") >= 0 && r.getAs[Double]("mean_p") <= 1)
      assert(math.abs(r.getAs[Double]("gap") -
        (r.getAs[Double]("frac_pos") - r.getAs[Double]("mean_p"))) < 2e-6)
    }
    val ece = rows.map(r =>
      r.getAs[Long]("n").toDouble / n * math.abs(r.getAs[Double]("gap"))).sum
    assert(ece >= 0 && ece <= 1, s"ECE $ece out of range")
  }

  test("grid dbscan: clusters equal a driver union-find over dense cells; noise points excluded") {
    import spark.implicits._
    val rows = Spatial.dbscanQ(spark, sfDir).collect()
    // driver recompute: positions from the SAME md5 contract
    val pts = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_custkey".as("id"))
      .withColumn("xi", graft.ops.Hashing.md5Long60(
        concat($"id".cast("string"), lit(":x"))) % 9000)
      .withColumn("yi", graft.ops.Hashing.md5Long60(
        concat($"id".cast("string"), lit(":y"))) % 9000)
      .collect().map(r => (r.getLong(1) / 100, r.getLong(2) / 100))
    val cellN = pts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dense = cellN.filter(_._2 >= 2).keys.toSet
    // union-find over 8-neighborhood of dense cells
    val parent = scala.collection.mutable.Map[Long, Long]()
    def cid(c: (Long, Long)) = c._1 * 90 + c._2
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (c <- dense; dx <- -1 to 1; dy <- -1 to 1 if (dx, dy) != ((0, 0))) {
      val nb = (c._1 + dx, c._2 + dy)
      if (dense(nb)) union(cid(c), cid(nb))
    }
    val expected = dense.groupBy(c => find(cid(c))).map { case (root, cs) =>
      root -> (cs.size.toLong, cs.toSeq.map(cellN).sum)
    }
    assert(rows.length == expected.size,
      s"${rows.length} clusters vs ${expected.size}")
    rows.foreach { r =>
      val (nc, np) = expected(r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("n_cells") == nc)
      assert(r.getAs[Long]("n_points") == np)
    }
    // noise accounting: clustered points + sparse-cell points = corpus
    val clustered = rows.map(_.getAs[Long]("n_points")).sum
    val noise = cellN.filter(_._2 < 2).values.sum
    assert(clustered + noise == pts.length)
  }

  test("kneser-ney: probabilities match a driver recompute and sum to 1 over the full event space") {
    import spark.implicits._
    val rows = Colloc.kneserNeyQ(spark, sfDir).collect()
    assert(rows.length == 20)
    // recompute all bigram counts on the driver
    val bigrams = graft.Tables.t(spark, sfDir, "documents")
      .select($"text").collect().map(_.getString(0))
      .flatMap { txt =>
        val t = txt.toLowerCase.split(" ")
        t.zip(t.tail).filter { case (a, b) => a.nonEmpty && b.nonEmpty }
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cCtx = bigrams.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nFwd = bigrams.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nBack = bigrams.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nTypes = bigrams.size.toLong
    val d = 0.75
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(r.getAs[Long]("c12") == bigrams((w1, w2)))
      assert(r.getAs[Long]("c_ctx") == cCtx(w1))
      assert(r.getAs[Long]("n_fwd") == nFwd(w1))
      assert(r.getAs[Long]("n_back") == nBack(w2))
      val p = (bigrams((w1, w2)) - d) / cCtx(w1) +
        d * nFwd(w1) / cCtx(w1) * (nBack(w2).toDouble / nTypes)
      assert(math.abs(r.getAs[Double]("p_kn") - p) < 1e-5, s"($w1,$w2)")
      assert(p > 0 && p < 1)
    }
    // mass conservation: for one context, discounted mass + backoff = 1
    // over the FULL vocabulary (sum of P_cont over all w2 is 1 exactly)
    val w1 = rows.head.getAs[String]("w1")
    val obs = bigrams.collect { case ((a, b), c) if a == w1 => (b, c) }
    val direct = obs.map { case (_, c) => (c - d) / cCtx(w1) }.sum
    val lambda = d * nFwd(w1) / cCtx(w1)
    assert(math.abs(direct + lambda - 1.0) < 1e-9,
      s"discount identity: $direct + $lambda")
  }

  test("f1: confusion counts match a driver rescore; F1 and macro identities hold") {
    import spark.implicits._
    val rows = Classify.f1Q(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cls") -> r).toMap
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang").collect()
      .map(x => (x.getString(1), x.getString(2)))
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % 1024
    }
    val preds = docs.map { case (text, lang) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val sw = toks.map(t => (bucket(t) * 2654435761L) % 2001L - 1000L).sum
      val score = BigDecimal(sw.toDouble / (toks.length * 1000.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (if (lang == "en") 1L else 0L, if (score > 0) 1L else 0L)
    }
    for (c <- Seq(0L, 1L)) {
      val r = rows(c)
      val nTrue = preds.count(_._1 == c).toLong
      val nPred = preds.count(_._2 == c).toLong
      val tp = preds.count(p => p._1 == c && p._2 == c).toLong
      assert(r.getAs[Long]("n_true") == nTrue, s"class $c support")
      assert(r.getAs[Long]("n_pred") == nPred, s"class $c predicted")
      assert(r.getAs[Long]("tp") == tp, s"class $c tp")
      assert(math.abs(r.getAs[Double]("f1") -
        2.0 * tp / (nPred + nTrue)) < 1e-6, s"class $c f1 identity")
    }
    val macroF1 = (rows(0L).getAs[Double]("f1") +
      rows(1L).getAs[Double]("f1")) / 2
    assert(math.abs(rows(-1L).getAs[Double]("f1") - macroF1) < 2e-6,
      "macro row averages the per-class F1s")
    assert(rows(-1L).getAs[Long]("tp") ==
      rows(0L).getAs[Long]("tp") + rows(1L).getAs[Long]("tp"))
  }

  test("moments: one-pass skewness/kurtosis match a two-pass central-moment recompute") {
    import spark.implicits._
    val rows = Profile.momentsQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val qs = graft.Tables.t(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_quantity").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    qs.groupBy(_._1).foreach { case (flag, xs) =>
      val v = xs.map(_._2)
      val n = v.length.toDouble
      val mean = v.sum / n
      def cm(k: Int) = v.map(x => math.pow(x - mean, k)).sum / n
      val (m2, m3, m4) = (cm(2), cm(3), cm(4))
      val r = rows(flag)
      assert(r.getAs[Long]("n") == v.length)
      assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-5, s"$flag mean")
      assert(math.abs(r.getAs[Double]("stddev") - math.sqrt(m2)) < 1e-5)
      assert(math.abs(r.getAs[Double]("skewness") -
        m3 / math.pow(m2, 1.5)) < 1e-4, s"$flag skew")
      assert(math.abs(r.getAs[Double]("kurtosis_excess") -
        (m4 / (m2 * m2) - 3)) < 1e-4, s"$flag kurtosis")
    }
  }

  test("rank fusion: rrf equals the two-term reciprocal identity and respects both legs") {
    import spark.implicits._
    val rows = Text.rankFusionQ(spark, sfDir).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val lx = r.getAs[Int]("lex_rank"); val sm = r.getAs[Int]("sem_rank")
      assert(lx >= 0 && lx <= 20 && sm >= 0 && sm <= 20)
      assert(lx > 0 || sm > 0, "a fused doc must appear in some leg")
      val exp = (if (lx > 0) 1.0 / (60 + lx) else 0.0) +
        (if (sm > 0) 1.0 / (60 + sm) else 0.0)
      assert(math.abs(r.getAs[Double]("rrf") - exp) < 1e-6, "rrf identity")
    }
    // fused order is non-increasing in rrf with doc_id tiebreaks
    val byRank = rows.sortBy(_.getAs[Int]("fused_rank"))
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (ra, rb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
      assert(ra > rb || (ra == rb &&
        a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    case _ => ()
    }
    // a doc ranked #1 in BOTH legs would dominate: verify the top fused
    // doc has the best attainable rrf among emitted rows
    assert(byRank.head.getAs[Double]("rrf") ==
      rows.map(_.getAs[Double]("rrf")).max)
  }

  test("secrets: planted keys detected, entropy gate passes md5 tokens and rejects the decoy") {
    val rows = Pii.secretsQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_keys") == 1, s"doc $id planted key count")
      // candidates: key (always) + tok_ (id%4==0) + decoy (id%5==0)
      val expCand = 1 + (if (id % 4 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
      assert(r.getAs[Int]("n_candidates") == expCand, s"doc $id candidates")
      // driver entropy recompute under the 9-dp decimal contract; the
      // 24x'a' decoy has zero entropy and must NEVER count (borderline
      // md5 keys legitimately fall either side of 3.0 — doc 29's key
      // is 2.9709 bits, and both engines agree)
      def h(tok: String): BigDecimal = {
        val L = tok.length
        tok.groupBy(identity).values.map { g =>
          val p = g.length.toDouble / L
          BigDecimal(-p * math.log(p) / math.log(2))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum
      }
      def md5hex(x: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val toks = Seq("AKIA" + md5hex(id.toString).take(16).toUpperCase) ++
        (if (id % 4 == 0) Seq("tok_" + md5hex(id.toString + "t")) else Nil) ++
        (if (id % 5 == 0) Seq("a" * 24) else Nil)
      val expHigh = toks.count(h(_) >= BigDecimal(3.0))
      assert(r.getAs[Int]("n_high_entropy") == expHigh,
        s"doc $id entropy gate")
      if (id % 5 == 0)
        assert(h("a" * 24) == BigDecimal(0), "decoy entropy is zero")
      val red = r.getAs[String]("redacted")
      assert(red.contains("[KEY]") && !red.matches(".*AKIA[0-9A-F]{16}.*"),
        s"doc $id key redacted")
      if (id % 4 == 0) assert(red.contains("[TOKEN]"), s"doc $id token redacted")
      if (id % 5 == 0) assert(red.contains("aaaaaaaaaaaaaaaaaaaaaaaa"),
        s"doc $id decoy survives redaction")
    }
  }

  test("ts backtest: fold errors equal a sequential driver replay; skill is the mae ratio") {
    import spark.implicits._
    val rows = TimeSeries.backtestQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = graft.Tables.t(spark, sfDir, "events")
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date](1),
        r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, xs) =>
      val series = xs.sortBy(_._2.toString).map(_._3.toDouble)
      if (series.length >= 3) {
        var s0 = series.head; var prev = series.head
        var (saeN, saeS, smN, smS) = (0.0, 0.0, 0.0, 0.0)
        series.tail.foreach { x =>
          saeN += math.abs(x - prev); saeS += math.abs(x - s0)
          smN += 2 * math.abs(x - prev) / (math.abs(x) + math.abs(prev))
          smS += 2 * math.abs(x - s0) / (math.abs(x) + math.abs(s0))
          s0 = 0.5 * x + 0.5 * s0; prev = x
        }
        val n1 = series.length - 1
        val r = rows(et)
        assert(r.getAs[Long]("n_days") == series.length)
        assert(math.abs(r.getAs[Double]("mae_naive") - saeN / n1) < 1e-6)
        assert(math.abs(r.getAs[Double]("mae_ses") - saeS / n1) < 1e-6)
        assert(math.abs(r.getAs[Double]("smape_naive") - smN / n1) < 1e-6)
        assert(math.abs(r.getAs[Double]("smape_ses") - smS / n1) < 1e-6)
        assert(math.abs(r.getAs[Double]("skill") - saeS / saeN) < 1e-6)
      }
    }
  }

  test("funnel latency: per-hour percentiles equal a driver interval-join replay") {
    import spark.implicits._
    val got = Behavior.funnelLatencyQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("h") -> r).toMap
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val views = ev.filter(_._2 == "view")
    val purch = ev.filter(_._2 == "purchase").groupBy(_._1)
    val lats = views.flatMap { case (u, _, _, vus) =>
      val firsts = purch.getOrElse(u, Array.empty[(Long, String, Long, Long)])
        .map(_._4).filter(p => p >= vus && p <= vus + 3600000000L)
      if (firsts.isEmpty) None
      else Some(((vus / 3600000000L) % 24, (firsts.min - vus) / 1000000L))
    }
    val viewsPerH = views.groupBy(v => (v._4 / 3600000000L) % 24)
      .map { case (h, vs) => h -> vs.length.toLong }
    lats.groupBy(_._1).foreach { case (h, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      val r = got(h)
      assert(r.getAs[Long]("n_conv") == n, s"hour $h conversions")
      assert(r.getAs[Long]("n_views") == viewsPerH(h), s"hour $h views")
      assert(r.getAs[Long]("cr_bp") == 10000L * n / viewsPerH(h))
      assert(r.getAs[Long]("p50_s") == sorted((50 * n + 99) / 100 - 1), s"hour $h p50")
      assert(r.getAs[Long]("p90_s") == sorted((90 * n + 99) / 100 - 1), s"hour $h p90")
      assert(math.abs(r.getAs[Double]("mean_s") -
        sorted.sum.toDouble / n) < 1e-6, s"hour $h mean")
    }
  }

  test("bpe encode: baseline equals chars+1 per word; each merge saves at most its pair count") {
    import spark.implicits._
    val rows = Text.bpeEncodeQ(spark, sfDir).collect()
      .map(r => r.getAs[Long]("round") ->
        (r.getAs[Long]("total_syms"), r.getAs[Long]("saved_bp"))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    // round 0 = sum over word occurrences of (chars + </w>)
    val words = graft.Tables.t(spark, sfDir, "documents")
      .select(explode(split(lower($"text"), " ")).as("w"))
      .filter($"w".rlike("^[a-z]+$"))
      .collect().map(_.getString(0))
    val expT0 = words.map(_.length.toLong + 1).sum
    assert(rows(0L)._1 == expT0, "baseline symbol count")
    // totals strictly decrease (every learned merge fires somewhere)
    // and each round's saving is bounded by that merge's pair count
    val pairCounts = Text.bpeTrainQ(spark, sfDir).collect()
      .map(r => r.getAs[Int]("round").toLong -> r.getAs[Long]("pair_count"))
      .toMap
    for (r <- 1L to 3L) {
      val saved = rows(r - 1)._1 - rows(r)._1
      assert(saved > 0, s"round $r must reduce symbols")
      assert(saved <= pairCounts(r),
        s"round $r saving $saved exceeds pair count ${pairCounts(r)}")
      assert(rows(r)._2 == 10000L * (expT0 - rows(r)._1) / expT0,
        s"round $r saved_bp identity")
    }
  }

  test("argmax surface: max_by/min_by tie-proof keys match a driver scan; boolean aggs hold") {
    import spark.implicits._
    val rows = graft.queries.Relational.aggArgmax(spark, sfDir).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val os = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
        $"o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2) * 100), r.getString(3)))
    os.groupBy(_._1).foreach { case (prio, xs) =>
      val r = rows(prio)
      val byKey = xs.sortBy { case (_, k, c, _) => (c, k) }
      assert(r.getAs[Long]("priciest_order") == byKey.last._2, s"$prio argmax")
      assert(r.getAs[Long]("cheapest_order") == byKey.head._2, s"$prio argmin")
      assert(r.getAs[Long]("max_price_cents") == xs.map(_._3).max)
      assert(r.getAs[Long]("n_big") == xs.count(_._3 > 10000000L).toLong)
      assert(r.getAs[Int]("all_positive") == (if (xs.forall(_._3 > 0)) 1 else 0))
      assert(r.getAs[Int]("any_finished") ==
        (if (xs.exists(_._4 == "F")) 1 else 0))
    }
  }

  test("randomized response: mechanism replays exactly; debiased estimates sum to n") {
    import spark.implicits._
    val rows = Pii.rrQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val types = ev.map(_._2).distinct.sorted
    val ti = types.zipWithIndex.toMap
    def md5mod(x: String, m: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % m
    }
    val reported = ev.map { case (id, et) =>
      val r = md5mod(s"$id:rr", 16)
      val t0 = ti(et)
      val rep = if (r < 12) t0
        else if (r - 12 < t0) (r - 12).toInt else (r - 12).toInt + 1
      types(rep)
    }
    val f = reported.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = ev.length.toLong
    var estSum = 0.0
    types.foreach { et =>
      val r = rows(et)
      assert(r.getAs[Long]("n_reported") == f(et), s"$et reported count")
      assert(r.getAs[Long]("n_true") == ev.count(_._2 == et).toLong)
      val est = (16.0 * f(et) - n) / 11
      assert(math.abs(r.getAs[Double]("est") - est) < 1e-6, s"$et debias")
      estSum += est
    }
    assert(f.values.sum == n, "reports partition the events")
    assert(math.abs(estSum - n) < 1e-6,
      "debiased estimates sum to n (the mechanism's mass identity)")
  }

  test("join size est: estimate bounds exact F2 from above and matches a driver CMS recompute") {
    import spark.implicits._
    val rows = Sketches.joinSizeEstQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("keyspace") -> r).toMap
    assert(rows.keySet == Set("events.user_id", "lineitem.l_partkey"))
    def md5mod(x: String, m: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % m
    }
    def check(keyspace: String, keys: Array[String]): Unit = {
      val r = rows(keyspace)
      val exact = keys.groupBy(identity).values
        .map(g => g.length.toLong * g.length).sum
      assert(r.getAs[Long]("n_rows") == keys.length, s"$keyspace rows")
      // F2 columns leave as correctly-rounded doubles since r14 (F2 <=
      // N^2 fits no 64-bit integer at the design scale); exact here
      assert(r.getAs[Double]("exact_f2") == exact.toDouble,
        s"$keyspace exact F2")
      // driver CMS: d=4 rows of w=1024 cells, est = min over rows of sum c^2
      val est = (0 until 4).map { rr =>
        keys.groupBy(k => md5mod(s"$k:$rr", 1024L)).values
          .map(g => g.length.toLong * g.length).sum
      }.min
      assert(r.getAs[Double]("est_f2") == est.toDouble,
        s"$keyspace estimate")
      assert(est >= exact, "collisions can only inflate F2")
      assert(r.getAs[Double]("excess") == (est - exact).toDouble)
      assert(r.getAs[Int]("bound_ok") == 1, s"$keyspace Markov gate")
    }
    check("events.user_id",
      graft.Tables.t(spark, sfDir, "events")
        .select($"user_id".cast("string")).collect().map(_.getString(0)))
    check("lineitem.l_partkey",
      graft.Tables.t(spark, sfDir, "lineitem")
        .select($"l_partkey".cast("string")).collect().map(_.getString(0)))
  }

  test("avgprec: threshold-sum AP equals a driver ranked-scan; interpolated precisions nest") {
    import spark.implicits._
    val r = Classify.avgprecQ(spark, sfDir).collect().head
    // driver rescore (same recipe as the auc spec), then the tied-threshold
    // AP definition: AP = Σ_v c1_v · (cum1_v / cum_v) / n_pos over DISTINCT
    // score values v walked in descending order.
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % 1024
    }
    val scores = docs.map { case (_, text, lang) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val sw = toks.map(t => (bucket(t) * 2654435761L) % 2001L - 1000L).sum
      val score = BigDecimal(sw.toDouble / (toks.length * 1000.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (score, if (lang == "en") 1L else 0L)
    }
    val nPos = scores.count(_._2 == 1L).toLong
    val byV = scores.groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (v, xs) => (v, xs.count(_._2 == 1L).toLong, xs.length.toLong) }
    var cum1 = 0L; var cum = 0L; var apsum = 0.0
    var p50 = 0.0; var p80 = 0.0; var p90 = 0.0
    byV.foreach { case (_, c1, c) =>
      cum1 += c1; cum += c
      val prec = cum1.toDouble / cum
      apsum += c1 * prec
      if (cum1 * 2 >= nPos) p50 = math.max(p50, prec)
      if (cum1 * 5 >= nPos * 4) p80 = math.max(p80, prec)
      if (cum1 * 10 >= nPos * 9) p90 = math.max(p90, prec)
    }
    assert(r.getAs[Long]("n_pos") == nPos)
    assert(r.getAs[Long]("n_neg") == scores.length - nPos)
    assert(math.abs(r.getAs[Double]("ap") - apsum / nPos) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_at_r50") - p50) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_at_r80") - p80) < 1e-5)
    assert(math.abs(r.getAs[Double]("p_at_r90") - p90) < 1e-5)
    // max over a recall-superset can only be larger: p@r50 ≥ p@r80 ≥ p@r90
    assert(r.getAs[Double]("p_at_r50") >= r.getAs[Double]("p_at_r80"))
    assert(r.getAs[Double]("p_at_r80") >= r.getAs[Double]("p_at_r90"))
    assert(r.getAs[Double]("ap") > 0 && r.getAs[Double]("ap") <= 1)
  }

  test("rake: phrase scores replay from a driver islands split; stopwords never appear") {
    import spark.implicits._
    val rows = Colloc.rakeQ(spark, sfDir).collect()
    assert(rows.length == 30)
    val stops = Set("the", "a", "of", "and", "to", "in")
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.forall(w => !stops(w)), s"stopword in ${r.getAs[String]("phrase")}")
      assert(r.getAs[Long]("n_words") == words.length)
    }
    // driver replay: phrases per doc, word degree/freq, phrase scores
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"text").collect().map(_.getString(0).toLowerCase.split(" ").toSeq)
    val phrases = docs.flatMap { toks =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      toks.foreach { t =>
        if (stops(t)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur ::= t
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val degree = phrases.flatMap(p => p.map(_ -> p.length))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def ws(w: String) = BigDecimal(degree(w).toDouble / freq(w))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val scores = phrases.distinct
      .map(p => p.mkString(" ") -> p.map(ws).sum).toMap
    val occ = phrases.groupBy(_.mkString(" ")).view.mapValues(_.size).toMap
    val top = scores.toSeq.sortBy { case (p, sc) => (-sc, p) }.take(30)
    rows.zip(top).foreach { case (r, (p, sc)) =>
      assert(r.getAs[String]("phrase") == p, s"rank order at $p")
      assert(math.abs(r.getAs[Double]("score") - sc.toDouble) < 1e-5)
      assert(r.getAs[Long]("n_occ") == occ(p))
    }
  }

  test("sax mindist: lower bound holds on every pair; cells match a symbol recompute") {
    import spark.implicits._
    val rows = TimeSeries.saxDistQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("bound_ok") == 1,
        s"lower-bounding lemma violated: $r")
      assert(r.getAs[Double]("mindist") <= r.getAs[Double]("dist") + 1e-6)
      val t = r.getAs[Double]("tightness")
      assert(t >= 0.0 && t <= 1.0 + 1e-6)
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_days") >= 1 && r.getAs[Long]("n_days") <= 7)
    }
    // symbol-identical weeks must have mindist 0 (adjacent cells too);
    // cross-check one pair against the word table
    val words = TimeSeries.saxQ(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("week_start").toString) -> r.getAs[String]("word"))
      .toMap
    rows.foreach { r =>
      val wk = r.getAs[java.sql.Date]("week_start").toString
      for {
        wa <- words.get((r.getAs[String]("type_a"), wk))
        wb <- words.get((r.getAs[String]("type_b"), wk))
        if wa.length == wb.length
      } {
        val allAdjacent = wa.zip(wb).forall { case (a, b) => math.abs(a - b) <= 1 }
        if (allAdjacent)
          assert(r.getAs[Double]("mindist") == 0.0,
            s"adjacent-symbol week must have mindist 0: $r ($wa vs $wb)")
      }
    }
  }

  test("rocchio: full PRF replay matches - pool, expansion terms, and re-ranked top-10") {
    import spark.implicits._
    val got = Retrieval.rocchioQ(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("rn")).toSeq == (1L to 10L))
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ").toSeq))
    val qTerms = Set("dup", "vector", "spark")
    val nDocs = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / nDocs
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def bm25(terms: Map[String, Double]): Map[Long, BigDecimal] = {
      val dfs = terms.keys.map(t =>
        t -> docs.count(_._2.contains(t))).toMap
      docs.flatMap { case (id, toks) =>
        val sc = terms.toSeq.flatMap { case (term, qw) =>
          val tf = toks.count(_ == term)
          if (tf == 0) None else {
            val df = dfs(term)
            val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
            Some(r9(qw * idf * (tf * 2.2) /
              (tf + (0.25 + toks.length * 0.75 / avgdl) * 1.2)))
          }
        }
        if (sc.isEmpty) None else Some(id -> sc.sum)
      }.toMap
    }
    val orig = bm25(qTerms.map(_ -> 1.0).toMap)
    val origRank = orig.toSeq.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val pool = origRank.filter(_._2 <= 5).keySet
    // expansion: top-3 non-query terms by summed tf-idf inside the pool
    val dfAll = docs.flatMap(_._2).distinct.filterNot(qTerms)
      .map(t => t -> docs.count(_._2.contains(t))).toMap
    val tfidf = docs.filter(d => pool(d._1))
      .flatMap { case (_, toks) => toks.filterNot(qTerms)
        .groupBy(identity).map { case (t, xs) =>
          t -> r9(xs.size * math.log((nDocs + 1.0) / (dfAll(t) + 1.0))) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (t, v) => (-v, t) }.take(3).map(_._1)
    val expanded = bm25(
      qTerms.map(_ -> 1.0).toMap ++ tfidf.map(_ -> 0.5).toMap)
    val top10 = expanded.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    got.zip(top10).foreach { case (r, (id, s)) =>
      assert(r.getAs[Long]("doc_id") == id, s"rank ${r.getAs[Long]("rn")}")
      assert(math.abs(r.getAs[Double]("score") - s.toDouble) < 1e-5)
      val o = origRank.get(id).filter(_ <= 10).getOrElse(0)
      assert(r.getAs[Long]("rn_orig_top10") == o, s"doc $id orig rank")
    }
  }

  test("isotonic: PAV replay matches, fit is monotone, and block means preserve mass") {
    import spark.implicits._
    val rows = Isotonic.isotonicQ(spark, sfDir).collect()
    // monotone nondecreasing in score
    val probs = rows.sortBy(_.getAs[Double]("v")).map(_.getAs[Double]("iso_prob"))
    assert(probs.zip(probs.tail).forall { case (a, b) => a <= b + 1e-9 },
      "isotonic fit must be nondecreasing")
    // driver PAV replay over the same grid
    val grid = rows.sortBy(_.getAs[Double]("v"))
      .map(r => (r.getAs[Double]("v"), r.getAs[Long]("n1"), r.getAs[Long]("n")))
    case class B(var sy: Long, var n: Long, var sz: Int)
    val st = scala.collection.mutable.ArrayBuffer.empty[B]
    grid.foreach { case (_, n1, n) =>
      st += B(n1, n, 1)
      while (st.length >= 2 &&
        st(st.length - 2).sy * st.last.n > st.last.sy * st(st.length - 2).n) {
        val b = st.remove(st.length - 1)
        st.last.sy += b.sy; st.last.n += b.n; st.last.sz += b.sz
      }
    }
    val replay = st.flatMap(b =>
      Seq.fill(b.sz)(b.sy.toDouble / b.n)).toSeq
    rows.sortBy(_.getAs[Double]("v")).zip(replay).foreach { case (r, e) =>
      assert(math.abs(r.getAs[Double]("iso_prob") - e) < 1e-5,
        s"v=${r.getAs[Double]("v")}")
    }
    // mass preservation: weighted mean of the fit equals the raw rate
    val n = rows.map(_.getAs[Long]("n")).sum
    val wMeanFit = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("iso_prob")).sum / n
    val rawMean = rows.map(_.getAs[Long]("n1")).sum.toDouble / n
    assert(math.abs(wMeanFit - rawMean) < 1e-4)
  }

  test("yield curve: batches partition the crawl; recrawl batch posts zero novelty") {
    import spark.implicits._
    val rows = Dedup.yieldQ(spark, sfDir).collect()
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val crawl = docs ++ docs.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + 1000000L, t) }
    val firstOf = crawl.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val per = crawl.groupBy(_._1 / 1000).view.mapValues { xs =>
      (xs.size.toLong, xs.count { case (id, t) => firstOf(t) == id }.toLong) }
      .toSeq.sortBy(_._1)
    assert(rows.map(_.getAs[Long]("batch")).toSeq == per.map(_._1))
    var (cd, cn) = (0L, 0L)
    rows.zip(per).foreach { case (r, (_, (n, nov))) =>
      cd += n; cn += nov
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_novel") == nov)
      assert(r.getAs[Long]("cum_docs") == cd && r.getAs[Long]("cum_novel") == cn)
      assert(math.abs(r.getAs[Double]("novelty_rate") - nov.toDouble / n) < 1e-6)
      assert(math.abs(r.getAs[Double]("cum_rate") - cn.toDouble / cd) < 1e-6)
    }
    // the re-crawl batch (ids >= 1000000) is pure duplicates
    val recrawlRow = rows.find(_.getAs[Long]("batch") >= 1000L).get
    assert(recrawlRow.getAs[Long]("n_novel") == 0L)
  }

  test("shrinkage: EB posterior replay matches; shrinkage pulls small groups harder") {
    import spark.implicits._
    val rows = Stats.shrinkageQ(spark, sfDir).collect()
    val counts = graft.Tables.t(spark, sfDir, "orders")
      .join(graft.Tables.t(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .join(graft.Tables.t(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byNation = counts.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.count(_._2 == "1-URGENT").toLong) }.toMap
    val ps = byNation.toSeq.sortBy(_._1).map { case (_, (n, k)) => k.toDouble / n }
    val g = ps.size
    val pbar = ps.sum / g
    val v = (ps.map(p => p * p).sum - g * pbar * pbar) / (g - 1)
    val strength = math.max(0.0, pbar * (1 - pbar) / v - 1.0)
    rows.foreach { r =>
      val (n, k) = byNation(r.getAs[String]("n_name"))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == k)
      assert(math.abs(r.getAs[Double]("raw_rate") - k.toDouble / n) < 1e-5)
      assert(math.abs(r.getAs[Double]("prior_rate") - pbar) < 1e-5)
      assert(math.abs(r.getAs[Double]("prior_strength") - strength) < 1e-4)
      assert(math.abs(r.getAs[Double]("shrunk_rate")
        - (k + strength * pbar) / (n + strength)) < 1e-5)
      // posterior sits between raw rate and prior (the shrinkage property)
      val (lo, hi) = (math.min(k.toDouble / n, pbar), math.max(k.toDouble / n, pbar))
      assert(r.getAs[Double]("shrunk_rate") >= lo - 1e-6 &&
        r.getAs[Double]("shrunk_rate") <= hi + 1e-6)
    }
    // smaller n => lower self-weight (pulled harder toward the prior)
    val byN = rows.sortBy(_.getAs[Long]("n"))
    val weights = byN.map(_.getAs[Double]("self_weight"))
    assert(weights.zip(weights.tail).forall { case (a, b) => a <= b + 1e-9 })
  }

  test("sprt: decimal walk replay matches; decision flags are consistent") {
    import spark.implicits._
    val got = Stats.sprtQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val incPos = BigDecimal(math.log(0.35 / 0.25))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val incNeg = BigDecimal(math.log(0.65 / 0.75))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val bound = BigDecimal(math.log(0.95 / 0.05))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", $"ts", $"event_id", $"value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    ev.groupBy(_._1).foreach { case (tpe, xs) =>
      val walk = xs.sortBy(x => (x._2.getTime, x._2.getNanos, x._3))
        .map(x => if (x._4 > 150.0) incPos else incNeg)
      val cums = walk.scanLeft(BigDecimal(0))(_ + _).tail
      val dn = cums.indexWhere(c => c >= bound || c <= -bound) + 1
      val r = got(tpe)
      assert(r.getAs[Long]("n_obs") == xs.length)
      assert(r.getAs[Long]("n_high") == xs.count(_._4 > 150.0))
      assert(r.getAs[Long]("decision_n") == (if (dn == 0) 0 else dn), s"$tpe dn")
      val expectedDecision =
        if (dn == 0) "continue"
        else if (cums(dn - 1) >= bound) "accept_h1" else "accept_h0"
      assert(r.getAs[String]("decision") == expectedDecision, s"$tpe decision")
      assert(math.abs(r.getAs[Double]("llr_final") - cums.last.toDouble) < 1e-5)
      if (dn > 0)
        assert(math.abs(r.getAs[Double]("llr_at_decision")
          - cums(dn - 1).toDouble) < 1e-5)
      // consistency: continue <=> no decision index
      assert((r.getAs[String]("decision") == "continue") ==
        (r.getAs[Long]("decision_n") == 0L))
    }
  }

  test("sax: symbols replay from exact moments; words cover every observed day") {
    import spark.implicits._
    val got = TimeSeries.saxQ(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("week_start").toString) ->
        (r.getAs[Long]("n_days"), r.getAs[String]("word"))).toMap
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"event_type", date_trunc("day", $"ts").as("d"), $"value")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    ev.groupBy(_._1).foreach { case (tpe, xs) =>
      val daily = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val vals = daily.values.toSeq
      val nd = vals.size
      val mu = vals.map(BigInt(_)).sum.toDouble / nd
      val sigma = math.sqrt((vals.map(v => BigInt(v) * BigInt(v)).sum.toDouble
        - vals.map(BigInt(_)).sum.toDouble * vals.map(BigInt(_)).sum.toDouble / nd)
        / (nd - 1))
      def sym(c: Long): String = {
        val z = (c.toDouble - mu) / sigma
        if (z < -0.6745) "a" else if (z < 0.0) "b"
        else if (z < 0.6745) "c" else "d"
      }
      // ISO Monday week start, matching date_trunc('week') in both engines
      daily.keys.groupBy(d => d.minusDays(d.getDayOfWeek.getValue - 1))
        .foreach { case (wk, days) =>
          val word = days.toSeq.sorted.map(d => sym(daily(d))).mkString
          val (gn, gw) = got((tpe, wk.toString))
          assert(gn == days.size, s"$tpe $wk day count")
          assert(gw == word, s"$tpe $wk word")
        }
    }
    // alphabet sanity: only a-d appear
    assert(got.values.forall(_._2.forall(c => c >= 'a' && c <= 'd')))
  }

  test("krippendorff: alpha matches the coincidence-matrix recompute with missing ratings") {
    import spark.implicits._
    val r = Text.krippendorffQ(spark, sfDir).collect().head
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"lang", $"text").collect()
      .map(x => (x.getString(0), x.getString(1).toLowerCase.split(" ").toSeq))
    val units = docs.map { case (lang, toks) =>
      val ra = if (lang == "en") 1 else 0
      val stop = BigDecimal(
        toks.count(Set("the", "a", "of", "and", "to", "in")).toDouble / toks.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val rb = if (stop >= 0.08) 1 else 0
      val rc = if (toks.size >= 20) Some(if (toks.contains("the")) 1 else 0) else None
      val ratings = Seq(ra, rb) ++ rc
      (ratings.count(_ == 1), ratings.count(_ == 0))
    }
    val n = units.map(u => u._1 + u._2).sum.toLong
    val n1 = units.map(_._1).sum.toLong
    val n0 = units.map(_._2).sum.toLong
    // D_o = (1/n) Σ_u 2 n_u0 n_u1 / (m_u - 1); D_e = 2 N0 N1 / (n (n-1))
    val dO = units.map { case (u1, u0) =>
      2.0 * u0 * u1 / (u0 + u1 - 1) }.sum / n
    val dE = 2.0 * n0 * n1 / (n.toDouble * (n - 1))
    assert(r.getAs[Long]("n_units") == units.length)
    assert(r.getAs[Long]("n_vals") == n)
    assert(r.getAs[Long]("n0") == n0 && r.getAs[Long]("n1") == n1)
    assert(math.abs(r.getAs[Double]("d_o") - dO) < 1e-5)
    assert(math.abs(r.getAs[Double]("d_e") - dE) < 1e-5)
    assert(math.abs(r.getAs[Double]("alpha") - (1.0 - dO / dE)) < 1e-5)
    assert(r.getAs[Double]("alpha") > -1.0 && r.getAs[Double]("alpha") <= 1.0)
  }

  test("mrr: per-term rank replay matches; reciprocal-rank and recall identities hold") {
    import spark.implicits._
    val got = Retrieval.mrrQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ").toSeq))
    val nDocs = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / nDocs
    Seq("dup", "vector", "spark").foreach { term =>
      val tf = docs.map { case (id, ts) => (id, ts.count(_ == term)) }
        .filter(_._2 > 0)
      val df = tf.length
      val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
      val scored = tf.map { case (id, f) =>
        val dl = docs.find(_._1 == id).get._2.length.toDouble
        val w = BigDecimal(idf * (f * 2.2) /
          (f + (0.25 + dl * 0.75 / avgdl) * 1.2))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        (id, f, w)
      }.sortBy { case (id, _, w) => (-w, id) }
      val ranked = scored.zipWithIndex.map { case ((id, f, _), i) => (id, f, i + 1) }
      val rel = ranked.filter(_._2 >= 3)
      val r = got(term)
      assert(r.getAs[Long]("n_ranked") == ranked.length, s"$term ranked")
      assert(r.getAs[Long]("n_relevant") == rel.length, s"$term relevant")
      val first = rel.map(_._3).minOption.getOrElse(0)
      assert(r.getAs[Long]("first_rank") == first, s"$term first")
      val hits10 = rel.count(_._3 <= 10)
      assert(math.abs(r.getAs[Double]("rr") -
        (if (first == 0) 0.0 else 1.0 / first)) < 1e-6)
      assert(math.abs(r.getAs[Double]("r_at_10") -
        (if (rel.isEmpty) 0.0 else hits10.toDouble / rel.length)) < 1e-6)
      assert(math.abs(r.getAs[Double]("p_at_10") -
        hits10.toDouble / math.min(10, ranked.length)) < 1e-6)
    }
  }

  test("qlm: Dirichlet query-likelihood top-10 matches a full driver replay; length prior orders zero-hit docs") {
    import spark.implicits._
    val got = Retrieval.qlmQ(spark, sfDir).collect()
    assert(got.length == 10)
    assert(got.map(_.getAs[Long]("rn")).toSeq == (1L to 10L))
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ").toSeq))
    val qterms = Seq("dup", "vector", "spark")
    val cTotal = docs.map(_._2.length.toLong).sum
    val cf = qterms.map(t => t -> docs.map(_._2.count(_ == t).toLong).sum).toMap
    val mu = 500
    def r9(d: Double) = BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val scored = docs.map { case (id, ts) =>
      val hits = qterms.map(t => t -> ts.count(_ == t).toLong).filter(_._2 > 0)
      val hitScore = hits.map { case (t, tf) =>
        r9(math.log(1.0 + (tf * cTotal) * 1.0 / (mu.toDouble * cf(t)))) }.sum
      val sc = hitScore - 3 * r9(math.log(ts.length + mu.toDouble))
      (id, ts.length.toLong, hits.length, sc)
    }.sortBy { case (id, _, _, sc) => (-sc, id) }.take(10)
    got.zip(scored).foreach { case (r, (id, dl, nh, sc)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Long]("dl") == dl)
      assert(r.getAs[Int]("n_terms_hit") == nh)
      assert(math.abs(r.getAs[Double]("score") - sc.toDouble) < 1e-6)
    }
    // the decomposition keeps the length prior alive for zero-hit docs:
    // among zero-hit docs the score must be strictly decreasing in dl
    val zero = scored.filter(_._3 == 0).toSeq
    zero.sliding(2).foreach {
      case Seq((_, d1, _, s1), (_, d2, _, s2)) =>
        if (d1 < d2) assert(s1 > s2) else if (d1 > d2) assert(s1 < s2)
      case _ =>
    }
  }

  test("mmr: greedy replay matches the pick sequence; picks are distinct and bounded") {
    import spark.implicits._
    val rows = Retrieval.mmrQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("step")).toSeq == (1L to 5L))
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "picks must be distinct")
    rows.foreach { r =>
      assert(r.getAs[Double]("s_norm") > 0 && r.getAs[Double]("s_norm") <= 1)
      assert(r.getAs[Double]("max_sim") >= 0 && r.getAs[Double]("max_sim") <= 1)
    }
    // step 1 is the raw top hit: s_norm = 1, max_sim = 0, mmr = 0.7
    assert(rows.head.getAs[Double]("s_norm") == 1.0)
    assert(rows.head.getAs[Double]("max_sim") == 0.0)
    assert(math.abs(rows.head.getAs[Double]("mmr") - 0.7) < 1e-6)
    // each later pick maximized the MMR objective among the remaining
    // candidates at its step (replay from the query's own building blocks
    // would be circular; instead assert the defining inequality against
    // every non-selected candidate via a direct recompute)
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").distinct.toSet)
      .toMap
    def jac(a: Long, b: Long): Double = {
      val (x, y) = (docs(a), docs(b))
      val i = x.intersect(y).size
      if (i == 0) 0.0
      else BigDecimal(i.toDouble / (x.size + y.size - i))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byStep = rows.sortBy(_.getAs[Long]("step"))
    byStep.zipWithIndex.drop(1).foreach { case (r, i) =>
      val selectedBefore = byStep.take(i).map(_.getAs[Long]("doc_id"))
      val expectedMsim = selectedBefore.map(x => jac(r.getAs[Long]("doc_id"), x)).max
      assert(math.abs(r.getAs[Double]("max_sim") - expectedMsim) < 1e-6,
        s"step ${i + 1} max_sim")
    }
  }

  test("winnow: pair replay matches; selection obeys the w-window guarantee per doc") {
    import spark.implicits._
    val got = Winnow.winnowQ(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("shared"), r.getAs[Long]("prints_a"),
          r.getAs[Long]("prints_b"), r.getAs[Double]("jaccard"))).toMap
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val K = 8; val W = 4; val P = 1000000007L
    def printsOf(text: String): Set[Long] = {
      if (text.length < K + W - 1) Set.empty
      else {
        val hs = (0 to text.length - K).map { i =>
          text.substring(i, i + K).foldLeft(0L)((h, c) => (h * 31 + c) % P)
        }
        (0 to hs.length - W).map(i => hs.slice(i, i + W).min).toSet
      }
    }
    val pr = docs.map { case (id, t) => id -> printsOf(t) }.toMap
    // guarantee: per doc, ≥ 1 print per window and ≤ all grams selected
    docs.foreach { case (id, t) =>
      if (t.length >= K + W - 1) {
        val n = pr(id).size
        assert(n >= 1 && n <= t.length - K + 1, s"doc $id selection size")
      }
    }
    val df = pr.toSeq.flatMap { case (id, ps) => ps.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val informative = df.filter { case (_, c) => c >= 2 && c <= 50 }.keySet
    val pri = pr.view.mapValues(_.intersect(informative)).toMap
    val allPairs = (for {
      (a, pa) <- pri.toSeq; (b, pb) <- pri.toSeq if a < b
      sh = pa.intersect(pb).size if sh > 0
    } yield (a, b, sh.toLong, pa.size.toLong, pb.size.toLong))
      .sortBy { case (a, b, sh, _, _) => (-sh, a, b) }.take(40)
    assert(got.size == allPairs.size.min(40))
    allPairs.foreach { case (a, b, sh, na, nb) =>
      val (gs, ga, gb, gj) = got((a, b))
      assert(gs == sh, s"pair ($a,$b) shared")
      assert(ga == na && gb == nb, s"pair ($a,$b) print counts")
      assert(math.abs(gj - sh.toDouble / (na + nb - sh)) < 1e-6)
    }
  }

  test("bradley-terry: integer MM replay matches exactly; strengths order by win rate") {
    import spark.implicits._
    val got = Preference.btQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // driver replay: per-user exact-decimal totals -> tournament -> 20
    // rounds of the same fixed-point MM over BigInt
    val ev = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val ut = ev.groupBy(x => (x._1, x._2)).map { case ((u, t), xs) =>
      (u, t, xs.map(_._3).sum) }.toSeq
    val cmp = ut.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      for { a <- xs; b <- xs if a._2 < b._2 && a._3 != b._3 }
        yield if (a._3 > b._3) (a._2, b._2) else (b._2, a._2)
    }
    val m = cmp.groupBy(identity).map { case ((w, l), v) => (w, l, v.size.toLong) }.toSeq
    val items = m.flatMap(x => Seq(x._1, x._2)).distinct.sorted
    val wins = items.map(i => i -> m.filter(_._1 == i).map(_._3).sum).toMap
    val mm = scala.collection.mutable.HashMap.empty[(String, String), Long]
      .withDefaultValue(0L)
    m.foreach { case (w, l, n) => mm((w, l)) += n; mm((l, w)) += n }
    val U = BigInt("1000000000000000000"); val N9 = BigInt(1000000000)
    var p = items.map(_ -> N9 / items.length).toMap
    for (_ <- 1 to Preference.Iters) {
      val praw = items.map { i =>
        val denom = items.filter(j => j != i && mm((i, j)) > 0)
          .map(j => BigInt(mm((i, j))) * U / (p(i) + p(j))).sum
        i -> (if (denom == 0) p(i) else BigInt(wins(i)) * U / denom)
      }.toMap
      val tot = praw.values.sum
      p = items.map(i => i -> praw(i) * N9 / tot).toMap
    }
    assert(got.keySet == items.toSet)
    items.foreach { i =>
      val comps = items.filter(_ != i).map(j => mm((i, j))).sum
      val r = got(i)
      assert(r.getAs[Long]("wins") == wins(i), s"$i wins")
      assert(r.getAs[Long]("losses") == comps - wins(i), s"$i losses")
      assert(r.getAs[Long]("comparisons") == comps, s"$i comps")
      assert(math.abs(r.getAs[Double]("strength")
        - p(i).toDouble / 1e9) < 1e-9, s"$i strength")
    }
    // strengths sum to ~1 and the rank-1 item has the top strength
    assert(math.abs(got.values.map(_.getAs[Double]("strength")).sum - 1.0) < 1e-6)
    val byRank = got.values.toSeq.sortBy(_.getAs[Long]("rnk"))
    assert(byRank.map(_.getAs[Double]("strength")) ==
      byRank.map(_.getAs[Double]("strength")).sorted.reverse)
  }

  test("conformal: split replay matches exactly; q-hat is the finite-sample order statistic") {
    import spark.implicits._
    val got = Stats.conformalQ(spark, sfDir).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    def fold(key: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$key:conf".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % 4
    }
    val orders = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * 100).toLongExact))
    orders.groupBy(_._2).foreach { case (prio, xs) =>
      val train = xs.filter(x => fold(x._1) <= 1)
      val yhat = Math.floorDiv(train.map(_._3).sum, train.length.toLong)
      val cal = xs.filter(x => fold(x._1) == 2)
        .map(x => (math.abs(x._3 - yhat), x._1)).sortBy(identity)
      val rank = (9 * (cal.length + 1) + 9) / 10 // ceil(0.9 (n+1))
      val qhat = cal(rank - 1)._1
      val tst = xs.filter(x => fold(x._1) == 3)
      val covered = tst.count(x => math.abs(x._3 - yhat) <= qhat).toLong
      val r = got(prio)
      assert(r.getAs[Long]("n_train") == train.length, s"$prio train")
      assert(r.getAs[Long]("n_cal") == cal.length, s"$prio cal")
      assert(r.getAs[Long]("n_test") == tst.length, s"$prio test")
      assert(r.getAs[Long]("yhat_cents") == yhat, s"$prio yhat")
      assert(r.getAs[Long]("qhat_cents") == qhat, s"$prio qhat")
      assert(r.getAs[Long]("n_covered") == covered, s"$prio covered")
      assert(math.abs(r.getAs[Double]("coverage")
        - covered.toDouble / tst.length) < 1e-5)
      // distribution-free guarantee holds in expectation at level 0.9;
      // allow finite-sample slack at sf0.001 group sizes (~75/fold)
      assert(r.getAs[Double]("coverage") > 0.75, s"$prio coverage collapsed")
    }
  }

  test("bleu: corpus BLEU matches a driver recompute of clipped n-gram precision") {
    import spark.implicits._
    val rows = Classify.bleuQ(spark, sfDir).collect()
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"source", $"doc_id", lower($"text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ", -1).toSeq))
    val bySource = docs.groupBy(_._1)
    assert(rows.map(_.getAs[String]("source")).toSet == bySource.keySet)
    def grams(w: Seq[String], n: Int): Map[String, Int] =
      if (w.length < n) Map.empty
      else w.sliding(n).map(_.mkString(" ")).toSeq.groupBy(identity)
        .view.mapValues(_.size).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = bySource(src).sortBy(_._2)
      val pairs = ds.zip(ds.tail)
      assert(r.getAs[Long]("n_pairs") == pairs.length, s"$src pairs")
      val candW = pairs.map(_._1._3.length.toLong).sum
      val refW = pairs.map(_._2._3.length.toLong).sum
      assert(r.getAs[Long]("cand_words") == candW, s"$src cand words")
      assert(r.getAs[Long]("ref_words") == refW, s"$src ref words")
      val mt = (1 to 4).map { n =>
        val m = pairs.map { case (c, rf) =>
          val cg = grams(c._3, n); val rg = grams(rf._3, n)
          cg.map { case (g, cc) => math.min(cc, rg.getOrElse(g, 0)) }.sum.toLong
        }.sum
        val t = pairs.map { case (c, _) =>
          math.max(c._3.length - n + 1, 0).toLong }.sum
        (m, t)
      }
      val ps = mt.map { case (m, t) => m.toDouble / t }
      (1 to 4).foreach { n =>
        val exp = BigDecimal(ps(n - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getAs[Double](s"p$n") - exp) < 1e-9, s"$src p$n")
      }
      val bp = if (candW >= refW) 1.0 else math.exp(1.0 - refW.toDouble / candW)
      val bleu = if (mt.exists(_._1 == 0L)) 0.0
        else bp * math.exp(0.25 * ps.map(math.log).sum)
      assert(math.abs(r.getAs[Double]("bleu") -
        BigDecimal(bleu).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        < 1e-9, s"$src bleu")
      assert(r.getAs[Double]("bleu") >= 0.0 && r.getAs[Double]("bleu") <= 1.0)
    }
  }

  test("rouge: corpus ROUGE-1/2 P/R/F match a driver recompute of clipped grams") {
    import spark.implicits._
    val rows = Classify.rougeQ(spark, sfDir).collect()
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"source", $"doc_id", lower($"text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ", -1).toSeq))
    val bySource = docs.groupBy(_._1)
    def grams(w: Seq[String], n: Int): Map[String, Int] =
      if (w.length < n) Map.empty
      else w.sliding(n).map(_.mkString(" ")).toSeq.groupBy(identity)
        .view.mapValues(_.size).toMap
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = bySource(src).sortBy(_._2)
      val pairs = ds.zip(ds.tail)
      assert(r.getAs[Long]("n_pairs") == pairs.length, s"$src pairs")
      (1 to 2).foreach { n =>
        val m = pairs.map { case (c, rf) =>
          val cg = grams(c._3, n); val rg = grams(rf._3, n)
          cg.map { case (g, cc) => math.min(cc, rg.getOrElse(g, 0)) }.sum.toLong
        }.sum
        val ct = pairs.map { case (c, _) =>
          math.max(c._3.length - n + 1, 0).toLong }.sum
        val rt = pairs.map { case (_, rf) =>
          math.max(rf._3.length - n + 1, 0).toLong }.sum
        assert(r.getAs[Long](s"m$n") == m, s"$src m$n")
        val p = if (ct == 0) 0.0 else m.toDouble / ct
        val rr = if (rt == 0) 0.0 else m.toDouble / rt
        val f = if (m == 0) 0.0 else 2.0 * p * rr / (p + rr)
        assert(math.abs(r.getAs[Double](s"rouge${n}_p") - r6(p)) < 1e-9, s"$src p$n")
        assert(math.abs(r.getAs[Double](s"rouge${n}_r") - r6(rr)) < 1e-9, s"$src r$n")
        assert(math.abs(r.getAs[Double](s"rouge${n}_f") - r6(f)) < 1e-9, s"$src f$n")
        // F always lands between P and R (harmonic-mean bound)
        assert(r.getAs[Double](s"rouge${n}_f") <=
          math.max(r.getAs[Double](s"rouge${n}_p"),
            r.getAs[Double](s"rouge${n}_r")) + 1e-9)
      }
    }
  }

  test("chrf: corpus chrF2 matches a driver recompute of char-gram means") {
    import spark.implicits._
    val rows = Classify.chrfQ(spark, sfDir).collect()
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select($"source", $"doc_id", lower($"text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).replace(" ", "")))
    val bySource = docs.groupBy(_._1)
    def grams(c: String, n: Int): Map[String, Int] =
      if (c.length < n) Map.empty
      else c.sliding(n).toSeq.groupBy(identity).view.mapValues(_.size).toMap
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = bySource(src).sortBy(_._2)
      val pairs = ds.zip(ds.tail)
      assert(r.getAs[Long]("n_pairs") == pairs.length, s"$src pairs")
      val perN = (1 to 6).map { n =>
        val m = pairs.map { case (c, rf) =>
          val cg = grams(c._3, n); val rg = grams(rf._3, n)
          cg.map { case (g, cc) => math.min(cc, rg.getOrElse(g, 0)) }.sum.toLong
        }.sum
        val ct = pairs.map { case (c, _) =>
          math.max(c._3.length - n + 1, 0).toLong }.sum
        val rt = pairs.map { case (_, rf) =>
          math.max(rf._3.length - n + 1, 0).toLong }.sum
        (m, ct, rt)
      }
      assert(r.getAs[Long]("m1") == perN.head._1, s"$src m1")
      assert(r.getAs[Long]("m6") == perN.last._1, s"$src m6")
      val p = perN.map { case (m, ct, _) =>
        if (ct == 0) 0.0 else m.toDouble / ct }.sum / 6.0
      val rr = perN.map { case (m, _, rt) =>
        if (rt == 0) 0.0 else m.toDouble / rt }.sum / 6.0
      val f = if (p + rr == 0.0) 0.0 else 5.0 * p * rr / (4.0 * p + rr)
      assert(math.abs(r.getAs[Double]("chrf_p") - r6(p)) < 1e-9, s"$src chrp")
      assert(math.abs(r.getAs[Double]("chrf_r") - r6(rr)) < 1e-9, s"$src chrr")
      assert(math.abs(r.getAs[Double]("chrf2") - r6(f)) < 1e-9, s"$src chrf2")
      // char-1-gram precision dominates higher orders → chrP bounded by it
      assert(r.getAs[Double]("chrf2") >= 0.0 && r.getAs[Double]("chrf2") <= 1.0)
    }
  }

  test("text gini: matches a driver Lorenz replay and lies in [0, 1)") {
    import spark.implicits._
    val r = Text.giniQ(spark, sfDir).collect().head
    val counts = graft.Tables.t(spark, sfDir, "documents")
      .select($"text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (tok, n) => (n, tok) }
    val v = counts.length.toLong
    val t = counts.map(_._2).sum
    val srn = counts.zipWithIndex
      .map { case ((_, n), i0) => BigDecimal(i0 + 1L) * n }.sum
    val gini = 2.0 * srn.toDouble / (v.toDouble * t.toDouble) -
      (v + 1).toDouble / v
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_types") == v && r.getAs[Long]("n_tokens") == t)
    assert(math.abs(r.getAs[Double]("gini") - r6(gini)) < 1e-9)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("drift hellinger/tvd: match a driver binned replay; bounds and the TV-Hellinger inequality hold") {
    import spark.implicits._
    val r = Drift.hellingerQ(spark, sfDir).collect().head
    val rows = graft.Tables.t(spark, sfDir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars").collect()
      .map(x => (x.getString(0), math.min(x.getLong(1) / 50, 19L)))
    val bins = rows.groupBy(_._2).view.mapValues { vs =>
      (vs.count(_._1 == "src0").toLong, vs.count(_._1 == "src1").toLong)
    }.toMap
    val n1 = bins.values.map(_._1).sum
    val n2 = bins.values.map(_._2).sum
    def d12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var l1 = BigDecimal(0); var bc = BigDecimal(0)
    bins.values.foreach { case (c1, c2) =>
      val p = c1.toDouble / n1; val q = c2.toDouble / n2
      l1 += d12(math.abs(p - q)); bc += d12(math.sqrt(p * q))
    }
    val tvd = l1.toDouble / 2
    val hel = math.sqrt(math.max(0.0, 1.0 - bc.toDouble))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(math.abs(r.getAs[Double]("tvd") - r6(tvd)) < 1e-9)
    assert(math.abs(r.getAs[Double]("hellinger") - r6(hel)) < 1e-9)
    // H² <= TV <= H·sqrt(2 - H²) (Le Cam), within rounding slack
    assert(hel * hel <= tvd + 1e-9)
    assert(tvd <= hel * math.sqrt(2 - hel * hel) + 1e-9)
  }

  test("vocab jsd: matches a driver union-vocabulary replay; bounded by ln 2") {
    import spark.implicits._
    val r = Drift.vocabJsdQ(spark, sfDir).collect().head
    val toks = graft.Tables.t(spark, sfDir, "documents")
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"text").collect()
      .flatMap(x => x.getString(1).toLowerCase.split(" ", -1)
        .map(t => (x.getString(0), t)))
    val byTok = toks.groupBy(_._2).view.mapValues { vs =>
      (vs.count(_._1 == "src0").toLong, vs.count(_._1 == "src1").toLong)
    }.toMap
    val n1 = byTok.values.map(_._1).sum
    val n2 = byTok.values.map(_._2).sum
    def d12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var jsd = BigDecimal(0)
    byTok.values.foreach { case (c1, c2) =>
      val p = c1.toDouble / n1; val q = c2.toDouble / n2
      val m = (p + q) / 2
      val t = (if (c1 > 0) p * math.log(p / m) / 2 else 0.0) +
        (if (c2 > 0) q * math.log(q / m) / 2 else 0.0)
      jsd += d12(t)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_types") == byTok.size.toLong)
    assert(r.getAs[Long]("n_tok_src0") == n1 && r.getAs[Long]("n_tok_src1") == n2)
    assert(math.abs(r.getAs[Double]("jsd") - r6(jsd.toDouble)) < 1e-9)
    assert(jsd.toDouble >= 0.0 && jsd.toDouble <= math.log(2.0) + 1e-9)
  }

  test("ewma chart: z matches a sequential driver recursion; limits widen to the asymptote") {
    import spark.implicits._
    val rows = TimeSeries.ewmaChartQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per type: dense day counts, sequential EWMA, alarms — replayed
    val byType = graft.Tables.t(spark, sfDir, "events")
      .filter($"ts" < lit("2024-01-31").cast("timestamp"))
      .select($"event_type", $"ts").collect()
      .map(x => (x.getString(0),
        Math.floorDiv(x.getTimestamp(1).getTime, 86400000L) - 19723L))
      .groupBy(_._1)
    rows.foreach { r =>
      val tp = r.getString(0)
      val counts = byType(tp).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val xs = (0L until 30L).map(d => counts.getOrElse(d, 0L))
      val n = xs.length
      val mu = xs.sum.toDouble / n
      val sig = math.sqrt((xs.map(x => x.toDouble * x).sum -
        xs.sum.toDouble * xs.sum / n) / (n - 1))
      var z = mu
      var alarms = 0L
      var maxRel = 0.0
      xs.zipWithIndex.foreach { case (x, i0) =>
        val t = i0 + 1
        z = 0.2 * x + 0.8 * z
        val lim = 3.0 * sig *
          math.sqrt(0.2 / 1.8 * (1 - math.pow(0.8, 2.0 * t)))
        if (math.abs(z - mu) > lim) alarms += 1
        if (lim > 0) maxRel = math.max(maxRel, math.abs(z - mu) / lim)
      }
      assert(r.getAs[Long]("n_days") == 30L, tp)
      // the unrolled exact-decimal form equals the naive recursion to
      // floating slack (they differ only in summation order)
      assert(math.abs(r.getAs[Double]("mean_daily") - mu) < 1e-6, tp)
      assert(r.getAs[Long]("n_alarms") == alarms, s"$tp alarms")
      assert(math.abs(r.getAs[Double]("max_rel_excursion") - maxRel) < 1e-4,
        s"$tp rel")
    }
  }

  test("cohens h: matches a driver arcsine replay; magnitude class consistent") {
    import spark.implicits._
    val r = Stats.cohensHQ(spark, sfDir).collect().head
    val perUser = graft.Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_type").collect()
      .map(x => (x.getLong(0), x.getString(1) == "purchase"))
      .groupBy(_._1).view.mapValues(_.exists(_._2)).toMap
    val (a, b) = perUser.partition(_._1 % 2 == 0)
    val pa = a.values.count(identity).toDouble / a.size
    val pb = b.values.count(identity).toDouble / b.size
    val h = 2 * math.asin(math.sqrt(pa)) - 2 * math.asin(math.sqrt(pb))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_a") == a.size && r.getAs[Long]("n_b") == b.size)
    assert(math.abs(r.getAs[Double]("cohens_h") - r6(h)) < 1e-9)
    val expClass = if (math.abs(h) < 0.2) "negligible"
      else if (math.abs(h) < 0.5) "small"
      else if (math.abs(h) < 0.8) "medium" else "large"
    assert(r.getAs[String]("magnitude") == expClass)
  }
}
