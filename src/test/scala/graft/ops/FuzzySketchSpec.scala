package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the r7 operators the oracle can't see:
  * SymSpell completeness vs brute force, HLL gate/merge algebra,
  * classifier partition invariance + plan shape, bin equal-frequency. */
class FuzzySketchSpec extends AnyFunSuite with SparkSpec {

  // --- Fuzzy (SymSpell deletion neighborhoods) -----------------------------

  test("fuzzy: deletion-neighborhood pairs equal brute-force lev<=2 pairs") {
    import spark.implicits._
    // adversarial vocab: substitutions, transposition-shaped pairs,
    // prefix/suffix edits, short tokens, and far-apart controls
    val words = Seq("cat", "bat", "cart", "car", "ca", "c", "hello",
      "hallo", "hell", "jello", "spark", "shark", "stark", "zzzzz",
      "table", "cable", "fable", "ample")
    val vocab = words.toDF("t").withColumn("freq", lit(1L))
    val got = Fuzzy.vocabPairs(vocab, maxDist = 2)
      .select("t1", "t2", "dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- words; b <- words if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd)).toSet
    assert(got == want,
      s"missing=${want -- got} spurious=${got -- want}")
  }

  test("fuzzy: no pair beyond the distance bound is ever emitted") {
    val rows = Fuzzy.fuzzyVocabQ(spark, sfDir).collect()
    assert(rows.nonEmpty, "sf0.001 vocab has known distance-2 pairs")
    rows.foreach { r =>
      assert(r.getAs[Int]("dist") >= 1 && r.getAs[Int]("dist") <= 2)
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"))
    }
  }

  // --- Sketches (mergeable HLL) --------------------------------------------

  test("hll: every per-source and global estimate passes its error gate") {
    val rows = Sketches.hllMergeQ(spark, sfDir).collect()
    assert(rows.length >= 2, "at least one source plus the ALL row")
    assert(rows.exists(_.getAs[String]("source") == "ALL"))
    rows.foreach(r => assert(r.getAs[Int]("est_ok") == 1,
      s"estimate outside envelope for ${r.getAs[String]("source")}"))
  }

  test("hll overlap: inclusion-exclusion gates hold and exact intersections match a driver recompute") {
    import spark.implicits._
    val rows = Sketches.hllOverlapQ(spark, sfDir).collect()
    assert(rows.length == 10, "C(5,2) source pairs")
    rows.foreach(r => assert(r.getAs[Int]("incl_excl_ok") == 1,
      s"${r.getString(0)}x${r.getString(1)} estimate outside envelope"))
    val vocab = graft.Tables.t(spark, sfDir, "documents")
      .filter($"source".isin("src0", "src1", "src2", "src3", "src4"))
      .select($"source", explode(split(lower($"text"), " ")).as("tok"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(r.getAs[Long]("n_exact_a") == vocab(a).size)
      assert(r.getAs[Long]("n_exact_b") == vocab(b).size)
      assert(r.getAs[Long]("n_exact_inter") == (vocab(a) & vocab(b)).size)
    }
  }

  test("hll: union estimate is partition-invariant and merge-order-free") {
    import spark.implicits._
    val toks = graft.Tables.t(spark, sfDir, "documents")
      .select(explode(split(lower($"text"), " ")).as("tok"))
    def unionEst(parts: Int): Long = toks.repartition(parts)
      .agg(hll_sketch_agg($"tok", lit(12)).as("sk"))
      .select(hll_sketch_estimate($"sk")).head().getLong(0)
    // HLL registers are max-merged: any partitioning/order → same sketch
    assert(unionEst(1) == unionEst(7))
  }

  // --- Classify (hashed linear model) --------------------------------------

  test("classify: sum_w is exact under any shuffle width; label is the sign gate") {
    val a = Classify.classifyQ(spark, sfDir).collect()
    assert(a.nonEmpty)
    // integer millis sums: rerunning under a different shuffle fanout
    // must reproduce byte-identical scores (no FP drift path exists)
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "17")
    val b = Classify.classifyQ(wide, sfDir).collect()
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("sum_w"), r.getAs[Double]("score")))).toMap
    assert(asMap(a) == asMap(b))
    a.foreach { r =>
      val lbl = r.getAs[Int]("label")
      val sw = r.getAs[Long]("sum_w")
      assert(lbl == (if (sw > 0) 1 else 0), "label must be the sign gate")
    }
  }

  test("classify: weight lookup is a broadcast join, never a shuffle of tokens") {
    val plan = Classify.classifyQ(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"1024-row model must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"token stream must not shuffle for the model join:\n$plan")
  }

  // --- Weighted sampling (A-ES) --------------------------------------------

  test("weighted sample: selection is deterministic and biased toward weight") {
    import spark.implicits._
    val a = Text.weightedSample(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    val b = Text.weightedSample(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    assert(a == b, "hash-seeded A-ES must redraw the identical sample")
    // w = n_chars: the sampled docs' mean length must exceed the corpus
    // mean (the whole point of weighting)
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val sampled = docs.join(
      Text.weightedSample(spark, sfDir).select($"doc_id"), "doc_id")
    val mSample = sampled.agg(avg($"n_chars")).head().getDouble(0)
    val mAll = docs.agg(avg($"n_chars")).head().getDouble(0)
    assert(mSample > mAll,
      s"weighted sample mean $mSample must exceed corpus mean $mAll")
  }

  // --- Source overlap matrix -----------------------------------------------

  test("source overlap: full pair coverage, intersection bounds, jaccard range") {
    import spark.implicits._
    val rows = Sketches.sourceOverlapQ(spark, sfDir).collect()
    val nSources = graft.Tables.t(spark, sfDir, "documents")
      .select($"source").distinct().count().toInt
    // the shared word-salad vocabulary makes every source pair overlap
    assert(rows.length == nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val (nc, n1, n2) = (r.getAs[Long]("n_common"),
        r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      assert(nc >= 1 && nc <= math.min(n1, n2))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"))
    }
  }

  // --- Validate ------------------------------------------------------------

  test("validate: whole suite is one scan; counts match a per-rule recount") {
    val q = Validate.rulesQ(spark, sfDir)
    val got = q.collect()
      .map(r => r.getAs[String]("rule_name") -> r.getAs[Long]("n_violations"))
      .toMap
    // after execution the AQE-final plan is concrete: five rules, ONE scan
    // (AQE's toString repeats the tree under "== Initial Plan ==" — count
    // only the final section)
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nScans = "Scan parquet".r.findAllIn(plan).length
    assert(nScans == 1,
      s"five rules must compile to ONE table pass, got $nScans scans:\n$plan")
    val li = graft.Tables.t(spark, sfDir, "lineitem")
    assert(got("quantity_in_1_45") ==
      li.filter(!col("l_quantity").between(1, 45)).count())
    assert(got("orderkey_not_null") == 0L)
    assert(got.values.forall(_ >= 0))
  }

  // --- Count-min sketch ----------------------------------------------------

  test("cms: estimates dominate exact counts and are shuffle-width invariant") {
    import spark.implicits._
    val rows = Sketches.cmsQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("est_ge_exact") == 1,
        s"${r.getAs[String]("tok")}: CMS can only over-count, never under")
      assert(r.getAs[Int]("est_within_bound") == 1,
        s"${r.getAs[String]("tok")}: excess beyond the 32N/w Markov bound")
    }
    // merge correctness: the same grid must emerge from any partitioning
    // (elementwise-sum merge is associative/commutative)
    val baseline = rows.map(r =>
      (r.getAs[String]("tok"), r.getAs[Long]("n_exact"))).toSeq
    for (p <- Seq(1, 7)) {
      val sp = spark.newSession()
      sp.conf.set("spark.sql.shuffle.partitions", p)
      val again = Sketches.cmsQ(sp, sfDir).collect().map(r =>
        (r.getAs[String]("tok"), r.getAs[Long]("n_exact"))).toSeq
      assert(again == baseline, s"CMS output changed at $p partitions")
      assert(Sketches.cmsQ(sp, sfDir).collect()
        .forall(_.getAs[Int]("est_within_bound") == 1))
    }
  }

  // --- Profile.bins (equal-frequency binning) ------------------------------

  test("bins: quartile bins are equal-frequency within interpolation slack") {
    val rows = Profile.binsQ(spark, sfDir).collect()
    val byFlag = rows.groupBy(_.getAs[String]("l_returnflag"))
    byFlag.foreach { case (flag, bins) =>
      assert(bins.length == 4, s"$flag must fill all 4 bins")
      val ns = bins.map(_.getAs[Long]("n"))
      val total = ns.sum
      ns.foreach(n => assert(math.abs(n - total / 4.0) <= total * 0.02 + 2,
        s"$flag bins $ns are not ~25% each"))
    }
  }

  test("sorted neighbors: pairs are in-window, within distance, and complete for one block") {
    import spark.implicits._
    val rows = Fuzzy.sortedNeighborsQ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("dist") <= 1)
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
    }
    // brute-force one block: every sorted pair within window 3 and
    // lev <= 1 must appear (restricted to the LIMIT 500 dump range)
    val names = graft.Tables.t(spark, sfDir, "customer")
      .select($"c_name").collect().map(_.getString(0))
      .filter(_.startsWith("Customer#000000")).sorted
    val expected = (for {
      i <- names.indices
      j <- (i + 1) to math.min(i + 3, names.length - 1)
      if levDist(names(i), names(j)) <= 1
    } yield (names(i), names(j))).toSet
    val last = rows.map(r => (r.getString(0), r.getString(1))).max
    val got = rows.map(r => (r.getString(0), r.getString(1))).toSet
    val ord = implicitly[Ordering[(String, String)]]
    val inRange = expected.filter(p => ord.lteq(p, last))
    assert(inRange.subsetOf(got), s"missing ${(inRange -- got).take(3)}")
  }

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("bloom fp audit: bit accounting and false-positive rate obey the filter identities") {
    val r = Sketches.bloomFpQ(spark, sfDir).collect().head
    val m = r.getAs[Long]("m_bits"); val k = r.getAs[Long]("k_hashes")
    val bits = r.getAs[Long]("bits_set"); val nTrain = r.getAs[Long]("n_train")
    assert(bits <= math.min(m, k * nTrain))
    assert(bits >= 1)
    assert(r.getAs[Long]("n_false_pos") <= r.getAs[Long]("n_test"))
    // observed FP rate within a loose band of the (load)^k theory:
    // small n_test, so allow 0..5x the expectation plus slack
    val load = bits.toDouble / m
    val pTheory = math.pow(load, k.toDouble)
    val pObs = r.getAs[Long]("n_false_pos").toDouble / r.getAs[Long]("n_test")
    assert(pObs <= 5 * pTheory + 0.1, s"observed $pObs vs theory $pTheory")
  }

  test("theta sketch: k-minima, theta, and estimates match a driver KMV recompute; error inside 3 RSE") {
    import spark.implicits._
    val r = Sketches.thetaQ(spark, sfDir).collect().head
    val k = r.getAs[Long]("k").toInt
    // driver recompute with the SAME pinned hash
    def h60(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val byYear = graft.Tables.t(spark, sfDir, "orders")
      .select(year($"o_orderdate").as("y"), $"o_custkey").collect()
      .map(x => (x.getInt(0), x.getLong(1)))
      .filter(x => x._1 == 1996 || x._1 == 1998)
      .distinct.groupBy(_._1)
    val sets = byYear.view.mapValues(_.map(_._2.toString).toSet).toMap
    val (a, b) = (sets(1996), sets(1998))
    assert(a.size >= k && b.size >= k, "fixture must fill the sketch")
    val skA = a.toSeq.map(h60).sorted.take(k)
    val skB = b.toSeq.map(h60).sorted.take(k)
    val theta = math.min(skA.last, skB.last)
    val merged = (skA ++ skB).filter(_ < theta).distinct
    val both = skA.toSet.intersect(skB.toSet).filter(_ < theta)
    assert(r.getAs[Long]("s_union") == merged.size)
    assert(r.getAs[Long]("s_both") == both.size)
    val m = 1.152921504606846976e18
    assert(math.abs(r.getAs[Double]("est_union") -
      BigDecimal(merged.size * m / theta).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
    assert(r.getAs[Long]("exact_union") == (a ++ b).size)
    assert(r.getAs[Long]("exact_inter") == a.intersect(b).size)
    // accuracy: KMV RSE ~ 1/sqrt(k-1); allow 3 RSE on this one draw
    val rse = 1.0 / math.sqrt(k - 1.0)
    assert(r.getAs[Double]("err_union") <= 3 * rse,
      s"union err ${r.getAs[Double]("err_union")} vs 3*RSE ${3 * rse}")
    assert(r.getAs[Long]("s_both") <= r.getAs[Long]("s_union"))
  }

  test("bloom tune: fp rate falls monotonically with m; theory tracks measurement") {
    val rows = Sketches.bloomTuneQ(spark, sfDir).collect()
    assert(rows.length == 4)
    val byM = rows.sortBy(_.getAs[Long]("m_bits"))
    // fill and fp must fall as m grows (same build population)
    val fills = byM.map(_.getAs[Long]("fill_bp"))
    assert(fills.zip(fills.tail).forall { case (a, b) => a >= b },
      s"fills $fills")
    val fps = byM.map(_.getAs[Long]("fp_bp"))
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b }, s"fps $fps")
    // theory fill^3 within a loose band of measured (small-n variance)
    byM.foreach { r =>
      val theo = r.getAs[Double]("theory_fp_bp")
      val meas = r.getAs[Long]("fp_bp").toDouble
      assert(meas <= theo * 5 + 100,
        s"m=${r.getAs[Long]("m_bits")}: measured $meas vs theory $theo")
    }
  }

  test("bloom join: membership accounting exact; no false negatives; fp rate near theory") {
    import spark.implicits._
    val r = Sketches.bloomJoinQ(spark, sfDir).collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val m = 131072L
    val build = graft.Tables.t(spark, sfDir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val bits = build.flatMap(k => (0 to 2).map(j => h60(s"bl$j:$k") % m))
    assert(r.getAs[Long]("bits_set") == bits.size)
    val probe = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val pass = probe.count { case (_, ck) =>
      (0 to 2).forall(j => bits(h60(s"bl$j:$ck") % m)) }
    val truth = probe.count { case (_, ck) => build(ck) }
    assert(r.getAs[Long]("n_probe") == probe.length)
    assert(r.getAs[Long]("n_pass") == pass)
    assert(r.getAs[Long]("n_true") == truth)
    assert(r.getAs[Long]("n_fp") == pass - truth, "bloom never false-negatives")
    // theory: fp ~ fill^k; allow a wide band (small-n variance)
    val fill = bits.size.toDouble / m
    val theo = math.pow(fill, 3)
    val obs = (pass - truth).toDouble / (probe.length - truth)
    assert(obs < theo * 4 + 0.01, s"observed fp $obs vs theory $theo")
  }
}
