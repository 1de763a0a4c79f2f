package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Structural theorems of the selection/sampling/linkage operators —
  * properties the per-value oracle compare can't express as equalities:
  * PPS's exact sample-size invariant, greedy coverage's submodular gain
  * decay, the consistent ring's move-locality, and EM landing on the
  * supervised side of the decision boundary. All run at sf0.001 except
  * where the fixture needs sf0.01 density. */
class SelectionSpec extends AnyFunSuite with SparkSpec {

  test("systematic PPS: total hits are EXACTLY n=50 and every weight is positive") {
    val rows = Stats.ppsQ(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_hits")).sum == 50L,
      "systematic PPS must place exactly n points")
    assert(rows.forall(_.getAs[Double]("ht_weight") > 0))
    // multiplicity > 1 requires size > step = T/50, which by the
    // Horvitz–Thompson identity weight = T/(50·size) is exactly
    // weight < 1 — assertable from the output row alone
    rows.filter(_.getAs[Long]("n_hits") > 1).foreach { r =>
      assert(r.getAs[Double]("ht_weight") < 1.0,
        "a multi-hit unit must exceed the sampling step (weight < 1)")
    }
  }

  test("greedy max-coverage: marginal gains are nonincreasing (submodularity) and coverage is cumulative") {
    val got = Curate.coverageQ(spark, sfDir).collect()
    val gains = got.map(_.getAs[Long]("n_new")).toSeq
    assert(gains == gains.sortBy(-_),
      s"greedy gains must be nonincreasing: $gains")
    val cum = got.map(_.getAs[Long]("n_covered")).toSeq
    assert(cum == gains.scanLeft(0L)(_ + _).tail,
      "cumulative coverage must equal the gain prefix sums")
  }

  test("consistent ring: every moved key lands on the new node; counts conserve") {
    val rows = Shard.ringQ(spark, sfDir).collect()
    val byNode = rows.map(r => r.getAs[String]("node") -> r).toMap
    rows.filter(_.getAs[String]("node") != "n8").foreach { r =>
      assert(r.getAs[Long]("n_moved_in") == 0L,
        s"${r.getAs[String]("node")} gained keys on a grow — ring locality broken")
    }
    assert(byNode("n8").getAs[Long]("n_moved_in") ==
      byNode("n8").getAs[Long]("n_after"),
      "all of the new node's keys must be moves")
    assert(rows.map(_.getAs[Long]("n_before")).sum ==
      rows.map(_.getAs[Long]("n_after")).sum,
      "grows must conserve the key population")
  }

  test("EM linkage weights land on the supervised side: close-agreement patterns positive, diff patterns negative") {
    // sf0.01: the sf0.001 part vocabulary is too small for stable EM
    val em = Fuzzy.emQ(spark, "/root/testdata/sf0.01").collect()
    em.foreach { r =>
      val w = r.getAs[Double]("em_weight")
      if (r.getAs[String]("name_lvl") == "diff")
        assert(w < 0, s"diff pattern scored $w — EM inverted")
      else assert(w > 0,
        s"${r.getAs[String]("name_lvl")} pattern scored $w — EM inverted")
    }
    val fs = Fuzzy.fellegiSunterQ(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getAs[String]("name_lvl"), r.getAs[Long]("tok1_agree"))
        -> r.getAs[Double]("fs_weight")).toMap
    // sign agreement with the label-supervised weights on shared patterns
    em.foreach { r =>
      val k = (r.getAs[String]("name_lvl"), r.getAs[Long]("tok1_agree"))
      fs.get(k).foreach { sup =>
        assert(sup.sign == r.getAs[Double]("em_weight").sign,
          s"EM and supervised FS disagree on the sign of $k")
      }
    }
  }
}
