package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the LSH sensitivity grid the oracle can't
  * see: the theory says recall and candidate volume are both monotone
  * non-increasing in rows-per-band (collision prob per band = J^rows),
  * and every config's candidates must contain its captured pairs. */
class MinHashTuneSpec extends AnyFunSuite with SparkSpec {

  test("minhash sensitivity: grid is monotone in rows_per_band and internally consistent") {
    val rows = MinHashTune.sensitivityQ(spark, sfDir).collect()
    assert(rows.length == 4)
    val byR = rows.sortBy(_.getAs[Long]("rows_per_band"))
    byR.foreach { r =>
      assert(r.getAs[Long]("n_captured") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_captured") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("recall_bp") <= 10000L)
      assert(r.getAs[Long]("precision_bp") <= 10000L)
    }
    // more rows per band => stricter banding => fewer candidates, no
    // recall gain (same 16-lane signature, coarser partition of it)
    byR.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_candidates") <= a.getAs[Long]("n_candidates"))
      assert(b.getAs[Long]("recall_bp") <= a.getAs[Long]("recall_bp"))
    }
    // the single-row banding is recall-complete on any corpus whose
    // true pairs share at least one shingle min (J >= 0.8 guarantees it
    // up to ~1e-11 per lane); the fixture must exercise that
    assert(byR.head.getAs[Long]("recall_bp") == 10000L)
    // and the measurement must be non-vacuous
    assert(byR.head.getAs[Long]("n_true") > 0L)
  }
}
