package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-event cents rounding contract of the
  * `q_stream_user_totals` fold (VERDICT r14 item 5): the oracle rounds
  * each value through DuckDB's double→DECIMAL(18,2) cast, which acts on
  * the SHORTEST DECIMAL STRING of the double, half-up. The expectations
  * below were probed against DuckDB 1.x directly (builder probe,
  * 2026-08-17): `SELECT CAST(v::DOUBLE AS DECIMAL(18,2))`. The old
  * `math.round(v*100)` form agrees on every ≤2-dp value (the fixture's
  * domain) but DIVERGES on 3-dp and negative-tie values — the exact
  * failure the r14 verdict called out. */
class UserTotalsCentsSpec extends AnyFunSuite {

  test("centsOf matches the DuckDB cast contract on 2-dp fixture values") {
    Seq(0.0 -> 0L, 1.23 -> 123L, -4.56 -> -456L, 99.99 -> 9999L,
      0.01 -> 1L, 100.0 -> 10000L).foreach { case (v, want) =>
      assert(EventStreams.centsOf(v) == want, s"v=$v")
    }
  }

  test("centsOf matches DuckDB on 3-dp values where math.round(v*100) fails") {
    // (value, DuckDB CAST result in cents, what the naive form said)
    val probed = Seq(
      (1.005, 101L, 100L),  // naive rounds the binary product down
      (-2.125, -213L, -212L), // Java round is half-UP, cast is half-AWAY
      (-0.185, -19L, -18L),
      (0.185, 19L, 19L), // agrees here — string and product both round up
      (8.285, 829L, 829L))
    probed.foreach { case (v, duck, naive) =>
      assert(EventStreams.centsOf(v) == duck, s"v=$v contract")
      assert(math.round(v * 100) == naive, s"v=$v naive-form premise")
    }
    // the divergence is real: at least one probed value splits the forms
    assert(probed.exists { case (v, duck, naive) => duck != naive })
  }
}
