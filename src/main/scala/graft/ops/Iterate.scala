package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Convergence-driven iterative refinement — the shared driver loop
  * behind [[Dedup.duplicateClusters]] (min-label propagation) and
  * [[Graph.pagerankConverged]] (rank iteration), and the production
  * form of any Pregel-shaped computation: iterate a distributed step
  * until a fixpoint, not for a guessed round count.
  *
  * Contract: `step` maps the current state frame to the next one and
  * MUST emit a boolean `chg` column marking rows that changed this
  * round; the fixpoint is "no row changed". The loop owns the three
  * mechanics every such computation needs at scale:
  *   - each round is EAGERLY CHECKPOINTED (`df.checkpoint`) so lineage
  *     is cut per round — the uncheckpointed variant re-executes every
  *     earlier round inside each later one (O(rounds²) joins) and its
  *     plan deepens until the optimizer chokes;
  *   - the convergence check scans the just-written checkpoint files
  *     (one cheap job), never re-executing the round's join;
  *   - non-convergence within `maxIter` THROWS — a silent partial
  *     answer is wrong (split components, unconverged ranks), and the
  *     caller knows the domain bound (graph diameter, damping-factor
  *     contraction rate) to size `maxIter` from.
  *
  * `localCheckpoint` is deliberately NOT used — its blocks bypass the
  * CacheManager and measured as a cross-query storage leak (see
  * [[Dedup.duplicateClusters]]); reliable checkpoint files live outside
  * executor storage memory. */
object Iterate {

  /** Iterate `step` from `init` until no row has `chg`, at most
    * `maxIter` rounds; returns the converged frame without `chg`. */
  def fixpoint(init: DataFrame, maxIter: Int, what: String)(
      step: DataFrame => DataFrame): DataFrame = {
    val s = init.sparkSession
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt-").toString)
    var state = init
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = step(state).checkpoint() // eager: materialize + cut lineage
      converged = next.filter(col("chg")).isEmpty // checkpoint-file scan only
      state = next.drop("chg")
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"$what did not converge within maxIter=$maxIter rounds")
    state
  }
}
