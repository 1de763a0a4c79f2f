package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the SparkEntry query registry itself — the
  * driver's entire correctness gate keys off these maps, so registry
  * drift (a shadowed name, a query without an oracle) silently weakens
  * the gate without failing any operator test. */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _])] = Seq(
    "Relational" -> graft.queries.Relational.queries,
    "Windows" -> graft.queries.Windows.queries,
    "SetOpsScalars" -> graft.queries.SetOpsScalars.queries,
    "Nested" -> graft.queries.Nested.queries,
    "AsOf" -> graft.ops.AsOf.queries,
    "Affinity" -> graft.ops.Affinity.queries,
    "Behavior" -> graft.ops.Behavior.queries,
    "Cdc" -> graft.ops.Cdc.queries,
    "IntervalJoin" -> graft.ops.IntervalJoin.queries,
    "Classify" -> graft.ops.Classify.queries,
    "Cluster" -> graft.ops.Cluster.queries,
    "Colloc" -> graft.ops.Colloc.queries,
    "Curate" -> graft.ops.Curate.queries,
    "Dedup" -> graft.ops.Dedup.queries,
    "SpanRemoval" -> graft.ops.SpanRemoval.queries,
    "MinHashTune" -> graft.ops.MinHashTune.queries,
    "Drift" -> graft.ops.Drift.queries,
    "Fuzzy" -> graft.ops.Fuzzy.queries,
    "LabelNoise" -> graft.ops.LabelNoise.queries,
    "Graph" -> graft.ops.Graph.queries,
    "HeavyHitters" -> graft.ops.HeavyHitters.queries,
    "Sketches" -> graft.ops.Sketches.queries,
    "Validate" -> graft.ops.Validate.queries,
    "Index" -> graft.ops.Index.queries,
    "Skew" -> graft.ops.Skew.queries,
    "Spatial" -> graft.ops.Spatial.queries,
    "Shard" -> graft.ops.Shard.queries,
    "Stats" -> graft.ops.Stats.queries,
    "Similarity" -> graft.ops.Similarity.queries,
    "Centroids" -> graft.ops.Centroids.queries,
    "EmbedStats" -> graft.ops.EmbedStats.queries,
    "Skyline" -> graft.ops.Skyline.queries,
    "Retrieval" -> graft.ops.Retrieval.queries,
    "Winnow" -> graft.ops.Winnow.queries,
    "Preference" -> graft.ops.Preference.queries,
    "Isotonic" -> graft.ops.Isotonic.queries,
    "Patterns" -> graft.ops.Patterns.queries,
    "Pca" -> graft.ops.Pca.queries,
    "Pii" -> graft.ops.Pii.queries,
    "Profile" -> graft.ops.Profile.queries,
    "Quantize" -> graft.ops.Quantize.queries,
    "Repair" -> graft.ops.Repair.queries,
    "Text" -> graft.ops.Text.queries,
    "TimeSeries" -> graft.ops.TimeSeries.queries,
    "Multimodal" -> graft.ops.Multimodal.queries,
    "EventStreams" -> graft.streaming.EventStreams.queries)

  test("no query name is registered by two modules (Map ++ would silently shadow)") {
    val all = modules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dupes = all.groupBy(_._1).filter(_._2.size > 1)
      .map { case (q, ms) => s"$q <- ${ms.map(_._2).mkString(",")}" }
    assert(dupes.isEmpty, s"shadowed query names: ${dupes.mkString("; ")}")
    assert(all.size == SparkEntry.queries.size,
      "merged registry lost entries to shadowing")
  }

  test("every registered query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without oracle (driver downgrades to rows-only): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }
}
