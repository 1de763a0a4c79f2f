package graft.source

import org.apache.spark.sql.DataFrame

/** Parquet sink helpers. The load-bearing piece is LAYOUT, not IO:
  * hive-style partition directories make Catalyst prune entire
  * partitions at planning time (`PartitionFilters` in the scan), so a
  * `WHERE lang = 'en'` over a 100 TB corpus opens only `lang=en/`
  * files — the difference between scanning 100 TB and scanning one
  * partition's share of it. */
object Sinks {

  /** Write as partitioned parquet (one directory level per column,
    * low-cardinality columns first). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Plain parquet snapshot (the Verify dump path uses this shape). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Size-aware compacting write: repartition to ⌈estimated bytes /
    * targetBytes⌉ output tasks before writing. A filter-heavy pipeline
    * stage otherwise inherits its input's task count and emits thousands
    * of tiny files — the small-files problem that makes the NEXT job's
    * scan planning (and any object-store listing) the bottleneck at
    * 100 TB. The estimate is Catalyst's logical-plan stats
    * (decompressed, pre-encoding), so on-disk parquet files land well
    * under `targetBytes` — set it to ~2-3× the desired file size.
    * Returns the partition count chosen, capped at [1, 20000]. */
  def writeCompacted(df: DataFrame, path: String,
                     targetBytes: Long = 256L << 20): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val tgt = BigInt(math.max(1L, targetBytes))
    val n = ((est + tgt - 1) / tgt).max(1).min(20000).toInt
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
