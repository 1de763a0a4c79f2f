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
}
