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
    * 100 TB. Returns the partition count chosen, capped at [1, 20000].
    *
    * The estimate is Catalyst's logical-plan stats, with two caveats:
    * it is decompressed/pre-encoding (on-disk parquet lands well under
    * `targetBytes` — set it to ~2-3× the desired file size), and
    * without CBO column stats it is FILTER-BLIND (a selective filter
    * reports its child's size), so a filter-heavy plan over-partitions
    * toward its input size rather than producing one huge file — the
    * safe direction, but calibrate `targetBytes` against observed
    * output when the stage is a >10× reducer. Plans with NO usable
    * estimate (LogicalRDD, un-materialized caches, multi-joins — these
    * report defaultSizeInBytes ≈ Long.MaxValue or products of child
    * sizes) would pin the cap and write 20000 near-empty files, so any
    * estimate that absurdly exceeds the input partition count falls
    * back to the plan's current partitioning instead. */
  /** Sorted, range-partitioned write — the data-skipping layout: rows
    * are range-partitioned on `col` (each output file owns a disjoint
    * key range) and sorted within partitions (each parquet row group's
    * min/max stats span a narrow slice). A later `WHERE col = x` or
    * range scan then skips every file and row group whose stats exclude
    * the predicate — parquet readers do this from footer stats alone,
    * no index structure needed. At 100 TB this is the cheap 10-100×
    * scan reduction for any selective query on the layout key; the
    * cost is ONE range exchange (sampling-based, skew-tolerant) paid
    * at write time. Equivalent to a 1-column z-order. */
  def writeSorted(df: DataFrame, path: String, col: String,
                  files: Int = 8): Unit =
    df.repartitionByRange(files, df(col))
      .sortWithinPartitions(df(col))
      .write.mode("overwrite").parquet(path)

  /** Z-order clustered write — MULTI-column data skipping. A plain
    * sorted write ([[writeSorted]]) clusters one key perfectly and
    * leaves every other column's per-file stats spanning the whole
    * domain; interleaving the bit-planes of two bucketized keys orders
    * rows along a Z-curve, so each output file covers a RECTANGLE of
    * the (c1, c2) domain — per-file min/max footer stats narrow on
    * BOTH columns and selective predicates on either one skip files.
    * The standard layout for a fact queried by two independent
    * dimensions (e.g. documents by (source, lang-bucket), events by
    * (user, time)) where neither deserves the primary sort.
    *
    * Shape: one bounded min/max aggregate to fix the domains (at
    * 100 TB, pass `domains` from catalog/footer stats instead and skip
    * that scan), then a single range exchange on the z-value — the
    * same cost as a sorted write. `buckets` must be a power of two
    * (bit interleave); 16 buckets/dim → 8-bit z, 256 cells. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    files: Int = 8, buckets: Int = 16,
                    domains: Option[(Double, Double, Double, Double)] = None)
      : Unit = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val (lo1, hi1, lo2, hi2) = domains.getOrElse {
      val r = df.agg(
        min(col(c1)).cast("double"), max(col(c1)).cast("double"),
        min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    def bucket(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit(buckets - 1L), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) * buckets / span)
          .cast("long")))
    }
    val (b1, b2) = (bucket(c1, lo1, hi1), bucket(c2, lo2, hi2))
    val bits = 63 - java.lang.Long.numberOfLeadingZeros(buckets.toLong)
    val z = (0L until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(b1, i.toInt).bitwiseAND(lit(1L)),
          (2 * i + 1).toInt))
        .bitwiseOR(shiftleft(shiftright(b2, i.toInt).bitwiseAND(lit(1L)),
          (2 * i).toInt))
    }
    df.repartitionByRange(files, z).sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  def writeCompacted(df: DataFrame, path: String,
                     targetBytes: Long = 256L << 20): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val tgt = BigInt(math.max(1L, targetBytes))
    val byStats = (est + tgt - 1) / tgt
    val inputParts = df.rdd.getNumPartitions
    // a stats estimate demanding >64× the input's own task count is a
    // missing-stats sentinel bleeding through, not a real measurement
    val n =
      if (byStats > BigInt(inputParts.toLong.max(1L) * 64)) inputParts.max(1)
      else byStats.max(1).min(20000).toInt
    df.repartition(n).write.mode("overwrite").parquet(path)
    n
  }
}
