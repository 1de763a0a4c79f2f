package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The one cross-engine hash contract shared by dedup, splits, and
  * sampling: the first 15 hex chars of md5 parsed as a 60-bit
  * non-negative long. It is the widest hash expressible IDENTICALLY in
  * Spark (`conv(substring(md5(x), 1, 15), 16, 10)`) and the DuckDB
  * oracle (`('0x' || substr(md5(x), 1, 15))::UBIGINT::BIGINT`) — 64 bits
  * would overflow DuckDB's signed parse. Keep every derivation here so
  * the engine-equivalence contract lives in one place. */
private[graft] object Hashing {

  /** 60-bit non-negative md5-prefix hash of a column. */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** [[md5Long60]] reduced to a [0, buckets) bucket id; non-negative
    * input makes `%` and `pmod` equivalent. */
  def md5Bucket(c: Column, buckets: Int): Column =
    md5Long60(c) % buckets

  /** The 80/10/10 train/val/test assignment contract — one definition
    * shared by split construction ([[graft.ops.Text.splitAssign]]) and
    * decontamination ([[graft.ops.Dedup.contaminationQ]]), so the two
    * can never disagree about which split a document is in. */
  def splitLabel(c: Column): Column = splitLabelOf(md5Bucket(c, 100))

  /** The label thresholds alone, for callers that already hold the
    * [0,100) bucket (e.g. sequence packing derives split AND shard from
    * one hash evaluation). */
  def splitLabelOf(bucket: Column): Column =
    when(bucket < 80, lit("train")).when(bucket < 90, lit("val"))
      .otherwise(lit("test"))
}
