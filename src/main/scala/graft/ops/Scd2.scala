package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a change log (key, effective
  * time, attributes) into interval-versioned history rows — each
  * version carries [valid_from, valid_to) and an is_current flag, the
  * standard shape for as-of correctness in warehouse dimensions (and
  * the batch complement of `AsOfJoin`, which queries such histories).
  *
  * Spelling: one window per key ordered by (effective time, tieBreak):
  * valid_to = lead(valid_from) — half-open intervals, so consecutive
  * versions tile the timeline with no gaps or overlaps; the last
  * version per key has NULL valid_to and is_current = true. ONE keyed
  * shuffle, no self-join; at 100 TB this is the same plan family as
  * any per-key window (sort within key partitions), and the output
  * partitions naturally by key for downstream as-of joins.
  *
  * Ties at equal (key, time) are real in change logs (two updates in
  * one batch): the tieBreak column orders them and the earlier row gets
  * a zero-length [t, t) interval — retained for audit, never matched by
  * a half-open as-of lookup, which is the standard warehouse treatment.
  */
object Scd2 {

  def buildHistory(
      changes: DataFrame,
      keys: Seq[String],
      effectiveTime: String,
      tieBreak: String): DataFrame = {
    // fail fast on collisions: silently clobbering a change log that
    // already carries SCD2 columns (re-snapshotting an existing
    // dimension) would corrupt the attribute payload
    val reserved = Set("valid_from", "valid_to", "is_current")
    val clash = changes.columns.toSet intersect reserved
    require(clash.isEmpty,
      s"change log already carries SCD2 columns: $clash — rename them first")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(effectiveTime), col(tieBreak))
    changes
      .withColumn("valid_from", col(effectiveTime))
      .withColumn("valid_to", lead(col(effectiveTime), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
