package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the batch CDC primitive: classify every key as
  * `added` / `removed` / `changed` between two snapshots of the same
  * table (unchanged keys drop out). This is how warehouse pipelines
  * reconcile a re-extracted source against yesterday's load, validate a
  * backfill, or derive a changelog where the source system has none
  * (the reference's append-only loads — load_data.py:210 — are exactly
  * the regime that needs a diff downstream, since reruns duplicate).
  *
  * Plan shape: ONE full-outer shuffle join hash-partitioned by the key
  * columns, then a narrow null-safe compare — both sides are
  * table-sized, so nothing broadcasts and nothing collects; at 100 TB
  * this is the canonical co-partitioned reconcile (bucket both
  * snapshots by the key to make it exchange-free, as join_bucketed
  * proves). Presence is detected with explicit marker literals, NOT
  * key-null checks on the compare columns, so all-NULL compare values
  * can't masquerade as absence; equality is `<=>` (null-safe), so
  * NULL→value and value→NULL both classify as `changed`.
  *
  * For very wide tables, pass a single precomputed row-hash as the one
  * compare column (xxhash64 over the value columns) — same plan, O(1)
  * compare per row; the spelled-out column list here keeps old/new
  * values in the output, which the changelog consumer usually wants.
  */
object TableDiff {

  /** Diff `after` against `before` on `keys`, comparing `compare`
    * columns. Output: keys, change_type ∈ {added, removed, changed},
    * then `b_<col>` / `a_<col>` old/new value pairs.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    val b = before
      .select((keys.map(col) ++ compare.map(c => col(c).as(s"b_$c"))): _*)
      .withColumn("b_present", lit(1))
    val a = after
      .select((keys.map(col) ++ compare.map(c => col(c).as(s"a_$c"))): _*)
      .withColumn("a_present", lit(1))
    val same = compare.map(c => col(s"b_$c") <=> col(s"a_$c")).reduce(_ && _)
    b.join(a, keys, "full_outer")
      .withColumn("change_type",
        when(col("b_present").isNull, "added")
          .when(col("a_present").isNull, "removed")
          .when(!same, "changed"))
      .where(col("change_type").isNotNull)
      .select((keys.map(col) :+ col("change_type")) ++
        compare.flatMap(c => Seq(col(s"b_$c"), col(s"a_$c"))): _*)
  }
}
