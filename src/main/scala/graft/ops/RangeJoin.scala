package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: all (point, interval) pairs with
  * `lo <= p < hi`. Spark plans the naive `ON lo <= p AND p < hi` as a
  * nested-loop (broadcast or cartesian) — quadratic work and a scale
  * killer when neither side is tiny.
  *
  * Spelling: BINNING. Pick a bin width `w`; an interval [lo, hi) covers
  * bins floor(lo/w)..floor(hi/w) (explode — an interval contributes
  * span/w rows), a point lives in exactly ONE bin floor(p/w). The join
  * becomes a plain equi-join on the bin id, re-checked with the exact
  * containment predicate. Each qualifying pair is emitted exactly once
  * (the point's single bin), so no dedup pass is needed.
  *
  * Cost: |points| + |intervals|·(span/w + 1) rows through one hash
  * equi-join — shuffled on bin id when both sides are big, broadcast
  * when the exploded interval side is small (Catalyst decides from
  * stats). Pick `w` near the median interval span: smaller w multiplies
  * interval replication, larger w turns bins into mini cross-products.
  * Both failure modes degrade gracefully — the result stays exact for
  * ANY positive w; this is the same replicate-and-recheck shape as the
  * skew-salt and LSH-band operators in this package.
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing the point
    * (`lo <= p < hi`). Column names must not collide (rename first —
    * it's a projection). Output: all point columns + all interval
    * columns, one row per qualifying pair.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val collisions = points.columns.toSet intersect intervals.columns.toSet
    require(collisions.isEmpty, s"rename colliding columns first: $collisions")

    val binned = points.withColumn("__rj_bin",
      floor(col(pointCol) / binWidth))
    // floor(hi/w) can be one phantom bin (empty when hi sits exactly on
    // a bin boundary) — harmless, the containment recheck removes it
    val exploded = intervals.withColumn("__rj_bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))

    binned.join(exploded, "__rj_bin")
      .where(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__rj_bin")
  }
}
