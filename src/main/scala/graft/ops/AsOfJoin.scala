package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the single most recent right
  * row with the same key whose time is `<=` the left row's time (the
  * classic "latest quote at or before each trade" operator; DuckDB and
  * kdb expose it as `ASOF JOIN`, Spark has no built-in).
  *
  * Spelling: NOT an inequality join. A naive `l JOIN r ON key AND
  * r.t <= l.t` is a quadratic blowup (every left row matches its whole
  * key-history) that Spark can only plan as a shuffled/broadcast
  * nested-loop; the classic scalable spelling is:
  *
  *   1. tag both sides and union them into one relation;
  *   2. one shuffle: partition by key, sort by (time, tag, tieBreak) —
  *      rights sort BEFORE lefts at equal time, giving `<=` semantics;
  *   3. a running `last(payload, ignoreNulls)` over rows
  *      UNBOUNDED PRECEDING..CURRENT ROW carries the latest right
  *      payload forward onto every left row;
  *   4. keep the left rows.
  *
  * Cost: ONE hash exchange of |L| + |R| rows and a per-partition sort —
  * the same shape as any keyed window; no row ever meets more than its
  * own partition. The growing frame is evaluated incrementally (O(1)
  * amortized per row), so a 1000-executor run is bound by the sort, not
  * the frame. Skewed keys behave like any window skew: a single user's
  * history sorts in one task — if one key's history outgrows a task,
  * pre-split by coarse time range and as-of join the splits.
  *
  * Contract:
  *   - right payload column names must not collide with left columns
  *     (rename on the right side first — cheap, it's a projection);
  *   - ties inside the right side at equal (key, time) resolve to the
  *     greatest `rightTieBreak` value (deterministic); NULL tie-break
  *     values sort lowest (Spark ascending = nulls first), so a NULL
  *     ordinal loses to any non-NULL one at the same (key, time);
  *   - left rows with no prior right row keep NULL payload columns
  *     (left-outer semantics; filter payload IS NOT NULL for inner).
  */
object AsOfJoin {

  /** Backward as-of: latest right at-or-before each left row (ties at
    * equal (key, time) resolve to the GREATEST tie-break).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightTieBreak, forward = false)

  /** Forward as-of: EARLIEST right at-or-after each left row — the
    * mirror operator ("next fill at or after each order"). Ties at
    * equal (key, time) resolve to the LEAST tie-break (the first row
    * the forward scan meets). Same single-shuffle union+window
    * spelling, with the frame flipped to CURRENT..UNBOUNDED FOLLOWING
    * and `first(ignoreNulls)` instead of `last`.
    */
  def leftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightTieBreak, forward = true)

  /** Nearest as-of: the closest right row in EITHER direction (pandas
    * merge_asof direction='nearest'). Distance ties between a prior
    * and a following right resolve BACKWARD (the at-or-before row —
    * so an exact-time match always wins with gap 0); within a
    * direction, ties keep each direction's own convention (backward:
    * greatest tie-break; forward: least).
    *
    * Still ONE shuffle: rights sort before lefts (the backward
    * convention), and the same sorted partition serves two frames —
    * `last(ignoreNulls)` over UNBOUNDED..CURRENT for the prior row and
    * `first(ignoreNulls)` over CURRENT+1..UNBOUNDED for the following
    * one (equal-time rights live in the preceding frame only, which is
    * exactly right: they'd win the tie anyway at distance 0). The
    * winner is chosen per left row by integer gap comparison on the
    * carried right-time field.
    */
  def leftAsOfNearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val collisions = rightPayload.toSet intersect leftCols.toSet
    require(collisions.isEmpty,
      s"rename right payload columns colliding with left: $collisions")
    val tieType = right.select(col(rightTieBreak)).schema.head.dataType
    require(
      tieType != org.apache.spark.sql.types.NullType &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tieType),
      s"rightTieBreak '$rightTieBreak' has non-orderable type $tieType — " +
        "use a type Spark can sort for deterministic ties")

    // carry the right TIME inside the struct so the gap compare can
    // read it back on the left rows
    val payloadStruct = struct(
      (rightPayload.map(col) :+ col(rightTime).as("__asof_t")): _*)
    val payloadType = right.select(payloadStruct.as("p")).schema("p").dataType

    val rightTagged = right.select(
      col(rightKey).as("__asof_key"),
      col(rightTime).as("__asof_time"),
      lit(0).as("__asof_tag"),
      col(rightTieBreak).as("__asof_ord"),
      payloadStruct.as("__asof_payload"))
    val leftTagged = left.select(
      (leftCols.map(col) :+
        col(leftKey).as("__asof_key")) ++ Seq(
        col(leftTime).as("__asof_time"),
        lit(1).as("__asof_tag"),
        lit(null).cast(tieType).as("__asof_ord"),
        lit(null).cast(payloadType).as("__asof_payload")): _*)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    val ord = Window.partitionBy("__asof_key")
      .orderBy(col("__asof_time"), col("__asof_tag"), col("__asof_ord"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(1, Window.unboundedFollowing)

    val pb = col("__asof_pb")
    val pf = col("__asof_pf")
    val gapB = col("__asof_time") - pb.getField("__asof_t")
    val gapF = pf.getField("__asof_t") - col("__asof_time")
    val chosen =
      when(pb.isNull, pf)
        .when(pf.isNull, pb)
        .when(gapB <= gapF, pb)
        .otherwise(pf)
    val carried = unioned
      .withColumn("__asof_pb", last(col("__asof_payload"), ignoreNulls = true).over(wBack))
      .withColumn("__asof_pf", first(col("__asof_payload"), ignoreNulls = true).over(wFwd))
      .where(col("__asof_tag") === 1)
      .withColumn("__asof_win", chosen)
    val projected: Seq[Column] =
      leftCols.map(col) ++ rightPayload.map(p => col(s"__asof_win.$p").as(p))
    carried.select(projected: _*)
  }

  /** Backward as-of with a MAX-GAP tolerance (pandas merge_asof
    * `tolerance`): a prior row older than `tolerance` time units is no
    * match — its payload columns become NULL, preserving left-outer
    * semantics. Semantically equal to post-filtering the plain backward
    * join on gap: the latest prior row is also the NEAREST prior row,
    * so if it exceeds the tolerance no other prior row can qualify.
    * That makes this a zero-extra-shuffle wrapper: same single
    * union+window pass, one null-out projection on top.
    *
    * `rightTime` is force-included in the carried payload (it must not
    * collide with a left column) so the gap is computable on the
    * output; it stays in the result like the other payload columns.
    */
  def leftAsOfTolerance(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    val payload =
      if (rightPayload.contains(rightTime)) rightPayload
      else rightPayload :+ rightTime
    val joined = leftAsOf(left, right, leftKey, rightKey, leftTime,
      rightTime, payload, rightTieBreak)
    val keep = col(rightTime).isNotNull &&
      (col(leftTime) - col(rightTime) <= tolerance)
    val projected = left.columns.toSeq.map(col) ++
      payload.map(p => when(keep, col(p)).as(p))
    joined.select(projected: _*)
  }

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    val collisions = rightPayload.toSet intersect leftCols.toSet
    require(collisions.isEmpty,
      s"rename right payload columns colliding with left: $collisions")

    // tie-break ordering runs on the RAW column (no silent cast): a
    // lossy cast-to-long would turn e.g. a string id into NULL ordinals
    // and quietly break the documented "greatest tieBreak wins"
    // determinism. Orderability is Spark's own rule (RowOrdering), not
    // a local whitelist — structs/arrays/intervals that Spark can sort
    // are legal tie-breaks here too.
    val tieType = right.select(col(rightTieBreak)).schema.head.dataType
    // RowOrdering admits NullType (all values NULL ties "sort"), which
    // would silently void the deterministic-ties contract — reject it
    require(
      tieType != org.apache.spark.sql.types.NullType &&
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(tieType),
      s"rightTieBreak '$rightTieBreak' has non-orderable type $tieType — " +
        "use a type Spark can sort for deterministic ties")

    val payloadStruct = struct(rightPayload.map(col): _*)
    // the payload's struct type, for a typed NULL on the left rows
    val payloadType = right.select(payloadStruct.as("p")).schema("p").dataType

    // backward: rights sort BEFORE lefts at equal time ⇒ a left row
    // sees a right row with the exact same timestamp (`<=`, not `<`).
    // forward: rights sort AFTER lefts, so the CURRENT..FOLLOWING frame
    // includes equal-time rights (`>=`, not `>`).
    val rightTag = if (forward) 1 else 0
    val rightTagged = right.select(
      col(rightKey).as("__asof_key"),
      col(rightTime).as("__asof_time"),
      lit(rightTag).as("__asof_tag"),
      col(rightTieBreak).as("__asof_ord"),
      payloadStruct.as("__asof_payload"))

    val leftTagged = left.select(
      (leftCols.map(col) :+
        col(leftKey).as("__asof_key")) ++ Seq(
        col(leftTime).as("__asof_time"),
        lit(1 - rightTag).as("__asof_tag"),
        // constant ordinal on the left side: left rows never tie-break
        // against each other (the carried payload is identical), they
        // only need SOME value of the right ordinal's type for the union
        lit(null).cast(tieType).as("__asof_ord"),
        lit(null).cast(payloadType).as("__asof_payload")): _*)

    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    // backward carries the LAST prior payload (greatest ordinal wins on
    // ties via ascending ord + last); forward picks the FIRST following
    // payload (least ordinal wins via ascending ord + first)
    val w =
      if (forward)
        Window.partitionBy("__asof_key")
          .orderBy(col("__asof_time"), col("__asof_tag"), col("__asof_ord"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy("__asof_key")
          .orderBy(col("__asof_time"), col("__asof_tag"), col("__asof_ord"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val picker =
      if (forward) first(col("__asof_payload"), ignoreNulls = true)
      else last(col("__asof_payload"), ignoreNulls = true)
    val carried = unioned
      .withColumn("__asof_last", picker.over(w))
      .where(col("__asof_tag") === (1 - rightTag))

    val projected: Seq[Column] =
      leftCols.map(col) ++ rightPayload.map(p => col(s"__asof_last.$p").as(p))
    carried.select(projected: _*)
  }
}
