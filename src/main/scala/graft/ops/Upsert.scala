package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins upsert (the MERGE shape): apply a batch of updates to a
  * base snapshot — update rows replace base rows with the same key, new
  * keys insert, unmatched base rows pass through.
  *
  * Spelling: tag + union + one per-key window keeping rank 1, i.e. ONE
  * shuffle on the key. The alternative full-outer-join spelling
  * shuffles BOTH inputs too, but then needs a coalesce per column and a
  * second pass to handle duplicate keys within the update batch; the
  * window spelling handles intra-batch duplicates for free via the
  * tie-break and keeps column handling schema-generic.
  *
  * Precedence: updates beat base; within the update batch, the row with
  * the greatest `tieBreak` value wins (a CDC batch's sequence/commit
  * number — duplicates inside ONE batch are real in at-least-once
  * ingestion). Ties on (src, tieBreak) are broken arbitrarily but
  * deterministically only if tieBreak is unique per key — pass a real
  * sequence column.
  *
  * Scale: the window is a growing-frame-free rank (no accumulation
  * state); skew follows key skew exactly like any keyed aggregate. At
  * 100 TB the base side is the big one: this plan streams it through
  * one exchange — there is no broadcast and no driver-side state.
  */
object Upsert {

  def latestWins(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      tieBreak: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schemas must match: ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc, col(tieBreak).desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__src", "__rn")
  }
}
