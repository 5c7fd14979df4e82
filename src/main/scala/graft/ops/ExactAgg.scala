package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The determinism-rule aggregate helpers, in ONE place: summing doubles
  * directly is order-dependent (floating-point addition is not
  * associative, and shuffle order varies run to run), so gated sums go
  * through an exact DECIMAL(18,2) accumulation and cast back — identical
  * on any partitioning, any engine. Both the relational queries
  * (RefQueries) and the streaming layer (EventAnalytics) delegate here;
  * a precision change can no longer drift between them (round-2 review
  * finding: the rule was encoded twice).
  */
object ExactAgg {

  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact-sum average: decimal-sum ÷ count, the deterministic spelling
    * of AVG for gated outputs.
    */
  def exactAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(c)
}
