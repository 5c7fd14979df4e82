package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 operator pins: bucketed DBSCAN's subset/monotonicity
  * contract against the exact spelling (independent of the DuckDB
  * oracle, which checks value equality — these check the STRUCTURAL
  * claims the scaladoc makes about the blocking trade).
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf001

  private lazy val exact: Map[Long, (Long, String, Option[Long])] =
    queries.SimilarityQueries.simDbscan(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  private lazy val bucketed: Map[Long, (Long, String, Option[Long])] =
    queries.SimilarityQueries.simDbscanBucketed(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  test("bucketed DBSCAN covers the same point set") {
    assert(bucketed.keySet == exact.keySet)
    assert(bucketed.nonEmpty)
  }

  test("bucketed neighbor counts are lower bounds of exact counts") {
    // candidate pairs are a subset of the exact ε-pairs, so every
    // bucketed degree is ≤ the exact degree — the scaladoc's
    // "neighbor counts are lower bounds" claim, point by point
    for ((id, (nb, _, _)) <- bucketed)
      assert(nb <= exact(id)._1, s"vec $id: bucketed degree $nb > exact")
  }

  test("bucketed core implies exact core (demotion is one-directional)") {
    for ((id, (_, role, _)) <- bucketed if role == "core")
      assert(exact(id)._2 == "core",
        s"vec $id: bucketed core but exact ${exact(id)._2}")
  }

  test("exact noise stays noise under bucketing") {
    // fewer candidate pairs can only demote, never promote
    for ((id, (_, role, _)) <- exact.toSeq if role == "noise")
      assert(bucketed(id)._2 == "noise",
        s"vec $id: exact noise but bucketed ${bucketed(id)._2}")
  }

  test("bucketing retains a usable core fraction at gate scale") {
    val exactCores = exact.count(_._2._2 == "core")
    val keptCores = bucketed.count { case (id, (_, r, _)) =>
      r == "core" && exact(id)._2 == "core" }
    // multi-probe (nProbe=4) must keep a substantive share of cores —
    // the single-probe spelling kept 10/259 and was rejected for it
    assert(exactCores > 0)
    assert(keptCores * 2 >= exactCores,
      s"only $keptCores of $exactCores exact cores survived bucketing")
  }

  test("agreement crosstab totals the corpus and is consistent") {
    val rows = queries.SimilarityQueries
      .simDbscanBucketedAgreement(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == exact.size.toLong)
    for ((re, rb, n, same) <- rows) {
      assert(same <= n, s"($re,$rb): same_cluster $same > n $n")
      // an exact-noise point has NULL cluster on both sides only if the
      // bucketed side is noise too — checked above; here: noise/noise
      // cells agree fully (NULL <=> NULL)
      if (re == "noise" && rb == "noise") assert(same == n)
    }
    // crosstab must reproduce the per-point maps
    val fromMaps = exact.keySet.groupBy(id => (exact(id)._2, bucketed(id)._2))
      .view.mapValues(_.size.toLong).toMap
    assert(rows.map(t => (t._1, t._2) -> t._3).toMap == fromMaps)
  }
}
