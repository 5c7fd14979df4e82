package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.GraphQueries

/** Round-13 operator pins: the LPA / k-core / coreness driver-local
  * replays must be label-identical to the distributed loops they
  * shortcut (the CC/SCC/pagerank doctrine, extended to the three
  * operators round 12 left unpinned — at gate scale the trade graph is
  * always under the local bound, so without these pins the distributed
  * spellings would be dead code the oracle never exercises). Also pins
  * the copurchase whale-basket cap: bounded pair counts on a synthetic
  * whale, identity on bounded baskets.
  */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def randomUndirectedAdj(seed: Int, n: Int, m: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val und = (0 until m)
      .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("x", "nbr")
  }

  test("LPA local replay == distributed argmax loop, label for label") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val bidir = randomUndirectedAdj(seed, 30, 70)
        .select(col("x").as("u"), col("nbr").as("v"))
      val nodes = (0L until 30L).toDF("node")
      val local = GraphQueries.lpaLabels(nodes, bidir, iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = GraphQueries.lpaLabels(nodes, bidir, iters = 4,
          localBound = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local.size == 30, s"seed $seed")
      assert(local == dist, s"seed $seed")
    }
  }

  test("k-core local replay == distributed peeling, member for member") {
    for (seed <- 1 to 3) {
      val adj = randomUndirectedAdj(seed, 30, 90)
      val local = GraphQueries.kcoreSurvivors(adj, k = 3, rounds = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = GraphQueries.kcoreSurvivors(adj, k = 3, rounds = 5,
          localBound = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist, s"seed $seed")
    }
  }

  test("copurchase whale-basket cap bounds pair counts, identity below cap") {
    import spark.implicits._
    // one whale (customer 1, 600 distinct parts — past the 512 cap)
    // plus two bounded baskets sharing 3 parts
    val whale = (0L until 600L).map(p => (1L, p))
    val small = Seq((2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 10L), (3L, 11L), (3L, 12L), (3L, 13L))
    val baskets = (whale ++ small).toDF("cust", "part")
    val capped = GraphQueries.copurchasePairs(baskets, minSupport = 1)
      .cache()
    val cap = GraphQueries.CopurchaseBasketCap.toLong
    // the whale keeps its cap lowest parts (0..511, which contains
    // every small-basket part), so the distinct pair universe is
    // exactly C(cap, 2) — never 600·599/2
    assert(capped.count() == cap * (cap - 1) / 2,
      "whale pair count not capped")
    // support: parts {10,11,12} in all three baskets, {x,13} pairs of
    // the small baskets in whale+cust3
    assert(capped.where(col("n_common") === 3).count() == 3L)
    assert(capped.where(col("n_common") === 2).count() == 3L)
    // the cap is deterministic low-end truncation: no part id ≥ cap
    val maxP2 = capped.agg(max("p2")).head.getLong(0)
    assert(maxP2 < cap, s"cap must keep lowest part ids, got p2=$maxP2")
    // below the cap the projection is the identity of the uncapped one
    val bounded = small.toDF("cust", "part")
    val a = GraphQueries.copurchasePairs(bounded, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = GraphQueries.copurchasePairs(bounded, 1, cap = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("katz: beta floor, attenuation ceiling, hand-computed chain") {
    val rows = GraphQueries.graphKatz(spark, TestSpark.Sf001).collect()
    assert(rows.length == 25)
    val katz = rows.map(r =>
      r.getAs[Long]("nationkey") -> r.getAs[Long]("katz")).toMap
    // beta floor: every node holds at least the injected 1e6, and the
    // geometric ceiling 1e6/(1 - alpha*maxdeg) bounds the series
    assert(katz.values.forall(_ >= 1000000L))
    assert(katz.values.forall(_ <= 3600000L),
      s"attenuation ceiling breached: ${katz.values.max}")
    // output ordered by katz desc
    val ks = rows.map(_.getAs[Long]("katz")).toSeq
    assert(ks == ks.sorted.reverse)
  }

  test("eigenvector: max-normalized, zero only for isolated nodes") {
    val rows = GraphQueries.graphEigenvector(spark, TestSpark.Sf001).collect()
    assert(rows.length == 25)
    val eig = rows.map(_.getAs[Long]("eig"))
    // max-norm rescale: the top score is exactly 1e6, all in [0, 1e6]
    assert(eig.max == 1000000L)
    assert(eig.forall(e => e >= 0L && e <= 1000000L))
  }

  test("hub cap cuts super-hub shared neighbors from candidate generation") {
    import spark.implicits._
    // star: hub 0 with 6 leaves, plus one normal edge (1,2) — with a
    // cap of 5 the hub's rows vanish from the candidate adjacency and
    // only the (1,2) edge survives; with a cap of 10 everything stays
    val star = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))) ++
      Seq((1L, 2L), (2L, 1L))
    val adj = star.toDF("x", "nbr")
    val nbrDeg = adj.groupBy("nbr").agg(count(lit(1)).as("deg"))
    val capped = GraphQueries.capHubs(adj, nbrDeg, cap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rows whose SHARED-NEIGHBOR key is the hub (nbr = 0) are cut;
    // rows pointing AT low-degree nodes survive (incl. the hub's own
    // (0, leaf) rows — leaf degrees are small)
    assert(!capped.exists(_._2 == 0L), s"hub kept: $capped")
    assert(capped.contains((1L, 2L)) && capped.contains((0L, 1L)))
    val full = GraphQueries.capHubs(adj, nbrDeg, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == star.toSet)
  }

  test("betweenness local replay == distributed pair counting; star identity") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val bidir = randomUndirectedAdj(seed, 20, 40)
        .select(col("x").as("u"), col("nbr").as("v"))
      val nodes = (0L until 20L).toDF("node")
      val local = GraphQueries.betweenness(nodes, bidir, maxRounds = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = GraphQueries.betweenness(nodes, bidir, maxRounds = 20,
          localBound = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist, s"seed $seed")
    }
    // hand-checkable star: the center carries every leaf pair exactly
    // once (sigma products 1), leaves carry nothing
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("u", "v")
    val got = GraphQueries.betweenness((0L to 4L).toDF("node"), star, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 6L * 1000000L, s"star center: ${got(0L)}")
    (1L to 4L).foreach(l => assert(got(l) == 0L, s"leaf $l"))
  }

  test("coreness local replay == distributed h-index, value for value") {
    for (seed <- 1 to 3) {
      val adj = randomUndirectedAdj(seed, 30, 90)
      val local = GraphQueries.corenessLabels(adj, rounds = 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = GraphQueries.corenessLabels(adj, rounds = 12,
          localBound = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local.nonEmpty, s"seed $seed")
      assert(local == dist, s"seed $seed")
    }
  }
}
