package graft.ops

import graft.ops.Persist.PersistOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Minimum spanning forest via BORŮVKA — the distributed MST algorithm
  * (each component picks its cheapest outgoing edge; components merge;
  * repeat). Component count at least halves per round, so O(log n)
  * rounds regardless of graph shape — the reason Borůvka (1926!) is the
  * parallel-MST workhorse where Prim and Kruskal are inherently
  * sequential scans.
  *
  * Determinism: weights are made UNIQUE by embedding the canonical
  * endpoint pair into low-order bits (w = cost·2²⁰ + a·2¹⁰ + b), which
  * makes the MST itself unique — so the output is a function of the
  * data and two engines computing "an MST" must agree exactly. Requires
  * node ids < 1024 and cost < 2⁴²; callers with wider domains swap the
  * packing for a DECIMAL key, same contract.
  *
  * Scale: per round, one join of the edge list against the node-sized
  * label vector (crossing-edge detection), one min-by-weight aggregate
  * keyed by component, and one label refresh through
  * [[ConnectedComponents.resolve]] over the accumulated tree (tree
  * edges number < n). Nothing driver-side except the O(1) crossing
  * count; every round's state is truncated via [[Persist.truncate]].
  * Handles
  * disconnected inputs naturally (the result is a spanning FOREST —
  * the loop stops when no crossing edges remain).
  */
object Mst {

  /** @param nodes one column `node` (long)
    * @param edges `src`, `dst`, `cost` (long); direction ignored,
    *              parallel edges collapse to the min cost
    * @return the unique min spanning forest as (`a`, `b`, `cost`),
    *         a < b
    */
  def boruvka(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 32): DataFrame = {
    val spark = nodes.sparkSession
    val nodeIds = nodes.select(col("node").cast("long").as("node"))
      .distinct().truncateLineage(true)
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"),
        col("cost").cast("long").as("cost"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(min("cost").as("cost"))
      .withColumn("w",
        col("cost") * 1048576L + col("a") * 1024L + col("b"))
      .truncateLineage(true)

    var tree = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cost",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType))))
    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      val labels =
        if (round == 0) nodeIds.withColumn("comp", col("node"))
        else nodeIds
          .join(ConnectedComponents.resolve(tree, "a", "b")
            .select(col("doc_id").as("node"), col("cluster")),
            Seq("node"), "left")
          .select(col("node"),
            coalesce(col("cluster"), col("node")).as("comp"))
      val lab = labels.truncateLineage(true)
      val crossing = und
        .join(lab.select(col("node").as("a"), col("comp").as("compA")), "a")
        .join(lab.select(col("node").as("b"), col("comp").as("compB")), "b")
        .where(col("compA") =!= col("compB"))
        .truncateLineage(true)
      if (crossing.isEmpty) done = true
      else {
        val e = struct(col("w"), col("a"), col("b"), col("cost"))
        val picks = crossing.select(col("compA").as("comp"), e.as("e"))
          .unionByName(crossing.select(col("compB").as("comp"), e.as("e")))
          .groupBy("comp").agg(min(col("e")).as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"),
            col("e.cost").as("cost"), col("e.w").as("w"))
          .distinct()
        val nextTree = tree.unionByName(picks).truncateLineage(true)
        Bridge.unpersistLocalCheckpoint(tree)
        tree = nextTree
      }
      Bridge.unpersistLocalCheckpoint(lab)
      Bridge.unpersistLocalCheckpoint(crossing)
      round += 1
    }
    if (!done) throw new IllegalStateException(
      s"Borůvka did not converge in $maxRounds rounds")
    tree.select("a", "b", "cost")
  }
}
