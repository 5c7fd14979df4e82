package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.RefQueries

/** Bucketed-table layout pins.
  *
  * 1. The whole point of the layout: a join of two tables bucketed on
  *    their join keys with equal bucket counts runs with ZERO Exchange
  *    in the executed plan — the write paid the shuffle once.
  * 2. Layout is never a semantic change: the co-bucketed join's rows
  *    equal the plain parquet join's rows exactly.
  * 3. Mismatched bucket counts lose the property (the guard a caller
  *    needs to understand when choosing the layout constant): Spark
  *    re-shuffles at least one side.
  */
class BucketedTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writePair(buckets: Int, rightBuckets: Int = -1): Unit = {
    BucketedTables.writeBucketed(
      RefQueries.table(spark, TestSpark.Sf0001, "orders")
        .select("o_orderkey", "o_orderpriority"),
      "bkt_spec_orders", "o_orderkey", buckets)
    BucketedTables.writeBucketed(
      RefQueries.table(spark, TestSpark.Sf0001, "lineitem")
        .select("l_orderkey", "l_extendedprice"),
      "bkt_spec_lineitem", "l_orderkey",
      if (rightBuckets > 0) rightBuckets else buckets)
  }

  test("co-bucketed join executes with zero Exchange") {
    writePair(buckets = 4)
    val joined = BucketedTables.cobucketedJoin(spark,
      "bkt_spec_orders", "bkt_spec_lineitem", "o_orderkey", "l_orderkey")
    joined.collect() // AQE finalizes the plan on execution
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"),
      "co-bucketed equal-count join must not shuffle either side:\n" +
        plan.take(2000))
  }

  test("bucketed layout is not a semantic change") {
    writePair(buckets = 4)
    val got = BucketedTables.cobucketedJoin(spark,
        "bkt_spec_orders", "bkt_spec_lineitem", "o_orderkey", "l_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .collect()
    val want = RefQueries.table(spark, TestSpark.Sf0001, "orders")
      .join(RefQueries.table(spark, TestSpark.Sf0001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .collect()
    assert(got.sameElements(want))
  }

  test("writeBucketed recovers an orphaned warehouse location") {
    // a managed table's directory can outlive its catalog entry (prior
    // JVM's leavings): saveAsTable refuses to adopt it, so writeBucketed
    // clears the unclaimed location first — pin the recovery
    import org.apache.hadoop.fs.Path
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new Path(wh, "bkt_spec_orphan")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(loc, "stale"))
    assert(!spark.catalog.tableExists("bkt_spec_orphan"))
    BucketedTables.writeBucketed(
      RefQueries.table(spark, TestSpark.Sf0001, "region")
        .select("r_regionkey", "r_name"),
      "bkt_spec_orphan", "r_regionkey", buckets = 2)
    assert(spark.table("bkt_spec_orphan").count() > 0)
  }

  test("mismatched bucket counts re-shuffle (the layout-constant guard)") {
    writePair(buckets = 4, rightBuckets = 3)
    val joined = BucketedTables.cobucketedJoin(spark,
      "bkt_spec_orders", "bkt_spec_lineitem", "o_orderkey", "l_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      "a 4-vs-3 bucket join cannot be exchange-free:\n" + plan.take(2000))
  }
}
