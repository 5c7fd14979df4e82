package graft

import org.apache.spark.sql.functions._
import graft.queries.RefQueries

object ScratchQ5 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = if (args.nonEmpty) args(0) else TestSpark.Sf001
    val got = RefQueries.q5Join(spark, sf).collect()
    val li = RefQueries.table(spark, sf, "lineitem")
    val p = RefQueries.table(spark, sf, "part")
    val want = li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("p_name"), col("p_brand"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity").collect()
    println(s"[q5] n got=${got.length} want=${want.length}")
    val i = got.indices.find(i => got(i) != want(i))
    println(s"[q5] first mismatch at $i")
    i.foreach { j =>
      println("[q5] got : " + got(j))
      println("[q5] want: " + want(j))
      if (j > 0) {
        println("[q5] got-1 : " + got(j - 1))
        println("[q5] want-1: " + want(j - 1))
      }
    }
    println("[q5] plan:\n" + RefQueries.q5Join(spark, sf).queryExecution.executedPlan.toString.take(3000))
  }
}
