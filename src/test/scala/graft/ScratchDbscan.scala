package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import graft.ops.{ConnectedComponents, Similarity}

/** Dev-only stage-timing for the bucketed DBSCAN path. */
object ScratchDbscan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = queries.RefQueries.table(spark, sf, "embeddings")
    noop(emb)
    val eps2Q = 145000000L; val minPts = 8

    def tail(base: DataFrame, half: DataFrame): DataFrame = {
      val pairs = half.unionByName(half.select(col("q").as("p"), col("p").as("q"))).cache()
      val cnt = pairs.groupBy("p").agg(count(lit(1)).as("nn"))
      val deg = base
        .join(cnt.withColumnRenamed("p", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("nn"), lit(0L)).as("n_neighbors"))
        .withColumn("is_core", col("n_neighbors") + 1 >= minPts).cache()
      val coreIds = deg.where(col("is_core")).select("vec_id")
      val coreEdges = pairs
        .join(coreIds.select(col("vec_id").as("p")), "p")
        .join(coreIds.select(col("vec_id").as("q")), "q")
        .where(col("p") < col("q"))
      val coreLab = ConnectedComponents.resolve(coreEdges, "p", "q").withColumnRenamed("doc_id", "vec_id")
      val coreCluster = coreIds.join(coreLab, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("cluster"), col("vec_id")).as("cluster"))
      val borderLab = pairs
        .join(coreCluster.select(col("vec_id").as("q"), col("cluster").as("qcluster")), "q")
        .groupBy("p").agg(min("qcluster").as("bcluster"))
      deg.join(coreCluster, Seq("vec_id"), "left")
        .join(borderLab.withColumnRenamed("p", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), col("n_neighbors"),
          when(col("is_core"), "core").when(col("bcluster").isNotNull, "border")
            .otherwise("noise").as("role"),
          when(col("is_core"), col("cluster")).otherwise(col("bcluster")).as("cluster"))
        .orderBy("vec_id")
    }

    def quantOf() = emb.select(col("vec_id").as("n_id"), Similarity.quantize(col("embedding")).as("cv"))
      .withColumn("cn", sqrt(Similarity.normQ(col("cv")).cast("double")))

    // variant C: no quant cache, probed cached WITH probes array, min-cell emission (no distinct)
    def bucketedC(): DataFrame = {
      val quant = quantOf()
      val n = quant.count()
      val cells = Similarity.dbscanNCells(n)
      val cents = quant.orderBy("n_id").limit(cells).select(col("n_id"), col("cv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      val cm = org.apache.spark.sql.graft.Bridge.column(Literal.create(
        cents.map(_._2.toSeq).toSeq, ArrayType(ArrayType(LongType))))
      val cnorm = org.apache.spark.sql.graft.Bridge.column(Literal.create(
        cents.map { case (_, cv) => math.sqrt(cv.map(x => x.toDouble * x).sum) }.toSeq,
        ArrayType(DoubleType)))
      val probed = quant.where(col("cn") > 0)
        .withColumn("nq", Similarity.normQ(col("cv")))
        .withColumn("probes", graft.functions.LongArrayProbeCells
          .probeCells(col("cv"), cm, cnorm, 6))
        .withColumn("cell", explode(col("probes")))
        .select("n_id", "cv", "nq", "probes", "cell")
        .cache()
      val a = probed.select(col("cell"), col("n_id").as("p"), col("cv").as("v1"),
        col("nq").as("n1"), col("probes").as("pr1"))
      val b = probed.select(col("cell"), col("n_id").as("q"), col("cv").as("v2"),
        col("nq").as("n2"), col("probes").as("pr2"))
      val half = a.join(b, Seq("cell")).where(col("p") < col("q"))
        .where(col("cell") === array_min(array_intersect(col("pr1"), col("pr2"))))
        .where(col("n1") + col("n2") - lit(2) * Similarity.dotQ(col("v1"), col("v2")) <= eps2Q)
        .select("p", "q").cache()
      tail(quant.select(col("n_id").as("vec_id")), half)
    }

    for (i <- 1 to 3) {
      println(s"--- pass $i")
      time("exact (query)") { noop(queries.SimilarityQueries.simDbscan(spark, sf)) }
      spark.catalog.clearCache()
      time("bucketed current (query)") { noop(queries.SimilarityQueries.simDbscanBucketed(spark, sf)) }
      spark.catalog.clearCache()
      time("bucketed C min-cell") { noop(bucketedC()) }
      spark.catalog.clearCache()
    }
  }
}
