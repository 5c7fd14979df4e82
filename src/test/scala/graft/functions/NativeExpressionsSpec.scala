package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-cutting assertions for the native expression family: SQL
  * registration, codegen presence (the `*(n)` WholeStageCodegen marker),
  * and the element-null seams that round 2 showed can silently knock an
  * expression back to interpreted eval (see LongArrayDot.nullable).
  */
class NativeExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def qv = spark.read.parquet(s"${TestSpark.Sf001}/embeddings.parquet")
    .select(col("vec_id"), graft.ops.Similarity.quantize(col("embedding")).as("qv"))

  test("registerAll exposes the parameter-free expressions to SQL text") {
    graft.functions.registerAll(spark)
    qv.createOrReplaceTempView("ne_qv")
    val row = spark.sql(
      """SELECT long_array_dot(qv, qv) AS d,
        |       long_array_and_popcount(qv, qv) AS pc,
        |       long_array_rhp_sig(qv, 16) AS sig
        |FROM ne_qv ORDER BY vec_id LIMIT 1""".stripMargin).collect()(0)
    assert(row.getLong(0) > 0L && row.getLong(1) > 0L)
    // sig must equal the Column-API/native value for the same row
    val want = qv.orderBy("vec_id").limit(1)
      .select(LongArrayRhpSig.rhpSig(col("qv"), 16)).collect()(0).getLong(0)
    assert(row.getLong(2) == want)
  }

  test("all five expressions run inside whole-stage codegen, even with non-nullable inputs") {
    // non-nullable element arrays are exactly the case that used to
    // break codegen compilation (ev.isNull rendered as constant false)
    val nn = qv.select(col("vec_id"),
      transform(col("qv"), x => coalesce(x, lit(0L))).as("v")) // containsNull=false
    val (a, b) = graft.ops.MinHashDedup.permConstants(4)
    val plan = nn.select(
        LongArrayDot.dotQ(col("v"), col("v")).as("dot"),
        LongArrayAndPopcount.popcountAnd(col("v"), col("v")).as("pc"),
        LongArrayRhpSig.rhpSig(col("v"), 8).as("sig"),
        LongArrayMinHash.minhash(col("v"), a, b, 2147483647L).as("mh"))
      .queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.linesIterator.exists(l =>
      l.contains("long_array_dot") && l.trim.startsWith("*(")), planStr)
    // executing must not log a codegen fallback — results present and sane
    val r = nn.select(
      LongArrayDot.dotQ(col("v"), col("v")).as("dot"),
      LongArrayAndPopcount.popcountAnd(col("v"), col("v")).as("pc"),
      LongArrayRhpSig.rhpSig(col("v"), 8).as("sig"),
      LongArrayMinHash.minhash(col("v"), a, b, 2147483647L).as("mh")).collect()
    assert(r.forall(x => !x.isNullAt(0) && !x.isNullAt(3)))
  }

  test("null elements: dot/popcount null-poison; minhash skips; best-cell -1") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, null, 3L)),
      (2L, Seq[java.lang.Long](1L, 2L, 3L)))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<bigint>").as("v"))
    val (a, b) = graft.ops.MinHashDedup.permConstants(4)
    val out = df.select(col("id"),
      LongArrayDot.dotQ(col("v"), col("v")).as("dot"),
      LongArrayAndPopcount.popcountAnd(col("v"), col("v")).as("pc"),
      LongArrayMinHash.minhash(col("v"), a, b, 2147483647L).as("mh"),
      LongArrayBestCell.bestCell(col("v"),
        array(array(lit(1L), lit(1L), lit(1L))), array(lit(math.sqrt(3.0)))).as("cell"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    // minhash matches array_min semantics: null elements SKIPPED, mins
    // taken over {1, 3}
    val wantMh = (0 until 4).map(j => Seq(1L, 3L).map(x => (a(j) * x + b(j)) % 2147483647L).min)
    assert(out(0).getSeq[Long](3) == wantMh)
    assert(out(0).getInt(4) == -1) // best-cell: null element → cell -1, not null
    assert(!out(1).isNullAt(1) && out(1).getInt(4) == 0)
  }

  test("degenerate inputs match the fold spellings exactly") {
    import spark.implicits._
    // empty array: rhp fold (sequence(0,-1) null-padding) gives 0; the
    // native expression must too — NOT all-bits-set (round-2 review
    // finding). minhash fold gives an array of k nulls via array_min.
    val df = Seq((1L, Seq.empty[Long])).toDF("id", "v")
      .select(col("id"), col("v").cast("array<bigint>").as("v"))
    val (a, b) = graft.ops.MinHashDedup.permConstants(4)
    val foldSig = graft.ops.Similarity.rhpSignature(col("v"), 16)
    val row = df.select(
      LongArrayRhpSig.rhpSig(col("v"), 16).as("native_sig"),
      foldSig.as("fold_sig"),
      LongArrayMinHash.minhash(col("v"), a, b, 2147483647L).as("mh"),
      graft.ops.MinHashDedup.signature(col("v").cast("array<string>"), 4).as("mh_fold"))
      .collect()(0)
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L)
    assert(row.getSeq[Any](2) == Seq(null, null, null, null))
    assert(row.getSeq[Any](3) == Seq(null, null, null, null))
    // null element: rhp fold nulls every bit's sum → sig 0; native matches
    val dn = Seq((1L, Seq[java.lang.Long](5L, null))).toDF("id", "v")
      .select(col("v").cast("array<bigint>").as("v"))
    val rn = dn.select(
      LongArrayRhpSig.rhpSig(col("v"), 16).as("native_sig"),
      graft.ops.Similarity.rhpSignature(col("v"), 16).as("fold_sig")).collect()(0)
    assert(rn.getLong(0) == rn.getLong(1) && rn.getLong(0) == 0L)
    // NULL input: the fold's array(array_min(transform(null)), ...) is a
    // NON-null array of k null slots — the native expression matches
    // (and is therefore nullable = false)
    val nullIn = Seq(Tuple1(null: Seq[java.lang.Long])).toDF("v")
      .select(col("v").cast("array<bigint>").as("v"))
    val ni = nullIn.select(
      LongArrayMinHash.minhash(col("v"), a, b, 2147483647L).as("mh"),
      graft.ops.MinHashDedup.signature(col("v").cast("array<string>"), 4).as("mh_fold"))
      .collect()(0)
    assert(!ni.isNullAt(0) && ni.getSeq[Any](0) == Seq(null, null, null, null))
    assert(ni.getSeq[Any](0) == ni.getSeq[Any](1))
  }
}
