package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the union+window as-of join:
  *   - `<=` (a right row at the exact left timestamp is visible);
  *   - ties at equal (key, time) resolve to the greatest tieBreak;
  *   - left rows before any right row keep NULL payload (left-outer);
  *   - keys never cross (a right row on another key is invisible).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("as-of picks latest prior right, <= inclusive, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 100L), // after r@50,r@100 -> sees r@100 (<= inclusive)
      (2L, "a", 60L),  // between 50 and 100 -> r@50
      (3L, "a", 10L),  // before any right -> NULL
      (4L, "b", 500L)  // key b has no rights at all -> NULL
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", 50L, 70L, 1.0),
      ("a", 100L, 71L, 2.0),
      ("a", 100L, 72L, 3.0), // same (key,time) as 71 -> tieBreak max wins
      ("c", 40L, 99L, 9.0)   // other key, never visible
    ).toDF("k", "rt", "rid", "rv")

    val out = AsOfJoin.leftAsOf(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid", "rt", "rv"), rightTieBreak = "rid")
      .orderBy("id")
      .select("id", "rid", "rt", "rv")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))

    assert(out.toSeq == Seq(
      (1L, Some(72L), Some(100L)), // <= inclusive AND tie -> max rid
      (2L, Some(70L), Some(50L)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("as-of matches a per-row brute force on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)).toDF("id", "k", "t")
    val rightRows = (1 to 200).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, 1000L + i, rnd.nextDouble()))
    val right = rightRows.toDF("k", "rt", "rid", "rv")

    val got = AsOfJoin.leftAsOf(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid"), rightTieBreak = "rid")
      .select("id", "rid").as[(Long, Option[Long])].collect().toMap

    val leftRows = left.as[(Long, String, Long)].collect()
    leftRows.foreach { case (id, k, t) =>
      val best = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(id) == best, s"row $id key $k t $t")
    }
  }

  test("forward as-of matches a per-row brute force on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)).toDF("id", "k", "t")
    val rightRows = (1 to 200).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, 1000L + i, rnd.nextDouble()))
    val right = rightRows.toDF("k", "rt", "rid", "rv")

    val got = AsOfJoin.leftAsOfForward(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid"), rightTieBreak = "rid")
      .select("id", "rid").as[(Long, Option[Long])].collect().toMap

    val leftRows = left.as[(Long, String, Long)].collect()
    leftRows.foreach { case (id, k, t) =>
      // earliest at-or-after; LEAST rid on time ties
      val best = rightRows.filter(r => r._1 == k && r._2 >= t)
        .sortBy(r => (r._2, r._3)).headOption.map(_._3)
      assert(got(id) == best, s"row $id key $k t $t")
    }
  }

  test("nearest as-of matches a per-row brute force; backward wins distance ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // coarse times force frequent exact-distance ties in both directions
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(40).toLong * 10)).toDF("id", "k", "t")
    val rightRows = (1 to 200).map(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(40).toLong * 10, 1000L + i, rnd.nextDouble()))
    val right = rightRows.toDF("k", "rt", "rid", "rv")

    val got = AsOfJoin.leftAsOfNearest(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid"), rightTieBreak = "rid")
      .select("id", "rid").as[(Long, Option[Long])].collect().toMap

    left.as[(Long, String, Long)].collect().foreach { case (id, k, t) =>
      val back = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption
      val fwd = rightRows.filter(r => r._1 == k && r._2 > t)
        .sortBy(r => (r._2, r._3)).headOption
      val best = (back, fwd) match {
        case (None, f) => f
        case (b, None) => b
        case (Some(b), Some(f)) =>
          if (t - b._2 <= f._2 - t) Some(b) else Some(f)
      }
      assert(got(id) == best.map(_._3), s"row $id key $k t $t")
    }
  }

  test("string tie-break orders on the raw column; non-orderable fails fast") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L)).toDF("id", "k", "t")
    // a long-castable string would survive the old silent cast; "z..."
    // ids would become NULL ordinals and ties would go nondeterministic
    val right = Seq(
      ("a", 100L, "z01", 1.0),
      ("a", 100L, "z09", 2.0)).toDF("k", "rt", "rid", "rv")
    val out = AsOfJoin.leftAsOf(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid", "rv"), rightTieBreak = "rid")
      .select("rid", "rv").as[(String, Double)].collect().toSeq
    assert(out == Seq(("z09", 2.0)), "greatest raw string tie-break wins")

    // arrays ARE orderable in Spark (element-wise) — the orderability
    // check delegates to RowOrdering, so an array tie-break is legal
    val rightArr = right.withColumn("arr",
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.col("rid")))
    val viaArr = AsOfJoin.leftAsOf(left, rightArr,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid", "rv"), rightTieBreak = "arr")
      .select("rid").as[String].collect().toSeq
    assert(viaArr == Seq("z09"), "array tie-break orders element-wise")

    // maps have no total order anywhere in Spark — fail fast
    val rightMap = right.withColumn("bad",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.col("rid"),
        org.apache.spark.sql.functions.col("rv")))
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(left, rightMap,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid", "rv"), rightTieBreak = "bad")
    }
    assert(ex.getMessage.contains("non-orderable"))
  }
}
