package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point must make the native kernels
  * callable from SQL text on a session built WITH the extensions and
  * no other registration call. The new session shares the suite's
  * SparkContext (builder reuses a live context), so nothing is stopped.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a withExtensions session exposes the kernels as SQL functions") {
    val shared = TestSpark.spark // ensure the context exists first
    val savedDefault = SparkSession.getDefaultSession
    val savedActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master(shared.sparkContext.master)
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      assert(s ne shared, "builder must yield a NEW session to apply extensions")

      val dot = s.sql("SELECT long_array_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d")
        .head.getLong(0)
      assert(dot == 4 + 10 + 18)

      val pc = s.sql("SELECT long_array_and_popcount(array(7L), array(5L)) AS p")
        .head.getLong(0)
      assert(pc == java.lang.Long.bitCount(7L & 5L))

      // the string kernels agree with their interpreted reference spellings
      val row = s.sql(
        """SELECT string_array_fingerprint(array('a','bc')) AS fp,
          |       string_array_simhash(array('a','bc')) AS sh""".stripMargin).head
      import org.apache.spark.sql.functions._
      val want = shared.range(1).select(
          graft.ops.TextOps.fingerprint(array(lit("a"), lit("bc"))).as("fp"))
        .head.getLong(0)
      assert(row.getLong(0) == want)
      assert(row.getLong(1) != 0L)

      // token-hash + rolling-window kernels compose in pure SQL
      val wins = s.sql(
        """SELECT long_array_rolling_hash(
          |         string_array_token_hashes(array('a','bc','a','bc')), 2) AS wh
          |""".stripMargin).head.getSeq[Long](0)
      assert(wins.length == 3, s"4 tokens, w=2 -> 3 windows, got $wins")
      assert(wins(0) == wins(2), "identical ('a','bc') windows must hash equal")
      assert(wins(0) != wins(1), "('a','bc') vs ('bc','a') must differ")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      savedDefault.foreach(SparkSession.setDefaultSession)
      savedActive.foreach(SparkSession.setActiveSession)
    }
  }
}
