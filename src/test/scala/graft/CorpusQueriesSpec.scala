package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{EtlQueries, OlapQueries, SourceQueries, TextQueries}

/** Pins the semantic contracts of the round-6 corpus/analytics queries.
  * The driver gate proves cross-engine determinism; these prove the
  * operators compute what their contracts claim, via independent
  * driver-side recomputation on the small corpus.
  */
class CorpusQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  test("dedup_lines removes exactly the segments shared by >= 3 docs") {
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1))).toMap
    // independent recompute of the banned set
    def segsOf(toks: Array[String]): Seq[String] =
      toks.grouped(5).map(_.mkString(" ")).toSeq
    val segDocs = docs.toSeq.flatMap { case (id, toks) =>
      segsOf(toks).map(s => (s, id))
    }
    val banned = segDocs.distinct.groupBy(_._1)
      .collect { case (seg, ds) if ds.size >= 3 => seg }.toSet

    val out = TextQueries.dedupLines(spark, TestSpark.Sf001).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val segs = segsOf(docs(id))
      val expectKept = segs.filterNot(banned)
      assert(r.getAs[Long]("n_segs") == segs.length)
      assert(r.getAs[Long]("n_removed") == segs.length - expectKept.length)
      // reassembly preserves original segment order
      assert(r.getAs[String]("cleaned_text") == expectKept.mkString(" "))
    }
    // the threshold actually bites on this corpus — a no-op gate proves
    // nothing about the anti-join path
    assert(out.map(_.getAs[Long]("n_removed")).sum > 0)
  }

  test("text_repetition matches a driver-side recompute") {
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1))).toMap
    val out = TextQueries.textRepetition(spark, TestSpark.Sf001).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") == toks.length)
      val dupTok = 1.0 - toks.distinct.length.toDouble / toks.length
      assert(math.abs(r.getAs[Double]("dup_token_frac") - dupTok) < 1e-12)
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bigrams.groupBy(identity).map(_._2.size)
      val top = counts.max.toDouble / bigrams.length
      val dup = counts.filter(_ > 1).sum.toDouble / bigrams.length
      assert(math.abs(r.getAs[Double]("top_bigram_frac") - top) < 1e-12)
      assert(math.abs(r.getAs[Double]("dup_bigram_frac") - dup) < 1e-12)
    }
  }

  test("corpus_mix_temperature up-weights low-resource languages") {
    val byLang = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sel = TextQueries.corpusMixTemperature(spark, TestSpark.Sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = byLang.map { case (l, n) =>
      l -> (sel.getOrElse(l, 0L).toDouble / n)
    }
    val biggest = byLang.maxBy(_._2)._1
    val smallest = byLang.minBy(_._2)._1
    // temperature 0.5 must sample the small group at a strictly higher
    // RATE than the big one (the whole point of the rebalancing)
    assert(fracs(smallest) > fracs(biggest),
      s"rates $fracs do not up-weight $smallest over $biggest")
    fracs.values.foreach(f => assert(f <= 1.0 + 1e-9))
  }

  test("etl_pii_redact leaves no digit run of 4+ in redacted names") {
    val out = EtlQueries.etlPiiRedact(spark, TestSpark.Sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val red = r.getAs[String]("name_redacted")
      assert(!"[0-9]{4,}".r.findFirstIn(red).isDefined, s"unredacted: $red")
      assert(r.getAs[Long]("n_ids") >= 1L) // every customer name has an id
    }
  }

  test("analytics_ntile buckets are balanced within each priority") {
    val out = OlapQueries.analyticsNtile(spark, TestSpark.Sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getAs[Int]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = r.getAs[Double]("pct_rank")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(r.getAs[Double]("cume") > 0.0 && r.getAs[Double]("cume") <= 1.0)
    }
    out.groupBy(r => r.getAs[String]("o_orderpriority")).foreach {
      case (prio, rows) =>
        val sizes = rows.groupBy(_.getAs[Int]("quartile")).map(_._2.length)
        assert(sizes.max - sizes.min <= 1, s"$prio quartiles unbalanced: $sizes")
    }
  }

  test("text_vocab_encode matches a driver-side vocab + encoding recompute") {
    val docs = spark.read.parquet(s"${TestSpark.Sf001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokensOf(r.getString(1))).toMap
    val counts = docs.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val out = graft.queries.TextQueries.textVocabEncode(spark, TestSpark.Sf001)
      .collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
      val ids = toks.map(t => vocab.getOrElse(t, 0L))
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("n_oov") == ids.count(_ == 0L))
      assert(r.getAs[String]("ids_json") == ids.mkString("[", ",", "]"))
    }
  }

  test("sim_knn_classify matches an independent brute-force majority vote") {
    val emb = spark.read.parquet(s"${TestSpark.Sf001}/embeddings.parquet")
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray, r.getAs[Int]("label")))
    // replicate the operator's quantized scoring exactly (see
    // Similarity.quantize: round(x*10000) as long; cos over doubles)
    def qv(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 10000))
    val quant = emb.map { case (id, v, l) => (id, qv(v), l) }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val expected = quant.filter(_._1 % 7 == 3).map { case (qid, q, _) =>
      val nbrs = quant.filter(_._1 != qid)
        .map { case (nid, c, l) => (nid, cos(q, c), l) }
        .sortBy { case (nid, s, _) => (-s, nid) }.take(5)
      val votes = nbrs.groupBy(_._3).map { case (l, g) => (l, g.size) }
      val (predLabel, nVotes) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      qid -> (predLabel, nVotes.toLong)
    }.toMap
    val out = graft.queries.SimilarityQueries
      .simKnnClassify(spark, TestSpark.Sf001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (pl, nv) = expected(r.getAs[Long]("q_id"))
      assert(r.getAs[Int]("pred_label") == pl)
      assert(r.getAs[Long]("n_votes") == nv)
      assert((r.getAs[Long]("correct") == 1L) ==
        (r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")))
    }
  }

  test("analytics_anomaly flags exactly the 3-sigma tail per event type") {
    val ev = spark.read.parquet(s"${TestSpark.Sf001}/events.parquet")
      .selectExpr("event_id", "event_type",
        "CAST(round(value * 100) AS LONG) AS cents").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val flagged = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val n = rows.length
      val sm = rows.map(_._3).sum
      val ss = rows.map(x => x._3 * x._3).sum
      val mean = sm.toDouble / n
      val sd = math.sqrt(ss.toDouble / n - mean * mean)
      rows.filter(x => math.abs((x._3 - mean) / sd) > 3.0).map(_._1).toSeq
    }.toSet
    val out = graft.queries.OlapQueries.analyticsAnomaly(spark, TestSpark.Sf001)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(out == flagged)
    assert(out.nonEmpty) // the threshold actually fires on this data
  }

  test("analytics_funnel matches a driver-side windowed recompute") {
    val win = 24L * 3600 * 1000000
    // table(), not a raw read: it normalizes the driver's two shipped
    // ts spellings (nano-long / timestamp[us]) to the nano-long the
    // DIV-1000 arithmetic below assumes
    val ev = graft.queries.RefQueries.table(spark, TestSpark.Sf001, "events")
      .selectExpr("user_id", "event_type", "ts DIV 1000 AS t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.flatMap { case (u, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None else {
        val t1 = views.min
        val t2 = rows.filter(r => r._2 == "click" && r._3 > t1 && r._3 <= t1 + win)
          .map(_._3).minOption
        val t3 = t2.flatMap(c => rows
          .filter(r => r._2 == "purchase" && r._3 > c && r._3 <= c + win)
          .map(_._3).minOption)
        Some(u -> (t1, t2.getOrElse(-1L), t3.getOrElse(-1L),
          1L + t2.size + t3.size))
      }
    }
    val out = graft.queries.OlapQueries.analyticsFunnel(spark, TestSpark.Sf001)
      .collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (t1, t2, t3, st) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("t1_us") == t1 && r.getAs[Long]("t2_us") == t2 &&
        r.getAs[Long]("t3_us") == t3 && r.getAs[Long]("stage") == st)
    }
    // the conversion window must actually separate the stages
    val stages = out.map(_.getAs[Long]("stage")).toSet
    assert(stages.size > 1, s"degenerate funnel: all users at stage $stages")
  }

  test("etl_constraints counts real violations and real passes") {
    val out = graft.queries.EtlQueries.etlConstraints(spark, TestSpark.Sf001)
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"))).toMap
    val negBal = spark.read.parquet(s"${TestSpark.Sf001}/customer.parquet")
      .where(col("c_acctbal") < 0).count()
    val overCap = spark.read.parquet(s"${TestSpark.Sf001}/events.parquet")
      .where(col("value") > 100.0).count()
    assert(out("customer_acctbal_nonnegative")._2 == negBal && negBal > 0)
    assert(out("events_value_le_100")._2 == overCap && overCap > 0)
    assert(out("orders_custkey_fk")._2 == 0L)
    assert(out("orders_orderkey_unique")._2 == 0L)
    assert(out("orders_custkey_notnull")._2 == 0L)
    out.values.foreach { case (checked, viol) =>
      assert(checked > 0 && viol >= 0 && viol <= checked)
    }
  }

  test("source_orc_roundtrip preserves rows and declared types") {
    val out = SourceQueries.sourceOrcRoundtrip(spark, TestSpark.Sf001)
    val src = spark.read.parquet(s"${TestSpark.Sf001}/part.parquet")
      .select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
    assert(out.schema("p_size").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.count() == src.count())
    // bit-exact round trip, doubles included
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
  }
}
