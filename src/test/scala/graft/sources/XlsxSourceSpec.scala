package graft.sources

import graft.TestSpark
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** S3 golden check: the pure-JDK xlsx reader against the reference's own
  * persist of the same workbook — `pd.read_excel(Skills.xlsx)` written
  * verbatim to `onet_skills_raw.parquet` (load_data.py:282-286). Every
  * cell must agree under the parquet column's type: strings verbatim,
  * numerics by exact double/long value (the raw stored text "4.12"
  * parses to the identical IEEE double openpyxl produced).
  */
class XlsxSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val XlsxPath = s"${TestSpark.RefData}/Skills.xlsx"

  test("golden: Skills.xlsx cell-for-cell equals the shipped raw parquet") {
    val sheet = XlsxSource.readRaw(XlsxPath)
    val want = spark.read.parquet(
      s"${TestSpark.RefData}/onet_skills_raw/2025-09-17/onet_skills_raw.parquet")
    assert(sheet.header == want.columns.toSeq)
    val wantRows = want.collect()
    assert(sheet.rows.length == wantRows.length) // 62,580
    val fields = want.schema.fields
    var mismatches = 0
    sheet.rows.zip(wantRows).zipWithIndex.foreach { case ((got, exp), ri) =>
      fields.zipWithIndex.foreach { case (f, ci) =>
        val g = got(ci)
        val e = exp.get(ci)
        val ok = (g, e) match {
          case (null, null) => true
          case (null, _) | (_, null) => false
          case (gs, ev) => f.dataType match {
            case StringType => gs == ev.asInstanceOf[String]
            case DoubleType => gs.toDouble == ev.asInstanceOf[Double]
            case LongType => gs.toDouble == ev.asInstanceOf[Long].toDouble
            case _ => gs == ev.toString
          }
        }
        if (!ok) {
          mismatches += 1
          if (mismatches <= 3)
            info(s"row $ri col ${f.name}: xlsx=$g parquet=$e")
        }
      }
    }
    assert(mismatches == 0, s"$mismatches cell mismatches")
  }

  test("typed read reproduces pandas dtype inference: equals raw parquet") {
    val typed = XlsxSource.readTyped(spark, XlsxPath)
    val want = spark.read.parquet(
      s"${TestSpark.RefData}/onet_skills_raw/2025-09-17/onet_skills_raw.parquet")
    assert(typed.schema.map(f => (f.name, f.dataType)) ==
      want.schema.map(f => (f.name, f.dataType)))
    assert(typed.exceptAll(want).isEmpty && want.exceptAll(typed).isEmpty)
  }

  test("full extract→transform chain from the workbook matches the cleaner golden") {
    import java.nio.file.Files
    val cfg = graft.etl.PipelineConfig(
      Files.createTempDirectory("graft-xlsx-chain").toString,
      java.time.LocalDate.parse("2025-09-17"))
    graft.etl.Pipeline.extractOnet(spark, cfg, XlsxPath)
    graft.etl.Pipeline.transformOnet(spark, cfg)
    val got = graft.etl.Pipeline.readStage(spark, cfg, "onet_skills_cleaned")
    val want = graft.etl.OnetCleaner.clean(spark.read.parquet(
      s"${TestSpark.RefData}/onet_skills_raw/2025-09-17/onet_skills_raw.parquet"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("DataFrame source: schema-on-read strings, full row count") {
    val df = XlsxSource.read(spark, XlsxPath)
    assert(df.columns.length == 15 && df.count() == 62580L)
    assert(df.schema.fields.forall(_.dataType == StringType))
    // spot-check a known header cell and that the Date column kept its
    // raw MM/YYYY string form
    assert(df.columns.head == "O*NET-SOC Code")
    val dates = df.select("Date").limit(5).collect().map(_.getString(0))
    assert(dates.forall(_.matches("\\d{2}/\\d{4}")))
  }
}
