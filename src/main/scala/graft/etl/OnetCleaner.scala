package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O*NET Skills workbook cleaner — Spark restatement of the reference's
  * skills cleaning stage (reference: airflow_pipeline/pipeline/load_data.py:
  * 216-237, class `SkillsDataLoader`).
  *
  * Two observable behaviors:
  *   - P4 column-name normalization (load_data.py:224-230): trim,
  *     spaces→'_', '-'→'_', remove '*', lowercase.
  *     `O*NET-SOC Code` → `onet_soc_code`.
  *   - R4 date parse (load_data.py:231): `Date` strings `MM/YYYY`
  *     (e.g. `08/2023`) → first-of-month timestamp; unparseable → NULL
  *     (pandas `errors="coerce"` ≙ Spark `try_to_timestamp`).
  *
  * Cell values are otherwise passed through untouched (NaN→NULL is free in
  * Spark's single-NULL model, load_data.py:223,232). A narrow, shuffle-free
  * map — scales linearly with input splits.
  */
object OnetCleaner {

  /** P4 — column-name normalization (load_data.py:224-230). */
  def normalizeName(name: String): String =
    name.trim
      .replace(" ", "_")
      .replace("-", "_")
      .replace("*", "")
      .toLowerCase

  /** Full clean: rename all columns, parse `date` in place (column order
    * unchanged — pandas assigns the parsed column back in place).
    */
  def clean(raw: DataFrame): DataFrame = {
    val renamed = raw.toDF(raw.columns.map(normalizeName).toIndexedSeq: _*)
    renamed.withColumn("date", try_to_timestamp(col("date"), lit("MM/yyyy")))
  }
}
