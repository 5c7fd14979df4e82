package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** OEWS wage-table cleaner — Spark restatement of the reference's cleaning
  * stage (reference: airflow_pipeline/pipeline/load_data.py:87-144, class
  * `Cleaner`).
  *
  * The reference cleans a scraped BLS OEWS table (all-string cells with
  * footnote prefixes `()`/`(4)`, `$`, thousands separators, and the
  * suppression sentinel `(\d+)-`) in five steps, in this exact order:
  *
  *   1. P1  column-name normalization           (load_data.py:91-103)
  *   2. P2  split `occupation_soc_code`         (load_data.py:105-109)
  *   3. R1  per-cell scrub over EVERY column    (load_data.py:111-123,138)
  *   4. R2  type coercion (nullable Int64/float)(load_data.py:125-132)
  *   5. P3  column reorder, keys first          (load_data.py:141-143)
  *
  * Everything here is metadata work (renames, driver-side) plus built-in
  * Catalyst expressions (`regexp_replace`/`when`/`try_cast`) — no UDFs, so
  * the whole clean stays inside whole-stage codegen and pushes through to
  * any number of executors untouched. At 100 TB the clean is a pure
  * narrow map: no shuffle, no skew sensitivity, embarrassingly parallel.
  */
object OewsCleaner {

  /** The seven columns the reference coerces to nullable Int64
    * (load_data.py:127). Everything else except the two key columns
    * becomes double via `to_numeric(errors="coerce")`.
    */
  val IntegerCols: Seq[String] = Seq(
    "employment", "annual_mean_wage", "annual_10th_percentile_wage",
    "annual_25th_percentile_wage", "annual_median_wage",
    "annual_75th_percentile_wage", "annual_90th_percentile_wage")

  val KeyCols: Seq[String] = Seq("soc_code", "occupation")

  /** P1 — column-name normalization (load_data.py:91-103).
    *
    * For names NOT containing "occupation" (case-insensitive) the footnote
    * suffix is dropped (text before the first '(' then trimmed); then for
    * ALL names: spaces→'_', remove ','/'('/')', "standard_error"→
    * "std_error" (before lowercasing — the raw headers are lower-case for
    * those words already), lowercase, trim.
    * `Employment per 1,000 jobs()` → `employment_per_1000_jobs`;
    * `Occupation (SOC code)` → `occupation_soc_code`.
    */
  def normalizeName(name: String): String = {
    // NOTE: trim runs AFTER spaces→'_' (a trailing space becomes a
    // trailing underscore that trim does not remove). That mirrors the
    // reference exactly — pandas applies .str.strip() last too
    // (load_data.py:102), so a dirty header fails identically in both
    // systems (downstream column lookup error), which golden parity
    // requires us to preserve rather than "fix".
    // split with limit -1: a header that IS a footnote, e.g. "(1)",
    // splits to ["", "1)"] and normalizes to "" exactly like pandas
    // name.split('(')[0] — the default limit trims empty leading
    // segments and would throw on element 0
    val base =
      if (name.toLowerCase.contains("occupation")) name
      else name.split("\\(", -1)(0).trim
    base
      .replace(" ", "_")
      .replace(",", "")
      .replace("(", "")
      .replace(")", "")
      .replace("standard_error", "std_error")
      .toLowerCase
      .trim
  }

  /** R1 — the per-cell scrub (load_data.py:111-123), the semantic core of
    * the reference. Exact behavior, per cell:
    *
    *   - NULL in, or a full match of the suppression sentinel `\(\d+\)-`
    *     (e.g. `(5)-`, `(8)-`)                          → NULL
    *   - else, if the cell contains ')': drop everything through the FIRST
    *     ')' and trim the remainder (strips footnote prefixes like `()` /
    *     `(2)`)
    *   - then remove every '$' and ','.
    *
    * Pure built-in expressions → codegen'd, no UDF. Applied to every
    * column including the key columns (the reference `applymap`s the whole
    * frame — observable: commas are stripped from occupation names).
    */
  def scrub(c: Column): Column = {
    val afterParen =
      when(instr(c, ")") > 0, trim(regexp_replace(c, "^[^)]*\\)", "")))
        .otherwise(c)
    val cleaned = regexp_replace(afterParen, "[$,]", "")
    when(c.rlike("^\\(\\d+\\)-$"), lit(null).cast(StringType))
      .otherwise(cleaned)
  }

  /** P2 — split `occupation_soc_code` (load_data.py:105-109):
    * `Chief Executives (11-1011)` → occupation=`Chief Executives`,
    * soc_code=`11-1011`. Mirrors pandas `.str.split('(')`: occupation is
    * the text before the first '(' (trimmed); soc_code is the text between
    * the first and second '(' with all ')' removed (trimmed); NULL when no
    * '(' is present.
    */
  private def withSplitOccupation(df: DataFrame): DataFrame = {
    val parts = split(col("occupation_soc_code"), "\\(")
    df.withColumn("occupation", trim(parts.getItem(0)))
      .withColumn("soc_code",
        trim(regexp_replace(parts.getItem(1), "\\)", "")))
      .drop("occupation_soc_code")
  }

  /** Full clean: raw all-string OEWS frame → typed frame matching the
    * reference's `oews_cleaned` output (19 cols, keys first). R2 uses
    * `try_cast` so unparseable cells become NULL (pandas
    * `to_numeric(errors="coerce")`), ANSI-mode safe.
    */
  def clean(raw: DataFrame): DataFrame = {
    val renamed = raw.toDF(raw.columns.map(normalizeName).toIndexedSeq: _*)
    val split1 = withSplitOccupation(renamed)
    val scrubbed =
      split1.select(split1.columns.toIndexedSeq.map(c => scrub(col(c)).as(c)): _*)
    val typed = scrubbed.selectExpr(scrubbed.columns.toIndexedSeq.map { c =>
      if (IntegerCols.contains(c)) s"try_cast(`$c` AS BIGINT) AS `$c`"
      else if (KeyCols.contains(c)) s"`$c`"
      else s"try_cast(`$c` AS DOUBLE) AS `$c`"
    }: _*)
    val ordered = KeyCols ++ typed.columns.filterNot(KeyCols.contains)
    typed.select(ordered.map(col): _*)
  }
}
