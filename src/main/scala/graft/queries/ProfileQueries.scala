package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-quality plumbing: column profiling (the first thing any
  * ingest pipeline runs over a new 100 TB drop) and Z-order clustering
  * (the write-layout primitive behind data-skipping file layouts à la
  * Delta/Iceberg OPTIMIZE ZORDER).
  */
object ProfileQueries {
  import RefQueries.table

  private case class ColSpec(name: String, numeric: Boolean, sel: Column)

  /** `etl_profile` — one row per orders column: non-null count, exact
    * distinct count, min/max. Numerics report min_num/max_num (DOUBLE —
    * min/max of doubles is exact selection, not summation, so it's
    * bit-stable); strings report min_str/max_str; the timestamp is
    * profiled through an explicit `yyyy-MM-dd HH:mm:ss` rendering whose
    * lexicographic order IS chronological order, dodging engine-specific
    * timestamp-to-string casts.
    *
    * Scale: ALL columns profile in ONE pass — the table is melted to
    * (col_idx, value) long format (posexplode of a 6-struct array, a
    * narrow map), then TWO ordinary hash aggregates: per-(col, value)
    * counts (map-side combine collapses each partition to its distinct
    * values before the only shuffle), then per-col rollup where
    * `n_distinct` is a plain `count` of the already-distinct groups.
    * No `Expand`: the multi-`countDistinct` single-aggregate spelling
    * plans 6× the input rows through the shuffle (one Expand branch per
    * distinct column — measured 4.1 s vs 1.5 s in-sweep for this
    * spelling at sf0.1; the residual 1.5 s is the 6× melt before the
    * first map-side combine), and the union-of-per-column-aggregates
    * spelling scans the table once per column; at 100 TB either
    * difference is the whole game. Profiles that can tolerate estimates
    * swap in the HLL of SketchQueries.olapHllDistinct and keep a single
    * aggregate.
    *
    * EMPTY-INPUT SHAPE: an empty orders table yields ZERO rows (the
    * melt emits nothing), not one zero-count row per column as the
    * pre-round-11 single-aggregate spelling did — callers needing
    * per-column rows on empty input right-join onto the literal
    * col_name list.
    */
  def etlProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val specs = Seq(
      ColSpec("o_orderkey", numeric = true, col("o_orderkey").cast("double")),
      ColSpec("o_custkey", numeric = true, col("o_custkey").cast("double")),
      ColSpec("o_orderstatus", numeric = false, col("o_orderstatus")),
      ColSpec("o_totalprice", numeric = true, col("o_totalprice")),
      ColSpec("o_orderdate", numeric = false,
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")),
      ColSpec("o_orderpriority", numeric = false, col("o_orderpriority")))

    val names = array(specs.map(s => lit(s.name)): _*)
    val melted = table(spark, sfDir, "orders")
      .select(posexplode(array(specs.map { s =>
        struct(
          s.sel.isNotNull.as("nn"),
          (if (s.numeric) s.sel else lit(null).cast("double")).as("vnum"),
          (if (s.numeric) lit(null).cast("string") else s.sel).as("vstr"))
      }: _*)).as(Seq("idx", "v")))
    val perValue = melted
      .groupBy(col("idx"), col("v.nn").as("nn"),
        col("v.vnum").as("vnum"), col("v.vstr").as("vstr"))
      .agg(count(lit(1)).as("c"))
    perValue.groupBy("idx")
      .agg(
        sum(when(col("nn"), col("c")).otherwise(0L)).as("n_nonnull"),
        count(when(col("nn"), lit(1))).as("n_distinct"),
        min("vnum").as("min_num"), max("vnum").as("max_num"),
        min("vstr").as("min_str"), max("vstr").as("max_str"))
      .select(element_at(names, col("idx") + 1).as("col_name"),
        col("n_nonnull"), col("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  val etlProfileSql: String = {
    val cols = Seq(
      ("o_orderkey", "CAST(o_orderkey AS DOUBLE)", true),
      ("o_custkey", "CAST(o_custkey AS DOUBLE)", true),
      ("o_orderstatus", "o_orderstatus", false),
      ("o_totalprice", "o_totalprice", true),
      ("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')", false),
      ("o_orderpriority", "o_orderpriority", false))
    cols.map { case (name, sel, numeric) =>
      val (mnN, mxN, mnS, mxS) =
        if (numeric) (s"MIN($sel)", s"MAX($sel)", "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"MIN($sel)", s"MAX($sel)")
      s"""SELECT '$name' AS col_name, COUNT($sel) AS n_nonnull,
         |       COUNT(DISTINCT $sel) AS n_distinct,
         |       $mnN AS min_num, $mxN AS max_num,
         |       $mnS AS min_str, $mxS AS max_str
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** `etl_zorder` — 20-bit Morton (Z-order) interleave of
    * (l_partkey mod 1024, l_suppkey mod 1024): bit b of each key lands
    * at output bits 2b / 2b+1, so sorting by the z-value clusters rows
    * that are close in BOTH dimensions. The gated output is the first
    * 100 distinct key pairs in z order — the exact order a
    * `repartitionByRange(z).sortWithinPartitions(z)` write would lay
    * files out in, which is what makes min/max data skipping work for
    * queries filtering on either key.
    *
    * The interleave is a 20-term integer sum built column-side (no
    * lambda, fully codegen) — `((k DIV 2^b) % 2) * 2^(2b(+1))` per bit.
    *
    * Scale: narrow map + TakeOrderedAndProject here; the real write
    * path is a range repartition on z (one shuffle) followed by a
    * sorted write — both linear, no coordination beyond range-boundary
    * sampling.
    */
  def etlZorder(spark: SparkSession, sfDir: String): DataFrame = {
    def interleave(p: Column, s: Column): Column =
      (0 until 10).map { b =>
        shiftright(p, b) % 2 * (1L << (2 * b)) +
          shiftright(s, b) % 2 * (1L << (2 * b + 1))
      }.reduce(_ + _)

    table(spark, sfDir, "lineitem")
      .select(
        (col("l_partkey").cast("long") % 1024).as("p"),
        (col("l_suppkey").cast("long") % 1024).as("s"))
      .distinct()
      .withColumn("z", interleave(col("p"), col("s")))
      .orderBy("z", "p", "s")
      .limit(100)
  }

  val etlZorderSql: String =
    """WITH k AS (
      |  SELECT DISTINCT CAST(l_partkey AS BIGINT) % 1024 AS p,
      |         CAST(l_suppkey AS BIGINT) % 1024 AS s
      |  FROM lineitem
      |), z AS MATERIALIZED (
      |  SELECT p, s,
      |         CAST(list_sum(list_transform(range(0, 10), b ->
      |           (p >> b) % 2 * (CAST(1 AS BIGINT) << (2 * b))
      |           + (s >> b) % 2 * (CAST(1 AS BIGINT) << (2 * b + 1))
      |         )) AS BIGINT) AS z
      |  FROM k
      |)
      |SELECT p, s, z FROM z ORDER BY z, p, s LIMIT 100""".stripMargin

  // ---- schema-on-read type inference ----------------------------------

  /** `etl_type_inference` — the type sniffer a landing pipeline runs
    * over an untyped (all-string) drop before declaring a schema: per
    * column, how many non-null values parse as integer / double / date,
    * and the inferred type under the standard promotion rules (all
    * ints → bigint; ints+decimals → double; all date-shaped →
    * timestamp; otherwise string). Exercised over a string-rendered
    * view of orders plus a NULL-heavy column (nullif on a status
    * value), so null exclusion and mixed-parse demotion both trigger.
    * Regexes are dialect-neutral (no lookarounds, both engines' RE2/
    * PCRE subsets agree); the timestamp renders through the explicit
    * `yyyy-MM-dd HH:mm:ss` format (the etl_profile doctrine), never an
    * engine-specific cast.
    *
    * Scale: one pass — the columns unpivot row-side (`stack`, a narrow
    * generator) into (col_name, val) and one hash aggregate keyed by
    * column name counts every class; no second scan per column.
    */
  def etlTypeInference(spark: SparkSession, sfDir: String): DataFrame = {
    val src = table(spark, sfDir, "orders").select(
      col("o_orderkey").cast("string").as("c_key"),
      col("o_totalprice").cast("string").as("c_price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("c_date"),
      col("o_orderpriority").as("c_prio"),
      when(col("o_orderstatus") === "O", lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("c_status"))
    val long = src.select(expr(
      "stack(5, 'c_key', c_key, 'c_price', c_price, 'c_date', c_date, " +
        "'c_prio', c_prio, 'c_status', c_status) AS (col_name, val)"))
    val isInt = col("val").rlike("^[+-]?[0-9]+$")
    val isDouble = col("val")
      .rlike("^[+-]?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$")
    val isDate = col("val")
      .rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}( [0-9:]+)?$")
    long.groupBy("col_name").agg(
        count(lit(1)).as("n"),
        count(when(col("val").isNull, lit(1))).as("n_null"),
        count(when(isInt, lit(1))).as("n_int"),
        count(when(isDouble, lit(1))).as("n_double"),
        count(when(isDate, lit(1))).as("n_date"))
      .withColumn("n_nonnull", col("n") - col("n_null"))
      .withColumn("inferred",
        when(col("n_nonnull") === 0, "unknown")
          .when(col("n_int") === col("n_nonnull"), "bigint")
          .when(col("n_double") === col("n_nonnull"), "double")
          .when(col("n_date") === col("n_nonnull"), "timestamp")
          .otherwise("string"))
      .select("col_name", "n", "n_null", "n_int", "n_double", "n_date",
        "inferred")
      .orderBy("col_name")
  }

  val etlTypeInferenceSql: String =
    """WITH src AS MATERIALIZED (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS c_key,
      |         CAST(o_totalprice AS VARCHAR) AS c_price,
      |         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS c_date,
      |         o_orderpriority AS c_prio,
      |         nullif(o_orderstatus, 'O') AS c_status
      |  FROM orders
      |), long AS (
      |  SELECT 'c_key' AS col_name, c_key AS val FROM src
      |  UNION ALL SELECT 'c_price', c_price FROM src
      |  UNION ALL SELECT 'c_date', c_date FROM src
      |  UNION ALL SELECT 'c_prio', c_prio FROM src
      |  UNION ALL SELECT 'c_status', c_status FROM src
      |), agg AS (
      |  SELECT col_name, COUNT(*) AS n,
      |         COUNT(CASE WHEN val IS NULL THEN 1 END) AS n_null,
      |         COUNT(CASE WHEN regexp_matches(val, '^[+-]?[0-9]+$') THEN 1 END) AS n_int,
      |         COUNT(CASE WHEN regexp_matches(val, '^[+-]?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$') THEN 1 END) AS n_double,
      |         COUNT(CASE WHEN regexp_matches(val, '^[0-9]{4}-[0-9]{2}-[0-9]{2}( [0-9:]+)?$') THEN 1 END) AS n_date
      |  FROM long GROUP BY col_name
      |)
      |SELECT col_name, n, n_null, n_int, n_double, n_date,
      |       CASE WHEN n - n_null = 0 THEN 'unknown'
      |            WHEN n_int = n - n_null THEN 'bigint'
      |            WHEN n_double = n - n_null THEN 'double'
      |            WHEN n_date = n - n_null THEN 'timestamp'
      |            ELSE 'string' END AS inferred
      |FROM agg ORDER BY col_name""".stripMargin

  // ---- referential-integrity audit ------------------------------------

  /** `etl_fk_check` — referential-integrity audit, the join-key
    * companion to `etl_fd_check`: for each declared foreign key, the
    * child row count, the count of orphans (child keys with no parent),
    * and distinct orphan keys. The five declared relationships cover
    * the full star (lineitem→orders/part/supplier, orders→customer,
    * customer→nation); a healthy corpus reports zeros, and the gate
    * pins that zeros are COMPUTED, not assumed.
    *
    * Scale: one left-anti-shaped aggregate per relationship — child
    * keys pre-aggregate to distinct before probing the parent (the
    * orphan join is key-cardinality, not row-cardinality), then one
    * broadcast-back count. All five run as independent pipelines.
    */
  def etlFkCheck(spark: SparkSession, sfDir: String): DataFrame = {
    def check(fk: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val keys = child.groupBy(col(childKey).as("k"))
        .agg(count(lit(1)).as("n_rows"))
      val orphans = keys.join(
        parent.select(col(parentKey).as("k")).distinct(), Seq("k"),
        "left_anti")
      val tot = keys.agg(sum("n_rows").as("n_child"))
      orphans
        .agg(coalesce(sum("n_rows"), lit(0L)).as("n_orphan_rows"),
          count(lit(1)).as("n_orphan_keys"))
        .crossJoin(broadcast(tot))
        .select(lit(fk).as("fk"), col("n_child"), col("n_orphan_rows"),
          col("n_orphan_keys"),
          (col("n_orphan_rows") === 0).as("intact"))
    }
    val li = table(spark, sfDir, "lineitem")
    val o = table(spark, sfDir, "orders")
    val c = table(spark, sfDir, "customer")
    check("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(check("lineitem.l_partkey -> part", li, "l_partkey",
        table(spark, sfDir, "part"), "p_partkey"))
      .unionByName(check("lineitem.l_suppkey -> supplier", li, "l_suppkey",
        table(spark, sfDir, "supplier"), "s_suppkey"))
      .unionByName(check("orders.o_custkey -> customer", o, "o_custkey",
        c, "c_custkey"))
      .unionByName(check("customer.c_nationkey -> nation", c, "c_nationkey",
        table(spark, sfDir, "nation"), "n_nationkey"))
      .orderBy("fk")
  }

  val etlFkCheckSql: String = {
    def one(fk: String, child: String, ck: String, parent: String,
        pk: String): String =
      s"""SELECT '$fk' AS fk,
         |       CAST((SELECT COUNT(*) FROM $child) AS BIGINT) AS n_child,
         |       CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS n_orphan_rows,
         |       COUNT(*) AS n_orphan_keys,
         |       COALESCE(SUM(n_rows), 0) = 0 AS intact
         |FROM (
         |  SELECT $ck AS k, COUNT(*) AS n_rows FROM $child GROUP BY $ck
         |) keys
         |WHERE k NOT IN (SELECT $pk FROM $parent)""".stripMargin
    Seq(
      one("customer.c_nationkey -> nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      one("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      one("lineitem.l_partkey -> part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      one("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      one("orders.o_custkey -> customer", "orders", "o_custkey",
        "customer", "c_custkey")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY fk")
  }

  // ---- functional-dependency audit ------------------------------------

  /** `etl_fd_check` — functional-dependency audit, the schema-discovery
    * companion to `etl_constraints`: for each candidate A → B, how many
    * LHS groups exist, how many are violated (|distinct B| > 1 within a
    * group), the worst group's RHS cardinality, and whether the FD
    * holds. The candidate set mixes true key FDs (orderkey → custkey,
    * nationkey → regionkey), a real composite-key FD at line grain, and
    * deliberately false hypotheses (custkey → orderstatus, suppkey →
    * returnflag) so both outcomes are exercised.
    *
    * Scale: one hash aggregate per candidate — groupBy(LHS) with a
    * count_distinct(RHS), then an O(groups) rollup; candidates run as
    * independent narrow pipelines unioned at the end (each is
    * map-side-combinable; nothing joins, nothing collects). Exact
    * count_distinct per group is the contract here — the approx variant
    * for trillion-group tables is `etl_profile_approx`'s HLL doctrine.
    */
  def etlFdCheck(spark: SparkSession, sfDir: String): DataFrame = {
    def check(fd: String, df: DataFrame, lhs: Seq[String], rhs: String)
        : DataFrame =
      df.groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("k"))
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("k") > 1, lit(1))).as("n_violating"),
          max(col("k")).as("max_rhs"))
        .select(lit(fd).as("fd"), col("n_groups"), col("n_violating"),
          col("max_rhs"), (col("n_violating") === 0).as("holds"))
    val orders = table(spark, sfDir, "orders")
    val li = table(spark, sfDir, "lineitem")
    val nation = table(spark, sfDir, "nation")
    check("orders: o_orderkey -> o_custkey", orders,
        Seq("o_orderkey"), "o_custkey")
      .unionByName(check("orders: o_custkey -> o_orderstatus", orders,
        Seq("o_custkey"), "o_orderstatus"))
      .unionByName(check("nation: n_nationkey -> n_regionkey", nation,
        Seq("n_nationkey"), "n_regionkey"))
      .unionByName(check("lineitem: (l_orderkey, l_linenumber, l_partkey, l_suppkey) -> l_quantity",
        li, Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        "l_quantity"))
      .unionByName(check("lineitem: l_suppkey -> l_returnflag", li,
        Seq("l_suppkey"), "l_returnflag"))
      .orderBy("fd")
  }

  val etlFdCheckSql: String = {
    def one(fd: String, from: String, lhs: String, rhs: String): String =
      s"""SELECT '$fd' AS fd, COUNT(*) AS n_groups,
         |       COUNT(CASE WHEN k > 1 THEN 1 END) AS n_violating,
         |       CAST(MAX(k) AS BIGINT) AS max_rhs,
         |       COUNT(CASE WHEN k > 1 THEN 1 END) = 0 AS holds
         |FROM (SELECT COUNT(DISTINCT $rhs) AS k FROM $from GROUP BY $lhs)""".stripMargin
    Seq(
      one("orders: o_orderkey -> o_custkey", "orders",
        "o_orderkey", "o_custkey"),
      one("orders: o_custkey -> o_orderstatus", "orders",
        "o_custkey", "o_orderstatus"),
      one("nation: n_nationkey -> n_regionkey", "nation",
        "n_nationkey", "n_regionkey"),
      one("lineitem: (l_orderkey, l_linenumber, l_partkey, l_suppkey) -> l_quantity",
        "lineitem", "l_orderkey, l_linenumber, l_partkey, l_suppkey",
        "l_quantity"),
      one("lineitem: l_suppkey -> l_returnflag", "lineitem",
        "l_suppkey", "l_returnflag")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  /** `etl_partition_skew` — the pre-flight report for choosing a
    * partition/bucket/join key at scale: for each candidate key column
    * (orderkey, partkey, suppkey over lineitem), the key cardinality,
    * the heaviest key's row count, its ppm share of the table, and the
    * max/mean skew ratio in ppm — the number that predicts straggler
    * tasks BEFORE a 100 TB shuffle is launched (SkewJoin's histogram
    * pass is the runtime cousin; this is the offline audit). Only the
    * max COUNT is reported (unique regardless of which key attains
    * it), so the report needs no tie-break.
    *
    * Scale: one hash aggregate per candidate (map-side combined), then
    * an O(1)-row max_by rollup — key-cardinality frames only.
    */
  def etlPartitionSkew(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val li = RefQueries.table(spark, sfDir, "lineitem")
    def report(keyCol: String): DataFrame = {
      val counts = li.groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("c"))
      counts.agg(
        lit(keyCol).as("key_column"),
        count(lit(1)).as("n_keys"),
        sum("c").as("n_rows"),
        max("c").as("max_key_rows"))
        .withColumn("max_share_ppm",
          expr("max_key_rows * 1000000L div n_rows"))
        .withColumn("skew_ratio_ppm",
          expr("max_key_rows * n_keys * 1000000L div n_rows"))
    }
    report("l_orderkey")
      .unionByName(report("l_partkey"))
      .unionByName(report("l_suppkey"))
      .orderBy("key_column")
  }

  val etlPartitionSkewSql: String = {
    def one(keyCol: String): String =
      s"""SELECT '$keyCol' AS key_column,
         |       CAST(COUNT(*) AS BIGINT) AS n_keys,
         |       CAST(SUM(c) AS BIGINT) AS n_rows,
         |       CAST(MAX(c) AS BIGINT) AS max_key_rows,
         |       CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS max_share_ppm,
         |       CAST(MAX(c) * COUNT(*) * 1000000 // SUM(c) AS BIGINT)
         |         AS skew_ratio_ppm
         |FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY $keyCol)""".stripMargin
    Seq(one("l_orderkey"), one("l_partkey"), one("l_suppkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_column")
  }
}
