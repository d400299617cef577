package graft.queries0

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational operator surface the reference exercises through its host
  * engine (SURVEY §2.B: projections, every filter form, aggregations,
  * joins of all types, windows, sorts/limits/offsets, set ops, rollup,
  * scalar functions, CTE-shaped plans) — answered with vanilla Spark
  * DataFrame primitives so Catalyst owns pushdown/pruning/join selection.
  *
  * Oracle parity rules (driver hashes values after sorting columns by name):
  *  - every computed column aliased identically on both sides;
  *  - double aggregation avoided: monetary sums go through DECIMAL(18,2)
  *    (exact, order-independent) and only then cast to DOUBLE — one exact
  *    division/cast yields bit-identical doubles in Spark and DuckDB;
  *  - counts are BIGINT on both sides (DuckDB sum(int) is HUGEINT — always
  *    cast);
  *  - ordered windows get a unique tiebreaker so row sets are deterministic.
  */
object Relational {

  /** Base-table loader. With [[graft.sources.GraftTableBridge.TableRootKey]]
    * set on the session, every entry runs against the SAME tables stored in
    * graft format through the connector (the graft-storage suite,
    * reference tpcds_bench.rs analog) — plans, filters and joins identical,
    * only the leaf scans change. */
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.conf.getOption(graft.sources.GraftTableBridge.TableRootKey) match {
      case Some(root) => graft.sources.GraftTableBridge.read(spark, s"$root/$name")
      case None => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** sum over DECIMAL(18,2), surfaced as DOUBLE — exact then one cast. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  // --- aggregation ----------------------------------------------------------

  def aggGroup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  def aggMinMax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      count(lit(1)).as("n"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))

  def aggAvgFiltered(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > lit(25.0))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_price"))

  def countDistinct0(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      count(lit(1)).as("n_orders"))

  def rollup0(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

  // --- filters ---------------------------------------------------------------

  def filterEq(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === lit("R"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  def filterRange(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_totalprice") >= lit(1000.0) && col("o_totalprice") < lit(2500.0))
      .select(col("o_orderkey"), col("o_totalprice"))

  def filterCompound(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter((col("l_returnflag") === lit("A") || col("l_linestatus") === lit("F")) &&
        !(col("l_discount") > lit(0.05)))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** IS NULL / IS NOT NULL with rows on BOTH sides: no driver table has a
    * nullable column with actual nulls, so nulls are derived in-query with
    * NULLIF (mirrors the reference's null goldens,
    * tests/predicate_pushdown.rs:258-290, which run against its two
    * deliberately-NULL fixture rows). */
  def filterIsNull(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("lang_nullable", nullif(col("lang"), lit("en")))
      .filter(col("lang_nullable").isNull && col("source").isNotNull)
      .select(col("doc_id"), col("source"))

  def filterInBetween(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase") &&
        col("value").between(10.0, 500.0) && col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  /** Prefix filter (`LIKE 'p%'` -> StringStartsWith): the shape the
    * round-5 prefix pushdown prunes on — in the graft-storage suite this
    * filter reaches the connector and skips via string min/max stats. */
  def filterPrefix(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_name").startsWith("Customer#00000001"))
      .agg(count(lit(1)).as("n"),
        dsum(col("c_acctbal")).as("sum_bal"),
        min(col("c_name")).as("first_name"),
        max(col("c_name")).as("last_name"))

  // --- projection / scalar functions -----------------------------------------

  def projScalar(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).as("name_len"),
      substring(col("p_name"), 1, 8).as("name8"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))

  def projLike(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_name"))

  def caseWhen(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("bucket",
        when(col("o_totalprice") > 300000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  def dateExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  def dateTrunc(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  // --- sort / limit / offset ---------------------------------------------------

  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  def offsetLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_custkey"))
      .offset(100)
      .limit(50)

  // --- joins -------------------------------------------------------------------

  def joinInnerAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
  }

  def joinBroadcastDims(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    // dims are tiny: explicit broadcast, no shuffle of the fact side
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"))
  }

  def joinLeftOuterHistogram(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_with_orders"))
  }

  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_without_orders"))
  }

  // --- windows -------------------------------------------------------------------

  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(spark, dir, "customer")
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rnk"))
  }

  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "orders")
      .filter(col("o_custkey") < 50)
      .withColumn("running_price",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_price"))
  }

  def windowRowNumber(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("o_orderpriority"), col("o_orderkey"), col("rn"))
  }

  // --- set ops -------------------------------------------------------------------

  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("key"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("key"))
    c.union(s).distinct()
  }

  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("key"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("key"))
    c.intersect(s)
  }

  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("key"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("key"))
    c.except(s)
  }

  // --- subquery shapes --------------------------------------------------------------

  /** Scalar-subquery shape: orders above the global average price (the
    * threshold computed exactly, then one cast — see class doc). */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val thr = o.agg((sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
      count(lit(1))).as("thr"))
    o.crossJoin(thr)
      .filter(col("o_totalprice") > col("thr"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above_avg"))
  }

  /** CTE shape: revenue per nation via two joins, reused aggregate. */
  def cteJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val n = t(spark, dir, "nation")
    val custRev = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    c.join(custRev, c("c_custkey") === custRev("o_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("nation_rev"),
        count(lit(1)).as("n_customers"))
  }

  // --- wider TPC-DS-surface operators (SURVEY §2.B rows: stddev, ROLLUP/CUBE/
  // GROUPING SETS, UNION ALL, date arith, COALESCE, LAG frames, approx) -----

  /** stddev via the exact-sums identity so Spark and DuckDB see identical
    * doubles (their native stddev_samp accumulates in different orders). */
  def stddev0(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sqrt(
          (sum(col("l_quantity").cast("decimal(18,2)") * col("l_quantity").cast("decimal(18,2)")).cast("double") -
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double") *
              sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))) /
            (count(lit(1)) - 1)).as("sd_qty"))

  def cube0(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
  }

  def unionAll0(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("key"))
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("key"))
    c.unionAll(s).groupBy(col("key")).agg(count(lit(1)).as("n"))
  }

  def dateAddCoalesce(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(coalesce(col("lang"), lit("unk")).as("lang_filled"))
      .agg(count(lit(1)).as("n"))

  def dateArith(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), date_add(col("o_orderdate"), 30).as("due_date"))
      .groupBy(year(col("due_date")).as("due_year"))
      .agg(count(lit(1)).as("n"), min(col("due_date")).as("first_due"))

  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .filter(col("o_custkey") < 30)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("prev_price"), col("next_key"))
  }

  /** Multi-statement script, result from the LAST statement — the
    * reference's q15 handling (bin/tpcds_bench.rs:496-502 splits on ';'
    * and keeps the final result). Sequential spark.sql calls over temp
    * views play the role of the statement list. */
  def multiStatement(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("ms_orders")
    t(spark, dir, "customer").createOrReplaceTempView("ms_customer")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW ms_big AS
        |SELECT o_custkey, o_totalprice FROM ms_orders WHERE o_totalprice > 200000.0""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW ms_joined AS
        |SELECT c_mktsegment, o_totalprice FROM ms_big JOIN ms_customer ON o_custkey = c_custkey""".stripMargin)
    spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM ms_joined GROUP BY c_mktsegment""".stripMargin)
  }

  /** approx_count_distinct (HLL++) asserted against the exact count. The
    * raw estimate is engine-specific (Spark HLL++ vs DuckDB's sketch), so
    * the ORACLE-COMPARABLE output is the exact count plus a boolean
    * "estimate within 5%" — the approx-quality contract itself, which both
    * engines must satisfy, rather than the nondeterministic estimate. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").agg(
      countDistinct(col("o_custkey")).as("exact_cust"),
      // rsd 0.01: a precise sketch so the 5% contract holds with margin
      // (the default 0.05 sketch can wander past 5% on small domains)
      (abs(approx_count_distinct(col("o_custkey"), 0.01) - countDistinct(col("o_custkey")))
        .cast("double") <= lit(0.05) * countDistinct(col("o_custkey")))
        .as("approx_within_5pct"))

  /** Self-join shape (reference TPC-DS q1/q30/q81: a CTE joined against an
    * aggregate of ITSELF — customers whose activity exceeds 1.2x their
    * segment's average, tpcds_bench.rs:444). */
  def joinSelf(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val co = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_orders"))
    val seg = co.groupBy(col("c_mktsegment"))
      .agg((sum(col("n_orders")).cast("double") / count(lit(1))).as("avg_n"))
    co.join(seg, Seq("c_mktsegment"))
      .filter(col("n_orders") > col("avg_n") * 1.2)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_heavy"), max(col("n_orders")).as("max_orders"))
  }

  /** In-memory table path (reference `--mem-table` loads tables into RAM
    * before the run, tpcds_bench.rs:525-536): cache + materialize, register
    * a temp view, query through SQL. Result must equal the uncached oracle. */
  def memTable(spark: SparkSession, dir: String): DataFrame = {
    val (out, cached) = memTablePlan(spark, dir)
    try {
      // answer FROM the cache, then release it — a session-lifetime cache
      // of lineitem would squat on storage memory through every later query
      val rows = out.collect()
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), out.schema)
    } finally cached.unpersist()
  }

  /** Lazy query + live cache handle (PlanAuditSpec audits that the query
    * really scans the in-memory relation; callers MUST unpersist). */
  private[graft] def memTablePlan(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // Spread the load across the executor before caching: the parquet
    // table is one input split, so the columnar-cache build (decompress +
    // re-encode every column) otherwise runs as ONE task — 2.4 s serial
    // vs ~0.3 s across cores. Real mem-table loaders parallelize the load
    // the same way; the query result is partitioning-independent.
    val df = t(spark, dir, "lineitem")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    df.count() // materialize the cache (MemTable::load analog)
    df.createOrReplaceTempView("mem_lineitem")
    spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM mem_lineitem GROUP BY l_returnflag""".stripMargin) -> df
  }

  /** The reference's literal domain is an ORC *reader* (its whole crate
    * registers an ORC FileFormat with DataFusion). Our §2 analog for "read
    * ORC" is Spark's built-in ORC source; this entry exercises it
    * round-trip — write the documents table as ORC, scan it back with a
    * projection + predicate (pushed into the ORC reader the same way the
    * reference pushes into orc-rust), aggregate — and must match the
    * DuckDB oracle computed from the original parquet. */
  def orcScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-orc-q").toString
    try {
      spark.read.parquet(s"$dir/documents.parquet")
        .write.mode("overwrite").option("compression", "snappy").orc(s"$base/docs")
      val rows = spark.read.orc(s"$base/docs")
        .filter($"n_chars" > 500)
        .groupBy($"source", $"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").cast("long").as("sum_chars"))
        .orderBy($"source", $"lang")
        .collect().toSeq // group-by-source-lang scale; materialized before temp cleanup
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_docs", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sum_chars", org.apache.spark.sql.types.LongType))))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  // --- round-5 star-schema breadth (the reference's TPC-DS plan shapes
  // graft had not shown: q27 fact⋈4-dims ROLLUP, q47/q57 window-over-join
  // running average, q10/q35 correlated EXISTS/NOT EXISTS, q2 UNION of
  // CTEs). Run in BOTH suites: parquet leaves and graft-storage leaves. ---

  /** q27 shape: the fact joined through FOUR dimension hops (orders ->
    * supplier -> nation -> region) with ROLLUP over the two outermost
    * dims. Every dimension is broadcast (the star-schema plan a 24-table
    * corpus lives on: one shuffle for the fact aggregate, zero for the
    * dim joins). */
  def starRollup(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    l.join(broadcast(o.filter(col("o_orderstatus") =!= "F")
        .select(col("o_orderkey"))), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
  }

  /** Near-table-width snowflake (q17/q25-class width): the fact chained
    * through orders->customer->nation->region AND supplier->nation plus
    * part — NINE relation instances over seven base tables (nation and
    * region join twice under aliases). One shuffle join for the
    * fact⋈orders spine; every dimension hop is broadcast, so the plan a
    * 24-table TPC-DS corpus needs (deep broadcast chains off one scan)
    * is demonstrated at this corpus's full width. */
  def snowflakeWide(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val cn = t(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rkey"))
    val cr = t(spark, dir, "region")
      .select(col("r_regionkey").as("cr_key"), col("r_name").as("cust_region"))
    val s = t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val sn = t(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val p = t(spark, dir, "part").filter(col("p_size") <= 20)
      .select(col("p_partkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(broadcast(cr), col("cn_rkey") === col("cr_key"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("cust_region"), col("supp_nation"))
      .agg(dsum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** q47/q57 shape: a running per-category average computed by a window
    * OVER a fact⋈dim join. Decimal window sum (exact, order-independent)
    * divided by the running count — one cast to double; full tiebreak
    * ordering keeps the frame deterministic. */
  def windowOverJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem").filter(col("l_quantity") >= 48.0)
    val p = t(spark, dir, "part").filter(col("p_size") === 5)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_orderkey"), col("l_linenumber"),
        (sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double") /
          count(lit(1)).over(w)).as("running_avg_qty"))
  }

  /** q10/q35 shape: correlated EXISTS + NOT EXISTS semi/anti subqueries
    * (planned as semi/anti joins; expressed as SQL so the plan carries
    * the literal correlated-subquery form). */
  def existsCorrelated(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("ec_customer")
    t(spark, dir, "orders").createOrReplaceTempView("ec_orders")
    spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM ec_customer c
        |WHERE EXISTS (SELECT 1 FROM ec_orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)
        |  AND NOT EXISTS (SELECT 1 FROM ec_orders o2
        |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** q2 shape: UNION ALL of two differently-filtered CTE aggregates over
    * one fact, tagged and re-sorted. */
  def unionCtes(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("uc_orders")
    spark.sql(
      """WITH hi AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM uc_orders WHERE o_totalprice > 250000.0 GROUP BY o_orderpriority
        |),
        |lo AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM uc_orders WHERE o_totalprice < 10000.0 GROUP BY o_orderpriority
        |)
        |SELECT 'hi' AS band, o_orderpriority, n, total FROM hi
        |UNION ALL
        |SELECT 'lo' AS band, o_orderpriority, n, total FROM lo""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_star_rollup" -> (starRollup _),
    "q_snowflake_wide" -> (snowflakeWide _),
    "q_window_over_join" -> (windowOverJoin _),
    "q_exists_correlated" -> (existsCorrelated _),
    "q_union_ctes" -> (unionCtes _),
    "q_orc_scan" -> (orcScan _),
    "q_stddev" -> (stddev0 _),
    "q_cube" -> (cube0 _),
    "q_grouping_sets" -> (groupingSets _),
    "q_union_all" -> (unionAll0 _),
    "q_coalesce" -> (dateAddCoalesce _),
    "q_date_arith" -> (dateArith _),
    "q_window_lag" -> (windowLag _),
    "q_multi_statement" -> (multiStatement _),
    "q_approx_count_distinct" -> (approxDistinct _),
    "q_agg_group" -> (aggGroup _),
    "q_agg_minmax" -> (aggMinMax _),
    "q_agg_avg_filtered" -> (aggAvgFiltered _),
    "q_count_distinct" -> (countDistinct0 _),
    "q_rollup" -> (rollup0 _),
    "q_filter_eq" -> (filterEq _),
    "q_filter_range" -> (filterRange _),
    "q_filter_compound" -> (filterCompound _),
    "q_filter_isnull" -> (filterIsNull _),
    "q_filter_in_between" -> (filterInBetween _),
    "q_filter_prefix" -> (filterPrefix _),
    "q_proj_scalar" -> (projScalar _),
    "q_proj_like" -> (projLike _),
    "q_case_when" -> (caseWhen _),
    "q_date_extract" -> (dateExtract _),
    "q_date_trunc" -> (dateTrunc _),
    "q_sort_limit" -> (sortLimit _),
    "q_offset_limit" -> (offsetLimit _),
    "q_join_inner_agg" -> (joinInnerAgg _),
    "q_join_self" -> (joinSelf _),
    "q_mem_table" -> (memTable _),
    "q_join_broadcast_dims" -> (joinBroadcastDims _),
    "q_join_left_outer_histogram" -> (joinLeftOuterHistogram _),
    "q_join_semi" -> (joinSemi _),
    "q_join_anti" -> (joinAnti _),
    "q_window_rank" -> (windowRank _),
    "q_window_running_sum" -> (windowRunningSum _),
    "q_window_row_number" -> (windowRowNumber _),
    "q_set_union" -> (setUnion _),
    "q_set_intersect" -> (setIntersect _),
    "q_set_except" -> (setExcept _),
    "q_scalar_subquery" -> (scalarSubquery _),
    "q_cte_join_agg" -> (cteJoinAgg _))

  val oracles: Map[String, String] = Map(
    "q_snowflake_wide" ->
      """SELECT cr.r_name AS cust_region, sn.n_name AS supp_nation,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 20
        |GROUP BY cr.r_name, sn.n_name""".stripMargin,
    "q_star_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus <> 'F') o
        |  ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q_window_over_join" ->
      """SELECT p_brand, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / (COUNT(*) OVER w) AS running_avg_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 48.0 AND p_size = 5
        |WINDOW w AS (PARTITION BY p_brand
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_exists_correlated" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin,
    "q_union_ctes" ->
      """WITH hi AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_totalprice > 250000.0 GROUP BY o_orderpriority
        |),
        |lo AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_totalprice < 10000.0 GROUP BY o_orderpriority
        |)
        |SELECT 'hi' AS band, o_orderpriority, n, total FROM hi
        |UNION ALL
        |SELECT 'lo' AS band, o_orderpriority, n, total FROM lo""".stripMargin,
    "q_orc_scan" ->
      """SELECT source, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars > 500 GROUP BY source, lang""".stripMargin,
    "q_stddev" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |    / (COUNT(*) - 1)) AS sd_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_cube" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q_union_all" ->
      """SELECT key, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS key FROM customer
        |  UNION ALL SELECT s_nationkey AS key FROM supplier
        |) GROUP BY key""".stripMargin,
    "q_coalesce" ->
      """SELECT COALESCE(lang, 'unk') AS lang_filled, COUNT(*) AS n
        |FROM documents GROUP BY 1""".stripMargin,
    "q_date_arith" ->
      """SELECT CAST(YEAR(o_orderdate + INTERVAL 30 DAY) AS INTEGER) AS due_year, COUNT(*) AS n,
        |  MIN(CAST(o_orderdate + INTERVAL 30 DAY AS DATE)) AS first_due
        |FROM orders GROUP BY 1""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_orderkey, 1) OVER w AS next_key
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "q_multi_statement" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 200000.0)
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_minmax" ->
      """SELECT COUNT(*) AS n, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship FROM lineitem""".stripMargin,
    "q_agg_avg_filtered" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM lineitem WHERE l_quantity > 25.0 GROUP BY l_returnflag""".stripMargin,
    "q_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders FROM orders",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_filter_eq" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_returnflag = 'R'",
    "q_filter_range" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice >= 1000.0 AND o_totalprice < 2500.0""".stripMargin,
    "q_filter_compound" ->
      """SELECT COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE (l_returnflag = 'A' OR l_linestatus = 'F') AND NOT (l_discount > 0.05)""".stripMargin,
    "q_filter_isnull" ->
      """SELECT doc_id, source FROM documents
        |WHERE NULLIF(lang, 'en') IS NULL AND source IS NOT NULL""".stripMargin,
    "q_approx_count_distinct" ->
      """SELECT COUNT(DISTINCT o_custkey) AS exact_cust,
        |  (CAST(ABS(approx_count_distinct(o_custkey) - COUNT(DISTINCT o_custkey)) AS DOUBLE)
        |   <= 0.05e0 * COUNT(DISTINCT o_custkey)) AS approx_within_5pct
        |FROM orders""".stripMargin,
    "q_join_self" ->
      """WITH co AS (
        |  SELECT c_custkey, c_mktsegment, n_orders FROM (
        |    SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
        |  ) JOIN customer ON o_custkey = c_custkey
        |),
        |seg AS (
        |  SELECT c_mktsegment, CAST(SUM(n_orders) AS DOUBLE) / COUNT(*) AS avg_n
        |  FROM co GROUP BY c_mktsegment
        |)
        |SELECT co.c_mktsegment, COUNT(*) AS n_heavy, MAX(co.n_orders) AS max_orders
        |FROM co JOIN seg ON co.c_mktsegment = seg.c_mktsegment
        |WHERE co.n_orders > seg.avg_n * 1.2e0
        |GROUP BY co.c_mktsegment""".stripMargin,
    "q_mem_table" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_filter_in_between" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE event_type IN ('click','purchase') AND value BETWEEN 10.0 AND 500.0
        |  AND value IS NOT NULL
        |GROUP BY event_type""".stripMargin,
    "q_filter_prefix" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  MIN(c_name) AS first_name, MAX(c_name) AS last_name
        |FROM customer WHERE c_name LIKE 'Customer#00000001%'""".stripMargin,
    "q_proj_scalar" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, CAST(LENGTH(p_name) AS INTEGER) AS name_len,
        |  SUBSTRING(p_name, 1, 8) AS name8, p_brand || '#' || p_type AS brand_type
        |FROM part""".stripMargin,
    "q_proj_like" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%'",
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |            WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'small' END AS bucket,
        |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_date_extract" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_date_trunc" ->
      """SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_offset_limit" ->
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey ASC LIMIT 50 OFFSET 100",
    "q_join_inner_agg" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_join_broadcast_dims" ->
      """SELECT r_name, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_join_left_outer_histogram" ->
      """SELECT n_orders, COUNT(*) AS n_customers FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) GROUP BY n_orders""".stripMargin,
    "q_join_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n_with_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_join_anti" ->
      """SELECT COUNT(*) AS n_without_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rnk
        |  FROM customer
        |) WHERE rnk <= 3""".stripMargin,
    "q_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price
        |FROM orders WHERE o_custkey < 50""".stripMargin,
    "q_window_row_number" ->
      """SELECT o_orderpriority, o_orderkey, rn FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders
        |) WHERE rn <= 5""".stripMargin,
    "q_set_union" ->
      """SELECT DISTINCT key FROM (
        |  SELECT c_nationkey AS key FROM customer
        |  UNION ALL SELECT s_nationkey AS key FROM supplier
        |)""".stripMargin,
    "q_set_intersect" ->
      "SELECT c_nationkey AS key FROM customer INTERSECT SELECT s_nationkey AS key FROM supplier",
    "q_set_except" ->
      "SELECT c_nationkey AS key FROM customer EXCEPT SELECT s_nationkey AS key FROM supplier",
    "q_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above_avg FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_cte_join_agg" ->
      """WITH cust_rev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT n_name, CAST(SUM(rev) AS DOUBLE) AS nation_rev, COUNT(*) AS n_customers
        |FROM customer JOIN cust_rev ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
}
