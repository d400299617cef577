package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries0.Relational

/** Physical-plan audits — the "is this the plan you'd want at 100 TB"
  * checks the reference encodes as pushdown contracts
  * (/root/reference/src/source.rs:257-289 filter pushdown,
  * src/opener.rs:308-358 projection pushdown, README.md:69):
  * filters must reach the parquet scan as PushedFilters, projections must
  * shrink ReadSchema, broadcast-able dims must broadcast, and the encode
  * job must contain exactly ONE exchange. */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter reaches the parquet scan as a pushed filter") {
    val p = plan(Relational.filterEq(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(l_returnflag,R"),
      s"missing pushed filter:\n$p")
  }

  test("projection prunes the parquet ReadSchema to selected columns") {
    val p = plan(Relational.filterEq(spark, dir)) // selects 3 of 16 lineitem cols
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads more columns than the projection needs: $readSchema")
  }

  test("tiny dimension tables join via broadcast, not shuffle") {
    val p = plan(Relational.joinBroadcastDims(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("sort+limit plans as TakeOrderedAndProject (top-k, no full sort)") {
    val p = plan(Relational.sortLimit(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("encode job has exactly one exchange (the salt/bucket shuffle)") {
    val input = TokenTables.synthetic(spark, nDocs = 100, seed = 3L)
    val segs = GraftEncoder.encode(input, buckets = 4)
    val p = segs.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.trim.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly 1 Exchange, got $exchanges:\n$p")
  }

  test("decode is shuffle-free") {
    val input = TokenTables.synthetic(spark, nDocs = 100, seed = 3L)
    val segs = GraftEncoder.encode(input, buckets = 4).cache()
    try {
      val p = GraftEncoder.decode(segs).queryExecution.executedPlan.toString
      // only the operators ABOVE the cached segment scan are decode's own
      // (the InMemoryRelation section echoes the encode job's build plan)
      val decodePart = p.split("InMemoryTableScan")(0)
      assert(!decodePart.contains("Exchange"), s"decode must not shuffle:\n$decodePart")
    } finally segs.unpersist()
  }

  test("embedding near-dup plans with no cartesian product and no driver collect") {
    // audit the LAZY plan: the public entry returns a materialized
    // checkpoint whose plan is just an ExistingRDD scan
    val (df, corpus) = graft.queries0.Dedup.embeddingNearDupPlan(spark, dir)
    try {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"near-dup must be a bucketed join, not all-pairs:\n$p")
      assert(p.contains("Join"), s"expected the band self-join:\n$p")
    } finally corpus.unpersist()
  }

  test("minhash band join shuffles ids only — shingle arrays stay out of the exchange") {
    val (df, sigs) = graft.queries0.Dedup.minhashLshPlan(spark, dir)
    try {
    val p = plan(df)
    // every Exchange above the band join must carry only narrow columns;
    // the shingles arrays join back AFTER the distinct. If "shingles"
    // appears in an hashpartitioning exchange together with band/bh, the
    // slim-join contract broke.
    val badExchange = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("bh") && l.contains("shingles"))
    assert(!badExchange, s"shingle payloads ride the band-join shuffle:\n$p")
    // the audit must not be vacuous: the lazy plan really contains the join
    assert(p.contains("Join"), s"expected the band join in the audited plan:\n$p")
    } finally sigs.unpersist()
  }

  test("mem-table query scans the in-memory relation, not parquet") {
    val (df, cached) = Relational.memTablePlan(spark, dir)
    try {
      val p = plan(df)
      assert(p.contains("InMemoryTableScan") || p.contains("TableCacheQueryStage"),
        s"expected cached scan:\n$p")
    } finally cached.unpersist()
  }

  test("whole-stage codegen is active on the aggregation query") {
    val df = Relational.aggGroup(spark, dir)
    df.collect() // AQE: codegen spans appear only in the finalized plan
    val p = df.queryExecution.executedPlan.toString
    // the compact plan string marks WholeStageCodegen spans as "*(n) "
    assert(p.contains("WholeStageCodegen") || p.contains("*(1)"),
      s"expected codegen spans:\n$p")
  }
}
