package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{GraftEncoder, TokenTables}
import graft.lineage.SegmentStore

/** The DSv2 connector contract: logical TokenRow schema over the physical
  * segment table, full-read equality with the engine decode, projection
  * pruning visible in the scan description, stats-based segment skipping
  * under pushed filters (inexact: Spark re-filters, results stay exact),
  * LIMIT pushdown with early-stopping readers, header-only COUNT/MIN/MAX
  * aggregate pushdown, token-range pushdown via the post-pushdown rule,
  * and per-query DSv2 custom metrics (no cross-query statics). */
class GraftDataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-dsv2-spec").toString

  private lazy val bare: String = {
    val dir = tmp()
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
    GraftEncoder.encode(input, buckets = 4).write.parquet(s"$dir/segs")
    s"$dir/segs"
  }

  /** Range-clustered layout (the reference's `--sorted` analog): doc_id
    * ranges map to buckets so doc_id stats actually prune. */
  private lazy val clustered: String = {
    val dir = tmp()
    import spark.implicits._
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
    val rangeBuckets = 8
    val bucketed = input.map { r =>
      val id = r.doc_id.filter(_.isDigit).toLong
      val b = math.min(rangeBuckets - 1, (id * rangeBuckets / 400L).toInt)
      graft.engine.BucketedRow(r.doc_id, r.tokens, r.n_tok, r.source, b)
    }
    GraftEncoder.encodeBucketed(bucketed, rangeBuckets, tokensPerChunk = 4096)
      .write.parquet(s"$dir/segs")
    s"$dir/segs"
  }

  /** Collect `df` and return (rows, the graft custom scan metrics of the
    * executions this action ran), read back from the SQL status store —
    * the same per-query, UI-visible path a user sees (reference
    * metrics.rs:57-218 analog; replaces the r2 static LongAdders). */
  private def runWithScanMetrics(df: DataFrame): (Seq[Row], Map[String, Long]) = {
    val store = spark.sharedState.statusStore
    val before = store.executionsList().map(_.executionId).foldLeft(-1L)(math.max)
    val rows = df.collect().toSeq
    val deadline = System.currentTimeMillis() + 20000
    var metrics = Map.empty[String, Long]
    var settled = false
    while (!settled && System.currentTimeMillis() < deadline) {
      val execs = store.executionsList().filter(_.executionId > before)
      settled = execs.nonEmpty && execs.forall(_.completionTime.isDefined)
      if (settled) {
        metrics = execs.flatMap { e =>
          val vals = store.executionMetrics(e.executionId)
          e.metrics.filter(_.name.startsWith("graft"))
            .flatMap(m => vals.get(m.accumulatorId).map(v => m.name -> v.replaceAll("[^0-9-]", "")))
        }.filter(_._2.nonEmpty)
          .groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum).toMap
      } else Thread.sleep(100)
    }
    (rows, metrics)
  }

  test("format(\"graft\") full read equals the engine decode (bare layout)") {
    import spark.implicits._
    val got = spark.read.format("graft").load(bare)
      .as[graft.engine.TokenRow].collect().map(r => r.doc_id -> r).toMap
    val exp = TokenTables.synthetic(spark, nDocs = 400, seed = 42L).collect()
    assert(got.size === exp.length)
    exp.foreach { e =>
      val g = got(e.doc_id)
      assert(g.tokens.sameElements(e.tokens) && g.n_tok == e.n_tok && g.source == e.source,
        s"mismatch for ${e.doc_id}")
    }
  }

  test("columnar batches: default read plans ColumnarToRow, equals the row reader exactly") {
    import spark.implicits._
    val colDf = spark.read.format("graft").load(bare)
    colDf.collect()
    // default is the columnar reader: the executed plan fuses the batches
    // through ColumnarToRow into whole-stage codegen
    assert(colDf.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "columnar read did not plan ColumnarToRow")
    val rowDf = spark.read.format("graft").option("columnar", "false").load(bare)
    rowDf.collect()
    assert(!rowDf.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "columnar=false still planned a columnar scan")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.as[graft.engine.TokenRow].collect()
        .map(r => (r.doc_id, r.tokens.toSeq, r.n_tok, r.source)).sortBy(_._1).toSeq
    assert(key(colDf) === key(rowDf))
    // limit truncates the final batch without corrupting values
    val lim = spark.read.format("graft").load(bare).limit(7)
      .as[graft.engine.TokenRow].collect()
    assert(lim.length === 7)
    val exp = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .collect().map(r => r.doc_id -> r).toMap
    lim.foreach(g => assert(g.tokens.sameElements(exp(g.doc_id).tokens)))
    // filters stay exact through the columnar residual re-filter
    val f = spark.read.format("graft").load(bare).filter($"n_tok" > 100)
    val fr = spark.read.format("graft").option("columnar", "false").load(bare)
      .filter($"n_tok" > 100)
    assert(key(f) === key(fr))
  }

  test("SegmentStore layout reads ONLY ledger-committed partitions") {
    val dir = tmp()
    val input = TokenTables.synthetic(spark, nDocs = 200, seed = 7L)
    SegmentStore.encodeCommit(input, dir, snapshotId = 1L, buckets = 4)
    val df = spark.read.format("graft").load(dir)
    assert(df.count() === 200L)
    assert(df.select("doc_id").distinct().count() === 200L)
    // crash-window data: a bucket written WITHOUT a ledger commit must stay
    // invisible (read-committed), and not double-count rows
    val orphan = TokenTables.synthetic(spark, nDocs = 50, seed = 9L)
    GraftEncoder.encode(orphan, buckets = 1)
      .write.mode("append").parquet(s"$dir/data/snapshotId=99/bucket=0")
    assert(spark.read.format("graft").load(dir).count() === 200L,
      "uncommitted snapshot leaked into the scan")
  }

  test("projection pushdown reaches the scan (ReadSchema pruned); COUNT(*) decodes nothing") {
    val df = spark.read.format("graft").load(bare).select("doc_id", "n_tok")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("ReadSchema: struct<doc_id:string,n_tok:int>"), desc)
    assert(df.count() === 400L)
    assert(spark.read.format("graft").load(bare).count() === 400L)
  }

  test("pushed stats prune segments on a range-clustered table; results stay exact") {
    import spark.implicits._
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
    val target = input.collect().head.doc_id
    val (rows, m) = runWithScanMetrics(
      spark.read.format("graft").load(clustered).filter($"doc_id" === target))
    assert(rows.length === 1 && rows.head.getString(0) === target)
    assert(m.getOrElse("graft segments pruned (filter stats)", 0L) > 0L,
      s"expected pruned segments, metrics=$m")
    // the plan advertises the negotiation
    val desc = spark.read.format("graft").load(clustered)
      .filter($"doc_id" === target).queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters: [EqualTo(doc_id,"), desc)
    // and Spark re-filters exactly: n_tok range filter over hash buckets
    val exact = spark.read.format("graft").load(bare)
      .filter($"n_tok" > 1000).count()
    val expected = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .filter(_.n_tok > 1000).count()
    assert(exact === expected)
  }

  test("scan reports header-derived statistics; small graft tables broadcast in joins") {
    import spark.implicits._
    val stats = spark.read.format("graft").load(bare)
      .queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 100L * 1024 * 1024,
      s"stats=${stats.sizeInBytes}")
    // exact row count from the segment headers reaches the optimizer
    assert(stats.rowCount.contains(BigInt(400)), s"rowCount=${stats.rowCount}")
    // a projection skipping `tokens` drops the estimate to the metadata streams
    val slim = spark.read.format("graft").load(bare).select("doc_id", "n_tok")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(slim * 5 < stats.sizeInBytes,
      s"projected estimate $slim not ~90% below full $stats")
    val big = spark.range(100000).select($"id".cast("string").as("doc_id"))
    val joined = big.join(spark.read.format("graft").load(bare).select("doc_id", "n_tok"), "doc_id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"graft side not broadcast:\n$plan")
  }

  test("OR of point lookups composes under may-match pruning (predicate-tree conversion)") {
    import spark.implicits._
    val ids = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .collect().map(_.doc_id).sorted
    val (a, b) = (ids.head, ids.last)
    val (rows, m) = runWithScanMetrics(
      spark.read.format("graft").load(clustered)
        .filter($"doc_id" === a || $"doc_id" === b))
    assert(rows.map(_.getString(0)).toSet === Set(a, b))
    assert(m.getOrElse("graft segments pruned (filter stats)", 0L) > 0L,
      "OR of two point lookups must still prune middle segments")

    // IN-list prunes like OR-of-equalities
    val (inRows, m2) = runWithScanMetrics(
      spark.read.format("graft").load(clustered).filter($"doc_id".isin(a, b)))
    assert(inRows.map(_.getString(0)).toSet === Set(a, b))
    assert(m2.getOrElse("graft segments pruned (filter stats)", 0L) > 0L, "IN-list must prune")
  }

  test("COUNT(*) pushes to segment headers (no decode, payload pages unread)") {
    import spark.implicits._
    val df = spark.read.format("graft").load(bare)
    val counted = df.agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    val (rows, m) = runWithScanMetrics(counted)
    assert(rows.head.getLong(0) === 400L)
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)]"), s"count not pushed:\n$plan")
    assert(m.getOrElse("graft segments decoded", 0L) === 0L,
      s"pushed count must not run the row-decoding reader: $m")
    // a filtered count must NOT push (we always re-filter residually) and stays exact
    val filtered = df.filter($"n_tok" > 1000).agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    val expected = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .filter(_.n_tok > 1000).count()
    assert(filtered.collect()(0).getLong(0) === expected)
  }

  test("MIN/MAX push to segment-header stats (int and string, no row decode)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.format("graft").load(bare)
    val fused = df.agg(min("n_tok"), max("n_tok"), min("doc_id"), max("source"), count(lit(1)))
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains(
      "PushedAggregation: [MIN(n_tok), MAX(n_tok), MIN(doc_id), MAX(source), COUNT(*)]"),
      s"min/max not pushed:\n$plan")
    val (rows, m) = runWithScanMetrics(fused)
    assert(m.getOrElse("graft segments decoded", 0L) === 0L,
      s"pushed min/max must not decode rows: $m")
    // values equal the unfused query (computed through the row-decoding path)
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 42L).collect()
    assert(rows.head.getInt(0) === input.map(_.n_tok).min)
    assert(rows.head.getInt(1) === input.map(_.n_tok).max)
    assert(rows.head.getString(2) === input.map(_.doc_id).min)
    assert(rows.head.getString(3) === input.map(_.source).max)
    assert(rows.head.getLong(4) === 400L)
    // an avg blocks the push (not answerable from headers) and stays exact
    val mixed = df.agg(min("n_tok"), avg("n_tok"))
    assert(!mixed.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    assert(mixed.collect()(0).getInt(0) === input.map(_.n_tok).min)
  }

  test("LIMIT pushdown: readers stop early, partitions past the limit unplanned") {
    val df = spark.read.format("graft").load(bare).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 5"), s"limit not pushed:\n$plan")
    val (rows, m) = runWithScanMetrics(df)
    assert(rows.length === 5)
    val totalSegments = spark.read.parquet(bare).count()
    assert(m.getOrElse("graft segments decoded", Long.MaxValue) < totalSegments,
      s"limit must stop before decoding all $totalSegments segments: $m")
    assert(m.getOrElse("graft rows emitted", Long.MaxValue) < 400L,
      s"limit must stop before emitting the whole table: $m")
    // a filter keeps every partition planned (pruning is reader-side) but
    // the per-reader row cap still applies and results stay exact
    import spark.implicits._
    val lim = spark.read.format("graft").load(bare)
      .filter($"n_tok" >= 8).limit(3).collect()
    assert(lim.length === 3)
  }

  test("token-range pushdown: array predicates reach the tokens-chunk min/max skip") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftTokenRangePushdown.install(spark)
    val (lo, hi) = (50250, 50256) // rare top-of-vocab band in the zipf mixture
    val exists = spark.read.format("graft").load(clustered)
      .filter(expr(s"exists(tokens, x -> x >= $lo AND x <= $hi)"))
    val plan = exists.queryExecution.executedPlan.toString
    assert(plan.contains(s"PushedTokenRange: [$lo, $hi]"), s"range not pushed:\n$plan")
    val (rows, m) = runWithScanMetrics(exists)
    assert(m.getOrElse("graft segments pruned (token range)", 0L) > 0L,
      s"zipf layout must let the token range prune segments: $m")
    // exactness: residual re-filter keeps only true matches
    val expected = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .collect().filter(_.tokens.exists(t => t >= lo && t <= hi)).map(_.doc_id).toSet
    assert(rows.map(_.getString(0)).toSet === expected)

    // array_contains pins a point range and composes with other conjuncts
    val contains = spark.read.format("graft").load(clustered)
      .filter(array_contains($"tokens", 50256) && $"n_tok" >= 8)
    val plan2 = contains.queryExecution.executedPlan.toString
    assert(plan2.contains("PushedTokenRange: [50256, 50256]"), plan2)
    val expected2 = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .collect().filter(r => r.tokens.contains(50256) && r.n_tok >= 8).map(_.doc_id).toSet
    assert(contains.collect().map(_.getString(0)).toSet === expected2)
  }
}
