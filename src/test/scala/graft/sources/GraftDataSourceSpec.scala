package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{GraftEncoder, TokenTables}
import graft.lineage.SegmentStore

/** The DSv2 connector contract: logical TokenRow schema over the physical
  * segment table, full-read equality with the engine decode, projection
  * pruning visible in the scan description, stats-based segment skipping
  * under pushed filters (inexact: Spark re-filters, results stay exact). */
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

  test("SegmentStore table layout reads through the same connector; lineage dir ignored") {
    val dir = tmp()
    val input = TokenTables.synthetic(spark, nDocs = 200, seed = 7L)
    SegmentStore.encodeCommit(input, dir, snapshotId = 1L, buckets = 4)
    val df = spark.read.format("graft").load(dir)
    assert(df.count() === 200L)
    assert(df.select("doc_id").distinct().count() === 200L)
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
    val dir = tmp()
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
    val nDocs = 400L
    val rangeBuckets = 8
    val bucketed = input.map { r =>
      val id = r.doc_id.filter(_.isDigit).toLong
      val b = math.min(rangeBuckets - 1, (id * rangeBuckets / nDocs).toInt)
      graft.engine.BucketedRow(r.doc_id, r.tokens, r.n_tok, r.source, b)
    }
    GraftEncoder.encodeBucketed(bucketed, rangeBuckets, tokensPerChunk = 4096)
      .write.parquet(s"$dir/segs")

    val target = input.collect().head.doc_id
    GraftTable.segmentsPruned.reset(); GraftTable.segmentsRead.reset()
    val rows = spark.read.format("graft").load(s"$dir/segs")
      .filter($"doc_id" === target).collect()
    assert(rows.length === 1 && rows.head.getString(0) === target)
    assert(GraftTable.segmentsPruned.sum() > 0,
      s"expected pruned segments, read=${GraftTable.segmentsRead.sum()}")
    // the plan advertises the negotiation
    val desc = spark.read.format("graft").load(s"$dir/segs")
      .filter($"doc_id" === target).queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters: [EqualTo(doc_id,"), desc)
    // and Spark re-filters exactly: n_tok range filter over hash buckets
    GraftTable.segmentsPruned.reset()
    val exact = spark.read.format("graft").load(bare)
      .filter($"n_tok" > 1000).count()
    val expected = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .filter(_.n_tok > 1000).count()
    assert(exact === expected)
  }

  test("scan reports statistics; small graft tables broadcast in joins") {
    import spark.implicits._
    val stats = spark.read.format("graft").load(bare)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats > 0 && stats < 100L * 1024 * 1024, s"stats=$stats")
    val big = spark.range(100000).select($"id".cast("string").as("doc_id"))
    val joined = big.join(spark.read.format("graft").load(bare).select("doc_id", "n_tok"), "doc_id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"graft side not broadcast:\n$plan")
  }

  test("OR of point lookups composes under may-match pruning (predicate-tree conversion)") {
    import spark.implicits._
    val dir = tmp()
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
    val rangeBuckets = 8
    val bucketed = input.map { r =>
      val id = r.doc_id.filter(_.isDigit).toLong
      val b = math.min(rangeBuckets - 1, (id * rangeBuckets / 400L).toInt)
      graft.engine.BucketedRow(r.doc_id, r.tokens, r.n_tok, r.source, b)
    }
    GraftEncoder.encodeBucketed(bucketed, rangeBuckets, tokensPerChunk = 4096)
      .write.parquet(s"$dir/segs")
    val ids = input.collect().map(_.doc_id).sorted
    val (a, b) = (ids.head, ids.last)
    GraftTable.segmentsPruned.reset(); GraftTable.segmentsRead.reset()
    val rows = spark.read.format("graft").load(s"$dir/segs")
      .filter($"doc_id" === a || $"doc_id" === b).collect()
    assert(rows.map(_.getString(0)).toSet === Set(a, b))
    assert(GraftTable.segmentsPruned.sum() > 0,
      "OR of two point lookups must still prune middle segments")

    // IN-list prunes like OR-of-equalities
    GraftTable.segmentsPruned.reset()
    val inRows = spark.read.format("graft").load(s"$dir/segs")
      .filter($"doc_id".isin(a, b)).collect()
    assert(inRows.map(_.getString(0)).toSet === Set(a, b))
    assert(GraftTable.segmentsPruned.sum() > 0, "IN-list must prune")
  }

  test("COUNT(*) pushes to segment headers (no decode, payload pages unread)") {
    import spark.implicits._
    val df = spark.read.format("graft").load(bare)
    GraftTable.segmentsRead.reset(); GraftTable.segmentsPruned.reset()
    val counted = df.agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    assert(counted.collect()(0).getLong(0) === 400L)
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)]"), s"count not pushed:\n$plan")
    assert(GraftTable.segmentsRead.sum() === 0L,
      "pushed count must not run the row-decoding reader")
    // a filtered count must NOT push (we always re-filter residually) and stays exact
    val filtered = df.filter($"n_tok" > 1000).agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregation"))
    val expected = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .filter(_.n_tok > 1000).count()
    assert(filtered.collect()(0).getLong(0) === expected)
  }
}
