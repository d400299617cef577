package graft.sources

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TokenTables
import graft.lineage.SegmentStore

/** Round-4 commit-protocol hardening: the lineage/_meta version marker
  * (bucket function + format version certification), CAS-claimed batch
  * snapshot ids (two concurrent appends publish two distinct snapshots),
  * and the memoized driver-side ledger walk (repeated scans of an
  * unchanged table re-read zero ledger files). */
class GraftTableMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-meta-spec").toString

  private def tokenDf(nDocs: Int, seed: Long = 42L) =
    TokenTables.synthetic(spark, nDocs = nDocs, seed = seed)
      .toDF("doc_id", "tokens", "n_tok", "source")

  private def hconf = spark.sessionState.newHadoopConf()

  test("first commit stamps lineage/_meta with the current conventions") {
    val dir = tmp()
    tokenDf(100).write.format("graft").option("buckets", "2")
      .mode(SaveMode.Append).save(dir)
    val meta = GraftTableMeta.read(dir, hconf)
    assert(meta.isDefined)
    assert(meta.get.bucketFunction === GraftTableMeta.BucketFunction)
    assert(meta.get.formatVersion === GraftTableMeta.FormatVersion)
    assert(GraftTableMeta.bucketFunctionCertified(dir, hconf))
  }

  test("append to an unverifiable (pre-marker) ledgered table fails fast") {
    val dir = tmp()
    tokenDf(100).write.format("graft").option("buckets", "2")
      .mode(SaveMode.Append).save(dir)
    // simulate a table written by a pre-versioning build
    val p = GraftTableMeta.metaPath(dir)
    p.getFileSystem(hconf).delete(p, false)
    val e = intercept[Exception] {
      tokenDf(50, seed = 7L).write.format("graft").option("buckets", "2")
        .mode(SaveMode.Append).save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("_meta")), s"got: $e")
    // engine-path commits refuse the same table
    val e2 = intercept[Exception] {
      SegmentStore.encodeCommit(
        TokenTables.synthetic(spark, nDocs = 10, seed = 1L), dir,
        snapshotId = 99L, buckets = 2)
    }
    assert(msgs(e2).exists(m => m != null && m.contains("_meta")))
  }

  test("SPJ bucket declaration is refused without certification") {
    val dir = tmp()
    tokenDf(100).write.format("graft").option("buckets", "2")
      .mode(SaveMode.Append).save(dir)
    assert(new GraftTable(dir, catalogBacked = true).partitioning().nonEmpty)
    val p = GraftTableMeta.metaPath(dir)
    p.getFileSystem(hconf).delete(p, false)
    // _meta is write-once and cached; deleting it out-of-band (simulating a
    // pre-versioning table) needs the explicit invalidation a fresh process
    // would get for free
    GraftTableMeta.invalidate(dir)
    // unverifiable bucket function => no KeyGroupedPartitioning declaration
    assert(new GraftTable(dir, catalogBacked = true).partitioning().isEmpty)
  }

  test("two concurrent batch appends publish two distinct snapshots, no lost rows") {
    val dir = tmp()
    val a = tokenDf(120, seed = 1L).where("doc_id < 'doc_000060'").cache()
    val b = tokenDf(120, seed = 1L).where("doc_id >= 'doc_000060'").cache()
    a.count(); b.count() // materialize before racing the writes
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def submit(df: org.apache.spark.sql.DataFrame) = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        df.write.format("graft").option("buckets", "2")
          .mode(SaveMode.Append).save(dir)
      }
    })
    val f1 = submit(a)
    val f2 = submit(b)
    start.countDown()
    f1.get(120, TimeUnit.SECONDS)
    f2.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    val snaps = SegmentStore.readLineage(spark, dir).collect()
      .filter(_.status == SegmentStore.Committed).map(_.snapshotId).distinct.sorted
    assert(snaps === Array(1L, 2L), s"expected two distinct snapshots, got ${snaps.toSeq}")
    assert(spark.read.format("graft").load(dir).count() === 120L)
    a.unpersist(); b.unpersist()
  }

  test("schema evolution: add-column with null default across generations " +
    "(file_format.rs:146-161 try_merge, inside one table)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = tmp()
    // generation 1: canonical + one metadata column
    val gen1 = tokenDf(60).withColumn("views", $"n_tok".cast("long") * 2L)
    gen1.write.format("graft").option("buckets", "2").mode(SaveMode.Append).save(dir)
    // appending a WIDER schema without evolving fails by name
    val gen2df = tokenDf(40, seed = 9L)
      .withColumn("views", $"n_tok".cast("long") * 2L)
      .withColumn("lang", concat(lit("l"), ($"n_tok" % 3).cast("string")))
    val e = intercept[Exception] {
      gen2df.write.format("graft").option("buckets", "2").mode(SaveMode.Append).save(dir)
    }
    assert(e.getMessage.contains("schema") || e.getCause != null)
    // evolve: add `lang` (string, null default) — then the append succeeds
    val v = GraftTableMeta.evolve(dir, hconf, gen2df.schema)
    assert(v === 1)
    // idempotent re-evolve; non-extension refused
    assert(GraftTableMeta.evolve(dir, hconf, gen2df.schema) === 1)
    intercept[IllegalArgumentException] {
      GraftTableMeta.evolve(dir, hconf,
        StructType(tokenDf(1).schema.fields :+ StructField("other", LongType)))
    }
    gen2df.write.format("graft").option("buckets", "2").mode(SaveMode.Append).save(dir)
    // old-schema writers now fail by name
    intercept[Exception] {
      gen1.write.format("graft").option("buckets", "2").mode(SaveMode.Append).save(dir)
    }
    // read: both generations, gen-1 rows read lang as NULL
    val table = spark.read.format("graft").load(dir)
    assert(table.schema.fieldNames.toSeq ===
      Seq("doc_id", "tokens", "n_tok", "source", "views", "lang"))
    assert(table.count() === 100L)
    assert(table.filter($"lang".isNull).count() === 60L)
    assert(table.filter($"lang".isNotNull).count() === 40L)
    // filters and aggregates over the evolved column stay exact
    val expected = gen2df.select($"doc_id", $"lang").collect().toSet
    assert(table.filter($"lang".isNotNull).select($"doc_id", $"lang")
      .collect().toSet === expected)
    assert(table.agg(count($"lang")).collect()(0).getLong(0) === 40L)
    // compaction normalizes generations (explicit nulls) and keeps values
    // (multiset compare: the two generations share doc_id ranges)
    val before = table.collect().toSeq
    assert(SegmentStore.compact(spark, dir, upTo = Long.MaxValue, buckets = 2).isDefined)
    val after = spark.read.format("graft").load(dir)
    assert(after.count() === 100L)
    assert(after.exceptAll(spark.createDataFrame(
      spark.sparkContext.parallelize(before, 2), table.schema)).count() === 0L &&
      spark.createDataFrame(spark.sparkContext.parallelize(before, 2), table.schema)
        .exceptAll(after).count() === 0L,
      "rows drift through post-evolution compaction")
  }

  test("ledger walk is memoized: unchanged table re-reads zero ledger files") {
    val dir = tmp()
    tokenDf(100).write.format("graft").option("buckets", "2")
      .mode(SaveMode.Append).save(dir)
    spark.read.format("graft").load(dir).count() // warm the caches
    val before = GraftLayout.ledgerFilesRead.get()
    spark.read.format("graft").load(dir).count()
    spark.read.format("graft").load(dir).where("n_tok > 3").count()
    assert(GraftLayout.ledgerFilesRead.get() === before,
      "second and third scans of an unchanged table must not re-read ledger files")
    // an append invalidates incrementally: only the NEW ledger file is parsed
    tokenDf(40, seed = 9L).write.format("graft").option("buckets", "2")
      .mode(SaveMode.Append).save(dir)
    val afterWrite = GraftLayout.ledgerFilesRead.get()
    spark.read.format("graft").load(dir).count()
    val delta = GraftLayout.ledgerFilesRead.get() - afterWrite
    assert(delta <= 1L, s"expected at most the new ledger file to be parsed, got $delta")
  }
}
