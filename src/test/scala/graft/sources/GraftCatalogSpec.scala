package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.TokenTables
import graft.lineage.SegmentStore

/** The catalog surface and its reason to exist: storage-partitioned joins.
  * Two graft tables bucketed the same way must join WITHOUT any shuffle —
  * the stored layout is bucket(n, doc_id)-partitioned, the catalog's
  * FunctionCatalog resolves the transform, and Spark schedules one task
  * per bucket pair. At the 10^12-row scale the elided bucket exchange is
  * the largest data movement a graft⋈graft join would otherwise pay. */
class GraftCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // catalog + SPJ knobs resolve dynamically from SQLConf, so runtime
    // set works even when another suite created the session first
    s.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cat-spec").toString

  private lazy val (dirA, dirB): (String, String) = {
    val a = tmp()
    val b = tmp()
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
    SegmentStore.encodeCommit(input, a, snapshotId = 1L, buckets = 8)
    SegmentStore.encodeCommit(input.filter(_.n_tok % 2 == 0), b,
      snapshotId = 1L, buckets = 8)
    (a, b)
  }

  test("catalog loads path-addressed tables; reads equal the format path") {
    val viaCatalog = spark.table(s"gcat.`$dirA`")
    val viaFormat = spark.read.format("graft").load(dirA)
    assert(viaCatalog.count() === 400L)
    assert(viaCatalog.collect().map(_.getString(0)).sorted.toSeq ===
      viaFormat.collect().map(_.getString(0)).sorted.toSeq)
    // the table declares its layout
    val t = new GraftCatalog() { initialize("gcat", null) }
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, dirA))
    assert(t.partitioning().map(_.toString).toSeq === Seq("bucket(8, doc_id)"))
  }

  test("bucket function replays the engine's assignment exactly") {
    import spark.implicits._
    val fn = GraftBucketFunction.bind(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType))))
      .asInstanceOf[GraftBucketFunction.BoundBucket.type]
    val ids = TokenTables.synthetic(spark, nDocs = 50, seed = 42L)
      .collect().map(_.doc_id)
    val engine = spark.createDataset(ids.toSeq).toDF("doc_id")
      .selectExpr("doc_id", "pmod(hash(doc_id), 8) as b")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](8, org.apache.spark.unsafe.types.UTF8String.fromString(id)))
      assert(fn.produceResult(row) === engine(id), id)
    }
  }

  test("storage-partitioned join: graft ⋈ graft on doc_id plans ZERO shuffles") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table(s"gcat.`$dirA`").select($"doc_id", $"n_tok")
      val b = spark.table(s"gcat.`$dirB`").select($"doc_id", $"source")
      val j = a.join(b, Seq("doc_id"))
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must not shuffle either side:\n${plan.take(3000)}")
      // correctness vs the naive path
      val expected = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
        .collect().filter(_.n_tok % 2 == 0).map(_.doc_id).toSet
      assert(rows.map(_.getString(0)).toSet === expected)
      assert(rows.length === expected.size)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("both write paths produce ONE layout: encodeCommit ⋈ df.write SPJ, zero exchanges, no lost rows") {
    import spark.implicits._
    // the discriminating scenario: if the DSv2 write path bucketed with a
    // different hash than the engine, same-doc rows would sit in
    // different bucket numbers and the co-partitioned join would silently
    // LOSE matches — correctness, not just performance
    val dirC = tmp()
    val subset = TokenTables.synthetic(spark, nDocs = 400, seed = 42L)
      .filter(_.n_tok % 3 == 0)
    subset.toDF("doc_id", "tokens", "n_tok", "source")
      .write.format("graft").option("buckets", "8").mode("append").save(dirC)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table(s"gcat.`$dirA`").select($"doc_id", $"n_tok")
      val c = spark.table(s"gcat.`$dirC`").select($"doc_id", $"source")
      val j = a.join(c, Seq("doc_id"))
      val rows = j.collect()
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "cross-write-path SPJ must not shuffle")
      val expected = subset.collect().map(_.doc_id).toSet
      assert(rows.map(_.getString(0)).toSet === expected,
        "co-partitioned join lost rows: the write paths bucket differently")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("format(\"graft\") path reads stay shuffle-planned (no function catalog): joins still correct") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.read.format("graft").load(dirA).select($"doc_id", $"n_tok")
      val b = spark.read.format("graft").load(dirB).select($"doc_id", $"source")
      val j = a.join(b, Seq("doc_id"))
      assert(j.queryExecution.executedPlan.toString.contains("Exchange"),
        "path-based reads have no resolvable bucket function and must shuffle")
      assert(j.count() === spark.table(s"gcat.`$dirB`").count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
