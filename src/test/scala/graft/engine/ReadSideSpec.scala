package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Read-side surfaces: decode metrics (the reference's scan-counter layer,
  * metrics.rs:57-218) and multi-file schema merge (file_format.rs:146-161). */
class ReadSideSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decode metrics: counters reconcile with the unmetered decode") {
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 5L)
    val segs = GraftEncoder.encode(input, buckets = 4, tokensPerChunk = 2048).persist()
    val lo = 50000L
    val hi = 50256L
    val m = new DecodeMetrics(spark.sparkContext)
    val decoded = DecodeMetrics.decodeWhereTokenRange(segs, lo, hi, m)
    val rows = decoded.collect()
    val total = segs.count()
    assert(m.segmentsMatched.value + m.segmentsPruned.value === total)
    assert(m.segmentsPruned.value > 0, "zipf data must let stats prune something")
    assert(m.rowsDecoded.value === rows.length.toLong)
    assert(m.tokensDecoded.value === rows.map(_.tokens.length.toLong).sum)
    assert(m.bytesScanned.value > 0 && m.bytesPruned.value > 0)
    assert(m.scanEfficiency > 0.0 && m.scanEfficiency < 1.0)
    // metered output == declarative pruned decode output
    val plain = GraftEncoder.decodeWhereTokenRange(segs, lo, hi).collect()
    assert(rows.map(_.doc_id).sorted.toSeq === plain.map(_.doc_id).sorted.toSeq)
    segs.unpersist()
  }

  test("decode metrics: empty scan reports efficiency 1.0 (reference's div-by-zero stance)") {
    val m = new DecodeMetrics(spark.sparkContext)
    assert(m.scanEfficiency === 1.0)
  }

  test("composed chunk predicates prune soundly (AND/OR of may-match is may-match)") {
    import spark.implicits._
    val input = TokenTables.synthetic(spark, nDocs = 400, seed = 5L)
    val segs = GraftEncoder.encode(input, buckets = 4, tokensPerChunk = 2048).cache()
    import ChunkPredicate._
    val rare = TokenRange(50000L, 50256L)
    val web = SourceEquals("web")
    val pred = And(rare, web)
    val total = GraftEncoder.decode(segs).count()
    val survivors = decodeWhere(segs, pred).cache()
    assert(survivors.count() < total, "composition must prune")
    // soundness: every truly-matching row survives
    val exact = GraftEncoder.decode(segs)
      .filter(r => r.source == "web" && r.tokens.exists(t => t >= 50000 && t <= 50256))
      .collect().map(_.doc_id).toSet
    val viaPruned = survivors
      .filter(r => r.source == "web" && r.tokens.exists(t => t >= 50000 && t <= 50256))
      .collect().map(_.doc_id).toSet
    assert(viaPruned === exact)
    // OR prunes no more than either branch alone
    val orCount = decodeWhere(segs, Or(rare, web)).count()
    assert(orCount >= decodeWhere(segs, rare).count())
    assert(orCount >= decodeWhere(segs, web).count())
    survivors.unpersist()
    segs.unpersist()
  }

  test("schema merge: appended nullable field unions; order is first-seen") {
    import org.apache.spark.sql.types._
    val a = StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("n_tok", IntegerType, nullable = false)))
    val b = StructType(Seq(
      StructField("doc_id", StringType, nullable = true),
      StructField("extra", LongType, nullable = true)))
    val m = SchemaMerge.merge(Seq(a, b))
    assert(m.fieldNames.toSeq === Seq("doc_id", "n_tok", "extra"))
    assert(m("doc_id").nullable, "nullability must union")
    assert(!m("n_tok").nullable)
  }

  test("schema merge: type conflict fails fast naming the field") {
    import org.apache.spark.sql.types._
    val a = StructType(Seq(StructField("n_tok", IntegerType)))
    val b = StructType(Seq(StructField("n_tok", StringType)))
    val e = intercept[IllegalArgumentException](SchemaMerge.merge(Seq(a, b)))
    assert(e.getMessage.contains("n_tok"))
  }

  test("readMerged: two files with evolved schemas read as one table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-merge").toString
    Seq(("a", 1)).toDF("doc_id", "n_tok").write.parquet(s"$dir/f1")
    Seq(("b", 2, "web")).toDF("doc_id", "n_tok", "source").write.parquet(s"$dir/f2")
    val df = SchemaMerge.readMerged(spark, Seq(s"$dir/f1", s"$dir/f2"))
    assert(df.schema.fieldNames.toSeq === Seq("doc_id", "n_tok", "source"))
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1), Option(r.getString(2))))
    assert(rows.toSet === Set(("a", 1, None), ("b", 2, Some("web"))))
  }

  test("bloom point-lookup decode: exact results, and the filter actually skips chunks") {
    import spark.implicits._
    // every doc spans [0, 50256] so token min/max can't discriminate; one
    // doc carries the probe token — only the chunk bloom tells them apart
    val probe = 49999
    val rows = (0 until 32).map { i =>
      val base = Array.tabulate(500)(j => (i * 13 + j * 3) % 800) :+ 50256 :+ 0
      val tokens = if (i == 9) base :+ probe else base
      TokenRow(f"doc_$i%04d", tokens, tokens.length, "s")
    }
    val conf = graft.codec.CodecConf(bloomColumns = Set("doc_id", "tokens"))
    val segs = GraftEncoder.encode(spark.createDataset(rows), buckets = 4,
      tokensPerChunk = 2048, codecConf = conf).persist()
    try {
      // exactness: survivors re-filtered by the caller (inexact contract)
      val hits = GraftEncoder.decodeWhereTokenEquals(segs, probe.toLong)
        .collect().filter(_.tokens.contains(probe)).map(_.doc_id)
      assert(hits.toSeq === Seq("doc_0009"))
      // the skip is real: bloom-filtered decode touches fewer segments than
      // a full decode (count docs emitted before the exact re-filter)
      val decodedDocs = GraftEncoder.decodeWhereTokenEquals(segs, probe.toLong).count()
      assert(decodedDocs < 32L, s"bloom skipped nothing: decoded $decodedDocs of 32 docs")
      // doc_id point lookup on the hash layout (ranges overlap, blooms don't)
      val byId = GraftEncoder.decodeWhereDocIdEquals(segs, "doc_0017")
      assert(byId.collect().map(_.doc_id).contains("doc_0017"))
      assert(GraftEncoder.decodeWhereDocIdEquals(segs, "doc_0017x").count() === 0L,
        "absent mid-range key should decode nothing")
    } finally segs.unpersist()
  }
}
