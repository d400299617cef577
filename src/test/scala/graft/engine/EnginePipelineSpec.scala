package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end engine correctness: the reference's decode-correctness
  * contract (golden batch equality, /root/reference/tests/basic_reading.rs)
  * re-expressed as element-for-element token equality through a full
  * Spark encode -> shuffle -> decode cycle (north_rule: bit-identical). */
class EnginePipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def assertRoundTrip(input: org.apache.spark.sql.Dataset[TokenRow]): Unit = {
    val segments = GraftEncoder.encode(input, buckets = 4)
    val decoded = GraftEncoder.decode(segments)
    val in = input.collect().map(r => r.doc_id -> r).toMap
    val out = decoded.collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet === in.keySet, "doc ids must round-trip exactly")
    in.foreach { case (id, r) =>
      val d = out(id)
      assert(d.tokens.toSeq === r.tokens.toSeq, s"tokens of $id")
      assert(d.n_tok === r.n_tok, s"n_tok of $id")
      assert(d.source === r.source, s"source of $id")
    }
  }

  test("synthetic table round-trips bit-identically through encode/decode") {
    assertRoundTrip(TokenTables.synthetic(spark, nDocs = 800, seed = 42L))
  }

  test("documents-derived table round-trips bit-identically") {
    assertRoundTrip(TokenTables.fromDocuments(spark, "/root/testdata/sf0.001"))
  }

  test("pure chunk encode/decode without Spark (unit layer)") {
    val rnd = new scala.util.Random(7)
    val rows = Array.tabulate(300) { i =>
      val n = 1 + rnd.nextInt(500)
      val tokens = Array.fill(n)(rnd.nextInt(50257))
      TokenRow(f"doc_$i%09d", tokens, n, s"src_${i % 3}")
    }
    val seg = GraftEncoder.encodeChunk(rows, pid = 0, chunkIdx = 0)
    val back = GraftEncoder.decodeSegment(seg).toArray
    assert(back.length === rows.length)
    rows.zip(back).foreach { case (a, b) =>
      assert(a.doc_id === b.doc_id)
      assert(a.tokens.toSeq === b.tokens.toSeq)
      assert(a.n_tok === b.n_tok)
      assert(a.source === b.source)
    }
    assert(seg.bytesOut < seg.bytesIn, s"must compress: ${seg.bytesOut} vs ${seg.bytesIn}")
  }

  test("packed-partition encode emits byte-identical segments to the row path") {
    val rnd = new scala.util.Random(11)
    val rows = Array.tabulate(500) { i =>
      val n = 1 + rnd.nextInt(400)
      val tokens = Array.fill(n)(rnd.nextInt(50257))
      BucketedRow(f"doc_$i%09d", tokens, n, s"src_${i % 3}", bucket = i % 4)
    }
    // shuffle input order: both paths must sort to the same layout
    val shuffled = rnd.shuffle(rows.toSeq).toArray
    val viaRows = GraftEncoder.encodePartition(
      shuffled.iterator, tokensPerChunk = 20000).toArray
    val viaPacked = GraftEncoder.encodePartitionPacked(
      shuffled.iterator.map(r =>
        PackedRow(r.doc_id, TokenPack.pack(r.tokens), r.n_tok, r.source, r.bucket)),
      tokensPerChunk = 20000).toArray
    assert(viaPacked.length === viaRows.length, "same chunk boundaries")
    viaRows.zip(viaPacked).foreach { case (a, b) =>
      assert(a.segmentId === b.segmentId)
      assert(a.nRows === b.nRows)
      assert(a.nTokens === b.nTokens)
      assert(a.cols.map(_.col) === b.cols.map(_.col))
      a.cols.zip(b.cols).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca.payload, cb.payload), s"payload of ${ca.col}")
        assert(ca.minV === cb.minV); assert(ca.maxV === cb.maxV)
        assert(ca.minS === cb.minS); assert(ca.maxS === cb.maxS)
      }
    }
  }

  test("empty and single-row chunks") {
    val row = TokenRow("doc_x", Array(1, 2, 3), 3, "web")
    val seg1 = GraftEncoder.encodeChunk(Array(row), 1, 0)
    assert(GraftEncoder.decodeSegment(seg1).toSeq.head.tokens.toSeq === Seq(1, 2, 3))
    val seg0 = GraftEncoder.encodeChunk(Array.empty[TokenRow], 1, 1)
    assert(GraftEncoder.decodeSegment(seg0).isEmpty)
  }

  test("edge-value tokens (reference extremes, SURVEY §1.2)") {
    val rows = Array(
      TokenRow("a", Array(0, Int.MaxValue, Int.MinValue, -1, 1, -128, 127, -32768, 32767), 9, "s"),
      TokenRow("b", Array.empty[Int], 0, "s"),
      TokenRow("大熊和奏🤔", Array.fill(600)(42), 600, "大熊"))
    val seg = GraftEncoder.encodeChunk(rows, 0, 0)
    val back = GraftEncoder.decodeSegment(seg).toArray
    rows.zip(back).foreach { case (a, b) =>
      assert(a.doc_id === b.doc_id)
      assert(a.tokens.toSeq === b.tokens.toSeq)
    }
  }

  test("encoding compresses the synthetic token payload >2x") {
    import spark.implicits._
    val segments = GraftEncoder.encode(
      TokenTables.synthetic(spark, nDocs = 500, seed = 42L), buckets = 4).cache()
    val stats = segments
      .select(org.apache.spark.sql.functions.explode($"cols").as("c"))
      .selectExpr("c.col AS col", "c.bytesIn AS bi", "c.bytesOut AS bo")
      .groupBy($"col").sum("bi", "bo")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (tbi, tbo) = stats("tokens")
    // adaptive deflate-skip trades ~7% size on entropy-dense token chunks
    // for ~3x kernel speed (BlockCompression.MinSampledGain), so the bound
    // is 1.85x rather than the pre-skip 2x
    assert(tbo.toDouble / tbi < 0.54, s"tokens must compress >1.85x: $tbo/$tbi")
    segments.unpersist()
  }

  test("string chunks carry real min/max stats in UTF-8 byte order") {
    val rows = Array(
      TokenRow("doc_b", Array(1), 1, "web"),
      TokenRow("doc_a", Array(2), 1, "books"),
      TokenRow("doc_z", Array(3), 1, "code"))
    val seg = GraftEncoder.encodeChunk(rows, 0, 0)
    val docCol = seg.cols.find(_.col == "doc_id").get
    assert(docCol.minS === "doc_a" && docCol.maxS === "doc_z")
    val srcCol = seg.cols.find(_.col == "source").get
    assert(srcCol.minS === "books" && srcCol.maxS === "web")
  }

  test("compareUtf8 is UTF-8 byte order, not UTF-16 char order") {
    import GraftEncoder.compareUtf8
    assert(compareUtf8("abc", "abd") < 0)
    assert(compareUtf8("abc", "abcd") < 0, "prefix sorts first")
    assert(compareUtf8("", "a") < 0)
    assert(compareUtf8("same", "same") === 0)
    // U+10000 (UTF-8 F0 90 80 80) vs U+FFFF (EF BF BF): UTF-16 code-unit
    // order says supplementary < FFFF (surrogate D800 < FFFF), byte order
    // says the opposite — we must follow byte order (Spark UTF8String).
    val supp = new String(Character.toChars(0x10000))
    assert("￿" > supp, "UTF-16 order disagrees (precondition)")
    assert(compareUtf8(supp, "￿") > 0, "byte order must win")
    assert(compareUtf8("a大", "a熊") ===
      java.util.Arrays.compareUnsigned(
        "a大".getBytes("UTF-8"), "a熊".getBytes("UTF-8")))
  }

  test("doc_id range pruning: skips segments, never loses a matching row") {
    import spark.implicits._
    val input = TokenTables.synthetic(spark, nDocs = 600, seed = 5L)
    val segs = GraftEncoder.encode(input, buckets = 8, tokensPerChunk = 4096).cache()
    val target = "doc_000000000123"
    val expected = input.filter($"doc_id" === target).collect()
    assert(expected.length === 1)
    val survivors = GraftEncoder.decodeWhereDocIdRange(segs, target, target)
    val got = survivors.filter(_.doc_id == target).collect()
    assert(got.length === 1 && got(0).tokens.toSeq === expected(0).tokens.toSeq)
    // the stat index must actually prune (inexact is fine, useless is not)
    val total = segs.count()
    val scanned = survivors.count()
    val fullDecode = GraftEncoder.decode(segs).count()
    assert(scanned < fullDecode, s"pruning must skip rows: $scanned of $fullDecode (from $total segments)")
    segs.unpersist()
  }

  test("chunking is by token count: no chunk greatly exceeds the budget") {
    import spark.implicits._
    val segments = GraftEncoder.encode(
      TokenTables.synthetic(spark, nDocs = 500, seed = 1L), buckets = 2,
      tokensPerChunk = 4096).collect()
    // one straddling row may overshoot by up to the max doc length (20k)
    assert(segments.forall(_.nTokens <= 4096 + 20000))
    assert(segments.count(_.nTokens >= 2048) >= segments.length / 2,
      "chunks should be reasonably full")
  }

  test("projected decode equals full decode on every projection subset") {
    val input = TokenTables.synthetic(spark, nDocs = 300, seed = 42L)
    val segs = GraftEncoder.encode(input, buckets = 4)
    val full = GraftEncoder.decode(segs).collect().map(r => r.doc_id -> r).toMap
    val subsets = Seq(
      Seq("doc_id"), Seq("doc_id", "n_tok"), Seq("doc_id", "source"),
      Seq("doc_id", "tokens"), Seq("doc_id", "tokens", "n_tok", "source"))
    subsets.foreach { cols =>
      val rows = GraftEncoder.decodeProjected(segs, cols).collect()
      assert(rows.length === full.size, s"projection $cols row count")
      assert(rows.head.schema.fieldNames.toSeq ===
        Seq("doc_id", "tokens", "n_tok", "source").filter(cols.contains))
      rows.foreach { r =>
        val exp = full(r.getString(r.fieldIndex("doc_id")))
        if (cols.contains("tokens"))
          assert(r.getSeq[Int](r.fieldIndex("tokens")) === exp.tokens.toSeq)
        if (cols.contains("n_tok"))
          assert(r.getInt(r.fieldIndex("n_tok")) === exp.n_tok)
        if (cols.contains("source"))
          assert(r.getString(r.fieldIndex("source")) === exp.source)
      }
    }
    // an unknown column and an empty projection must be rejected
    intercept[IllegalArgumentException] {
      GraftEncoder.decodeProjected(segs, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      GraftEncoder.decodeProjected(segs, Seq.empty)
    }
  }
}
