package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.TaskContext

import graft.codec._
import graft.select.CodecSelector

/** One encoded column stream within a segment — the analog of an ORC
  * column chunk with its encoding kind recorded in the stripe footer
  * (SURVEY §1.4; /root/reference/src/lib.rs:30 reads these back via
  * orc-rust). min/max double as the chunk's data-skipping index, the role
  * ORC ROW_INDEX entries play for the reference's stripe pruning
  * (/root/reference/src/predicate.rs:53-245). */
final case class ColChunk(
    col: String,
    codecId: Int,
    codecName: String,
    nValues: Long,
    bytesIn: Long,
    bytesOut: Long,
    minV: Long,
    maxV: Long,
    payload: Array[Byte])

/** A segment = one horizontal chunk of rows, all columns encoded. The unit
  * of encode work, lineage, and decode-side skipping. */
final case class Segment(
    segmentId: String,
    source: String,
    bucket: Int,
    partitionId: Int,
    chunkIdx: Int,
    nRows: Int,
    nTokens: Long,
    bytesIn: Long,
    bytesOut: Long,
    cols: Seq[ColChunk])

/** The encode/decode engine: typed Dataset transformations only (input_hint:
  * no RDD unless forced; the chunking inside a partition is genuine
  * per-partition imperative logic, expressed via mapPartitions on the typed
  * Dataset — Spark's sanctioned escape hatch, still one narrow stage).
  *
  * Scale design (the part that must survive 1000 executors x 100 TB):
  *  - rows are salted into `buckets` via a stable hash of doc_id, then
  *    range-partitioned by (source, bucket): long-token documents spread
  *    uniformly, no hot partition (north_rule skew clause);
  *  - chunk boundaries are by TOKEN COUNT, not row count (SURVEY §7.4.3) —
  *    a chunk of 64k tokens costs the same to encode whether it is 4 long
  *    docs or 500 short ones;
  *  - encode is map-side only after the one explicit shuffle; no collect,
  *    no driver-side loops; decode is shuffle-free (flatMap).
  */
object GraftEncoder {

  final val DefaultTokensPerChunk: Int = 64 * 1024

  /** Salt + repartition: the one explicit shuffle of the encode job. */
  def partitionForEncode(ds: Dataset[TokenRow], buckets: Int): Dataset[TokenRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.repartition(buckets, expr(s"abs(hash(doc_id)) % $buckets"))
      .sortWithinPartitions($"source", $"doc_id")
  }

  def encode(ds: Dataset[TokenRow],
             buckets: Int,
             tokensPerChunk: Int = DefaultTokensPerChunk): Dataset[Segment] = {
    val spark = ds.sparkSession
    import spark.implicits._
    partitionForEncode(ds, buckets).mapPartitions { rows =>
      encodePartition(rows, tokensPerChunk)
    }
  }

  /** Pure per-partition encode: greedy chunking by token budget. */
  def encodePartition(rows: Iterator[TokenRow],
                      tokensPerChunk: Int): Iterator[Segment] = {
    val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
    new Iterator[Segment] {
      private var chunkIdx = 0
      def hasNext: Boolean = rows.hasNext
      def next(): Segment = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[TokenRow]
        var tokenCount = 0L
        while (rows.hasNext && tokenCount < tokensPerChunk) {
          val r = rows.next()
          buf += r
          tokenCount += r.tokens.length
        }
        val seg = encodeChunk(buf.toArray, pid, chunkIdx)
        chunkIdx += 1
        seg
      }
    }
  }

  /** Encode one chunk of rows into a Segment (pure function — unit-tested
    * without Spark). */
  def encodeChunk(rows: Array[TokenRow], pid: Int, chunkIdx: Int): Segment = {
    val n = rows.length
    val docIds = new Array[String](n)
    val sources = new Array[String](n)
    val nToks = new Array[Long](n)
    val tokLens = new Array[Long](n)
    var totalTokens = 0L
    var i = 0
    while (i < n) {
      docIds(i) = rows(i).doc_id
      sources(i) = rows(i).source
      nToks(i) = rows(i).n_tok.toLong
      tokLens(i) = rows(i).tokens.length.toLong
      totalTokens += rows(i).tokens.length
      i += 1
    }
    val flat = new Array[Long](totalTokens.toInt)
    var pos = 0
    i = 0
    while (i < n) {
      val t = rows(i).tokens
      var j = 0
      while (j < t.length) { flat(pos) = t(j).toLong; pos += 1; j += 1 }
      i += 1
    }

    def intChunk(col: String, values: Array[Long], bytesInPerValue: Int): ColChunk = {
      val (codec, payload) = CodecSelector.encodeIntsAuto(values)
      var minV = Long.MaxValue
      var maxV = Long.MinValue
      var k = 0
      while (k < values.length) {
        if (values(k) < minV) minV = values(k)
        if (values(k) > maxV) maxV = values(k)
        k += 1
      }
      if (values.isEmpty) { minV = 0; maxV = 0 }
      ColChunk(col, codec.id, codec.name, values.length.toLong,
        values.length.toLong * bytesInPerValue, payload.length.toLong,
        minV, maxV, payload)
    }
    def strChunk(col: String, values: Array[String]): ColChunk = {
      val (codec, payload) = CodecSelector.encodeStringsAuto(values)
      var bytesIn = 0L
      var k = 0
      while (k < values.length) { bytesIn += values(k).length; k += 1 }
      ColChunk(col, codec.id, codec.name, values.length.toLong, bytesIn,
        payload.length.toLong, 0L, 0L, payload)
    }

    val cols = Seq(
      strChunk("doc_id", docIds),
      intChunk("tok_len", tokLens, 4),
      intChunk("tokens", flat, 4),
      intChunk("n_tok", nToks, 4),
      strChunk("source", sources))

    val source = if (n > 0) rows(0).source else ""
    val bucket = pid
    Segment(
      segmentId = f"p$pid%05d-c$chunkIdx%06d",
      source = source,
      bucket = bucket,
      partitionId = pid,
      chunkIdx = chunkIdx,
      nRows = n,
      nTokens = totalTokens,
      bytesIn = cols.map(_.bytesIn).sum,
      bytesOut = cols.map(_.bytesOut).sum,
      cols = cols)
  }

  def decode(segments: Dataset[Segment]): Dataset[TokenRow] = {
    val spark = segments.sparkSession
    import spark.implicits._
    segments.flatMap(decodeSegment _)
  }

  /** Pure segment decode (unit-tested without Spark). */
  def decodeSegment(seg: Segment): Iterator[TokenRow] = {
    val byCol = seg.cols.map(c => c.col -> c).toMap
    val docIds = StringCodecs.decodeChunk(byCol("doc_id").payload)
    val sources = StringCodecs.decodeChunk(byCol("source").payload)
    val nToks = IntCodecs.decodeChunk(byCol("n_tok").payload)
    val tokLens = IntCodecs.decodeChunk(byCol("tok_len").payload)
    val flat = IntCodecs.decodeChunk(byCol("tokens").payload)
    val out = new Array[TokenRow](seg.nRows)
    var pos = 0
    var i = 0
    while (i < seg.nRows) {
      val len = tokLens(i).toInt
      val tokens = new Array[Int](len)
      var j = 0
      while (j < len) { tokens(j) = flat(pos + j).toInt; j += 1 }
      pos += len
      out(i) = TokenRow(docIds(i), tokens, nToks(i).toInt, sources(i))
      i += 1
    }
    out.iterator
  }
}
