package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{GroupType, MessageType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{And => SAnd, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Or => SOr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.codec.{IntCodecs, StringCodecs}

/** `spark.read.format("graft").load(tableDir)` — a DataSource V2 connector
  * over the stored segment table, the Spark-native analog of the
  * reference's DataFusion `TableProvider`/`FileFormat` registration
  * (/root/reference/src/file_format.rs, source.rs):
  *
  *  - **schema inference** (§2.A.2): the table presents the logical
  *    TokenRow schema `(doc_id, tokens, n_tok, source)`, not the physical
  *    segment schema;
  *  - **projection pushdown** (§2.A.8): `pruneColumns` reaches the decode
  *    kernels — streams a query does not touch are never inflated
  *    (a `SELECT doc_id, n_tok` never decodes the tokens payload);
  *  - **filter pushdown negotiation** (§2.A.6): string/int comparisons on
  *    doc_id/source/n_tok prune whole segments via the chunk min/max
  *    statistics, and ALL filters are returned as residuals so Spark
  *    re-filters rows exactly — the same `PushedDown::Inexact` contract the
  *    reference pins (src/source.rs:279-281);
  *  - **LIMIT pushdown** (§2.A.10): the reference's headline scan feature
  *    (cross-batch counting + straddling-batch truncation,
  *    /root/reference/src/opener.rs:212-266). Ours is two-level: each
  *    partition reader stops opening parquet groups once `limit` rows were
  *    emitted (the cross-segment count), and when no filters are pushed the
  *    planner stops planning part-files once their header row sums cover
  *    the limit. Always partial (`isPartiallyPushed`): Spark applies the
  *    exact global limit on top;
  *  - **token-range pushdown**: `array_contains(tokens, v)` /
  *    `exists(tokens, x -> lo <= x AND x <= hi)` predicates reach the
  *    tokens-chunk min/max skip via [[GraftTokenRangePushdown]] (Catalyst
  *    cannot translate array predicates to `sources.Filter`s — the rule is
  *    the Spark-side analog of the reference's arbitrary-PhysicalExpr
  *    conversion, /root/reference/src/predicate.rs:53-166). Inexact like
  *    every other prune: the Filter stays in the plan;
  *  - **aggregate pushdown**: COUNT(*)/MIN/MAX over stats-bearing columns
  *    collapse to segment-header reads — payload pages are never read
  *    (partial pushdown; Spark merges the per-file partials);
  *  - **scan opener** (§2.A.5/7): one InputPartition per segment part-file;
  *    each reader streams Groups straight from parquet with no Spark
  *    session on the executor path, under the session's Hadoop conf
  *    (credentials/filesystem settings reach executors via
  *    [[SerializableConfiguration]]);
  *  - **metrics** (§2.A.14): per-query DSv2 `CustomMetric`s (segments
  *    decoded/pruned, payload bytes decoded/pruned, rows emitted) — the
  *    Spark-native rendering of the reference's ExecutionPlanMetricsSet
  *    counters (/root/reference/src/metrics.rs:57-218), visible in the SQL
  *    UI and isolated per execution (no cross-query statics).
  *
  * Works on both layouts: a bare `Dataset[Segment].write.parquet(dir)` dump
  * and a [[graft.lineage.SegmentStore]] table dir. For the latter the
  * planner consults the lineage ledger and reads ONLY ledger-committed
  * (snapshotId, bucket) partitions — data written in the crash window
  * between a partition write and its ledger commit is invisible, the same
  * read-committed stance an Iceberg snapshot read takes.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.TokenSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires a path, e.g. .load(dir)"))
    new GraftTable(path)
  }
}

object GraftTable {
  val TokenSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("source", StringType, nullable = false)))
}

class GraftTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft:$path"
  override def schema(): StructType = GraftTable.TokenSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)
  private def sessionConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, sessionConf,
      options.getBoolean("columnar", GraftScan.ColumnarDefault))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path, info, sessionConf)
}

/** What MIN/MAX/COUNT(*) reduce to against the segment headers. */
sealed trait AggSpec
object AggSpec {
  final case class MinOf(col: String) extends AggSpec
  final case class MaxOf(col: String) extends AggSpec
  case object CountAll extends AggSpec
}

class GraftScanBuilder(path: String, hconf: SerializableConfiguration,
                       columnar: Boolean = GraftScan.ColumnarDefault)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  private var required: StructType = GraftTable.TokenSchema
  private var pushed: Array[Filter] = Array.empty
  private var aggSpecs: Seq[AggSpec] = Nil
  private var limit: Option[Int] = None

  /** Accept stats-prunable comparisons for segment skipping; hand EVERY
    * filter back as a residual (inexact pruning, engine re-filters). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftScan.prunable)
    filters // all residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve canonical column order; an empty projection (COUNT(*)) still
    // needs row counts, carried by nRows without decoding any stream
    required = StructType(
      GraftTable.TokenSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  }

  /** LIMIT pushdown, always partial: each partition reader caps the rows it
    * decodes and the planner drops part-files past the limit when nothing
    * is filtered; Spark keeps the exact global limit on top (the same
    * split as the reference's per-stream `take_while` + engine-level
    * GlobalLimit, opener.rs:212-266). */
  override def pushLimit(n: Int): Boolean =
    if (aggSpecs.nonEmpty) false else { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  /** COUNT(*)/MIN/MAX with no grouping and no residual filters reduce to
    * the segment headers: nRows for counts, the chunk min/max statistics
    * for MIN/MAX over stats-bearing columns — the reader requests a
    * payload-free parquet schema, so data pages are never read at all (a
    * count or min over the 10^12-row table touches megabytes, not
    * petabytes; the reference's exact-stats stance, metadata.rs:64-86).
    * Partial pushdown: each partition returns its own partials, Spark
    * merges. Any filter blocks the push (ours always re-filter). */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def field(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames().length == 1 => Some(nr.fieldNames()(0))
        case _ => None
      }
    val statCols = Set("n_tok", "doc_id", "source")
    if (pushed.nonEmpty || limit.isDefined || aggregation.groupByExpressions.nonEmpty ||
      aggregation.aggregateExpressions.isEmpty) return false
    val specs = aggregation.aggregateExpressions.map {
      case _: CountStar => Some(AggSpec.CountAll)
      case m: Min => field(m.column).filter(statCols).map(AggSpec.MinOf)
      case m: Max => field(m.column).filter(statCols).map(AggSpec.MaxOf)
      case _ => None
    }
    if (specs.forall(_.isDefined)) { aggSpecs = specs.flatten.toSeq; true } else false
  }

  override def build(): Scan =
    if (aggSpecs.nonEmpty) new GraftAggScan(path, aggSpecs, hconf)
    else new GraftScan(path, required, pushed, limit, None, hconf, columnar)
}

object GraftScan {
  /** Columnar reads are the default (flip per-read with
    * `.option("columnar", "false")`): one ColumnarBatch per segment through
    * OnHeapColumnVectors, the Spark-native analog of the reference's Arrow
    * RecordBatch stream. */
  final val ColumnarDefault = true

  /** Stats-prunable filter shapes: string/int comparisons on stats-bearing
    * columns, composed under AND/OR (the reference's predicate-tree
    * conversion, predicate.rs:53-166 — same semantics as the engine's
    * [[graft.engine.ChunkPredicate]]: AND/OR of may-match upper bounds is
    * an upper bound, so composition stays sound). NOT is rejected, as in
    * ChunkPredicate: interval stats cannot prove a complement empty. */
  def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _: String) => a == "doc_id" || a == "source"
    case GreaterThan(a, _: String) => a == "doc_id" || a == "source"
    case GreaterThanOrEqual(a, _: String) => a == "doc_id" || a == "source"
    case LessThan(a, _: String) => a == "doc_id" || a == "source"
    case LessThanOrEqual(a, _: String) => a == "doc_id" || a == "source"
    case EqualTo("n_tok", _: Int) => true
    case GreaterThan("n_tok", _: Int) => true
    case GreaterThanOrEqual("n_tok", _: Int) => true
    case LessThan("n_tok", _: Int) => true
    case LessThanOrEqual("n_tok", _: Int) => true
    case In(a, vs) => (a == "doc_id" || a == "source") &&
      vs.nonEmpty && vs.forall(_.isInstanceOf[String])
    case SAnd(l, r) => prunable(l) && prunable(r)
    case SOr(l, r) => prunable(l) && prunable(r)
    case _ => false
  }

  /** The connector's scan counters, one sum metric each — names must match
    * the task metrics the readers emit. */
  def customMetrics: Array[CustomMetric] = Array(
    new SegmentsDecodedMetric, new SegmentsPrunedMetric,
    new SegmentsPrunedTokenRangeMetric, new PayloadBytesDecodedMetric,
    new PayloadBytesPrunedMetric, new RowsEmittedMetric)
}

/** DSv2 custom metrics (driver side): each is instantiated reflectively by
  * Spark's metric aggregation, so every concrete class needs a no-arg
  * constructor. Sum semantics match the reference's Count metrics. */
sealed abstract class GraftSumMetric(n: String) extends CustomSumMetric {
  override def name(): String = n
  override def description(): String = n
}
final class SegmentsDecodedMetric extends GraftSumMetric("graft segments decoded")
final class SegmentsPrunedMetric extends GraftSumMetric("graft segments pruned (filter stats)")
final class SegmentsPrunedTokenRangeMetric extends GraftSumMetric("graft segments pruned (token range)")
final class PayloadBytesDecodedMetric extends GraftSumMetric("graft payload bytes decoded")
final class PayloadBytesPrunedMetric extends GraftSumMetric("graft payload bytes pruned")
final class RowsEmittedMetric extends GraftSumMetric("graft rows emitted")

final case class GraftTaskMetric(metricName: String, metricValue: Long) extends CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = metricValue
}

final case class GraftInputPartition(file: String) extends InputPartition

/** Per-chunk stats + payload pulled from one parquet Group. */
final case class ChunkStats(minV: Long, maxV: Long, minS: String,
                            maxS: String, payload: Array[Byte])

class GraftScan(
    val path: String,
    required: StructType,
    pushed: Array[Filter],
    limit: Option[Int],
    val tokenRange: Option[(Long, Long)],
    hconf: SerializableConfiguration,
    columnar: Boolean = GraftScan.ColumnarDefault)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      limit.map(n => s", PushedLimit: $n").getOrElse("") +
      tokenRange.map { case (lo, hi) => s", PushedTokenRange: [$lo, $hi]" }.getOrElse("")

  override def supportedCustomMetrics(): Array[CustomMetric] = GraftScan.customMetrics

  /** Used by [[GraftTokenRangePushdown]] once per scan (guarded by
    * `tokenRange.isEmpty`); the listing is re-derived lazily in the copy. */
  def withTokenRange(lo: Long, hi: Long): GraftScan =
    new GraftScan(path, required, pushed, limit, Some((lo, hi)), hconf, columnar)

  /** Committed part-files of the table, sorted (deterministic partition
    * order). Listed once per scan and shared by planning and statistics. */
  protected lazy val files: Seq[String] = GraftLayout.listDataFiles(path, hconf.value)

  /** Planning-time statistics from the segment headers: exact row count
    * (the same header sum the COUNT(*) path reads) and decoded size = the
    * header-recorded bytesIn of the PROJECTED streams — the measured
    * expansion of this very table, not a constant. Header sums are
    * memoized per immutable part-file ([[GraftLayout.header]]), so repeated
    * planning over a large table re-reads nothing. Catalyst uses the size
    * to broadcast small graft tables (a v2 scan is otherwise assumed
    * huge). */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val (rows, bytes) = {
      val conf = hconf.value
      var r = 0L
      var b = 0L
      val wantTokens = required.fieldNames.contains("tokens")
      val cols = required.fieldNames.toSet ++ (if (wantTokens) Set("tok_len") else Set.empty)
      files.foreach { f =>
        val h = GraftLayout.header(f, conf)
        r += h.rows
        b += h.bytesIn.collect { case (c, n) if cols.contains(c) => n }.sum
      }
      (r, math.max(1L, b))
    }
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // With a pushed limit and nothing to prune reader-side, part-files past
    // the limit are not even planned: walk headers in order until the row
    // sums cover it (typically one file — header-only driver reads).
    val chosen = limit match {
      case Some(n) if pushed.isEmpty && tokenRange.isEmpty =>
        val conf = hconf.value
        val out = ArrayBuffer.empty[String]
        var seen = 0L
        val it = files.iterator
        while (seen < n && it.hasNext) {
          val f = it.next()
          out += f
          seen += GraftLayout.header(f, conf).rows
        }
        out.toSeq
      case _ => files
    }
    chosen.map(f => GraftInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, pushed, limit, tokenRange, hconf, columnar)
}

class GraftReaderFactory(required: StructType, pushed: Array[Filter],
                         limit: Option[Int], tokenRange: Option[(Long, Long)],
                         hconf: SerializableConfiguration,
                         columnar: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition].file,
      required, pushed, limit, tokenRange, hconf.value)
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    new GraftColumnarPartitionReader(partition.asInstanceOf[GraftInputPartition].file,
      required, pushed, limit, tokenRange, hconf.value)
}

/** Header-only aggregate scan: COUNT(*)/MIN/MAX partials per part-file from
  * segment headers; payload pages are never requested from parquet. */
class GraftAggScan(path: String, specs: Seq[AggSpec], hconf: SerializableConfiguration)
    extends GraftScan(path, GraftTable.TokenSchema, Array.empty, None, None, hconf) {
  override def readSchema(): StructType = StructType(specs.map {
    case AggSpec.CountAll => StructField("count(*)", LongType, nullable = false)
    case AggSpec.MinOf("n_tok") => StructField("min(n_tok)", IntegerType, nullable = false)
    case AggSpec.MaxOf("n_tok") => StructField("max(n_tok)", IntegerType, nullable = false)
    case AggSpec.MinOf(c) => StructField(s"min($c)", StringType, nullable = false)
    case AggSpec.MaxOf(c) => StructField(s"max($c)", StringType, nullable = false)
  })
  override def description(): String =
    "GraftScan PushedAggregation: [" + specs.map {
      case AggSpec.CountAll => "COUNT(*)"
      case AggSpec.MinOf(c) => s"MIN($c)"
      case AggSpec.MaxOf(c) => s"MAX($c)"
    }.mkString(", ") + "]"
  override def createReaderFactory(): PartitionReaderFactory = {
    val hc = hconf
    val sp = specs
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new GraftAggReader(partition.asInstanceOf[GraftInputPartition].file, sp, hc.value)
    }
  }
}

/** One partial-aggregate row per part-file, computed from segment headers
  * only (the parquet requested schema drops the payload column, so data
  * pages are skipped at the IO layer). */
class GraftAggReader(file: String, specs: Seq[AggSpec], conf: Configuration)
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    done = true
    val needChunks = specs.exists { case AggSpec.CountAll => false; case _ => true }
    val reader = GraftLayout.openPruned(file, conf,
      top = if (needChunks) Set("nRows", "cols") else Set("nRows"),
      chunkFields = if (needChunks) Set("col", "minV", "maxV", "minS", "maxS") else Set.empty)
    var count = 0L
    var nSegs = 0L
    val minV = scala.collection.mutable.Map.empty[String, Long]
    val maxV = scala.collection.mutable.Map.empty[String, Long]
    val minS = scala.collection.mutable.Map.empty[String, String]
    val maxS = scala.collection.mutable.Map.empty[String, String]
    try {
      var g = reader.read()
      while (g != null) {
        nSegs += 1
        count += g.getInteger("nRows", 0)
        if (needChunks) {
          val wrapper = g.getGroup("cols", 0)
          val n = wrapper.getFieldRepetitionCount(0)
          var i = 0
          while (i < n) {
            val el = wrapper.getGroup(0, i).getGroup(0, 0)
            val c = el.getString("col", 0)
            if (c == "n_tok") {
              val lo = el.getLong("minV", 0)
              val hi = el.getLong("maxV", 0)
              minV.updateWith(c)(v => Some(v.fold(lo)(math.min(_, lo))))
              maxV.updateWith(c)(v => Some(v.fold(hi)(math.max(_, hi))))
            } else if (c == "doc_id" || c == "source") {
              val lo = el.getString("minS", 0)
              val hi = el.getString("maxS", 0)
              minS.updateWith(c)(v => Some(v.fold(lo)(p =>
                if (graft.engine.GraftEncoder.compareUtf8(lo, p) < 0) lo else p)))
              maxS.updateWith(c)(v => Some(v.fold(hi)(p =>
                if (graft.engine.GraftEncoder.compareUtf8(hi, p) > 0) hi else p)))
            }
            i += 1
          }
        }
        g = reader.read()
      }
    } finally reader.close()
    if (nSegs == 0L) return false // no partial from an empty file
    val out = new GenericInternalRow(specs.length)
    specs.zipWithIndex.foreach {
      case (AggSpec.CountAll, i) => out.setLong(i, count)
      case (AggSpec.MinOf("n_tok"), i) => out.setInt(i, minV("n_tok").toInt)
      case (AggSpec.MaxOf("n_tok"), i) => out.setInt(i, maxV("n_tok").toInt)
      case (AggSpec.MinOf(c), i) => out.update(i, UTF8String.fromString(minS(c)))
      case (AggSpec.MaxOf(c), i) => out.update(i, UTF8String.fromString(maxS(c)))
    }
    row = out
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** One decoded segment's projected column arrays (null = not projected). */
private[sources] final class DecodedSegment(
    val nRows: Int,
    val docIds: Array[String],
    val sources: Array[String],
    val nToks: Array[Long],
    val tokLens: Array[Long],
    val flat: Array[Long])

/** Shared per-part-file scan core for the row and columnar readers:
  * streams Segment groups from one parquet file, prunes on chunk stats
  * (pushed filters AND the optional token range), decodes ONLY the
  * projected streams, and keeps the task-level scan counters. */
private[sources] final class SegmentScanCore(
    file: String, required: StructType, pushed: Array[Filter],
    tokenRange: Option[(Long, Long)], conf: Configuration) {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new HPath(file))
      .withConf(conf).build()

  // per-task scan counters, reported to Spark as DSv2 custom task metrics
  var mSegsDecoded = 0L
  var mSegsPruned = 0L
  var mSegsPrunedTok = 0L
  var mBytesDecoded = 0L
  var mBytesPruned = 0L

  val needDoc: Boolean = required.fieldNames.contains("doc_id")
  val needTok: Boolean = required.fieldNames.contains("tokens")
  val needN: Boolean = required.fieldNames.contains("n_tok")
  val needSrc: Boolean = required.fieldNames.contains("source")

  /** Next matching segment, decoded; null at end of file. */
  def nextSegment(): DecodedSegment = {
    var g = reader.read()
    while (g != null) {
      val seg = decodeGroup(g)
      if (seg != null) return seg
      g = reader.read()
    }
    null
  }

  def close(): Unit = reader.close()

  def metricsValues(rowsEmitted: Long): Array[CustomTaskMetric] = Array(
    GraftTaskMetric("graft segments decoded", mSegsDecoded),
    GraftTaskMetric("graft segments pruned (filter stats)", mSegsPruned),
    GraftTaskMetric("graft segments pruned (token range)", mSegsPrunedTok),
    GraftTaskMetric("graft payload bytes decoded", mBytesDecoded),
    GraftTaskMetric("graft payload bytes pruned", mBytesPruned),
    GraftTaskMetric("graft rows emitted", rowsEmitted))

  private def chunks(g: Group): Map[String, ChunkStats] = {
    val wrapper = g.getGroup("cols", 0) // LIST wrapper
    val n = wrapper.getFieldRepetitionCount(0)
    (0 until n).map { i =>
      val el = wrapper.getGroup(0, i).getGroup(0, 0) // repeated "list" -> "element"
      el.getString("col", 0) -> ChunkStats(
        el.getLong("minV", 0), el.getLong("maxV", 0),
        el.getString("minS", 0), el.getString("maxS", 0),
        el.getBinary("payload", 0).getBytes)
    }.toMap
  }

  /** May this segment match the pushed filters? Sound, inexact — false
    * only when the chunk stats PROVE no row matches. AND/OR recurse with
    * may-match semantics (an upper bound composed of upper bounds). */
  private def mayMatch(c: Map[String, ChunkStats]): Boolean =
    pushed.forall(f => mayMatchOne(c, f))

  // Chunk minS/maxS were written in UTF-8 byte order (GraftEncoder
  // .compareUtf8, matching Spark SQL's UTF8String comparisons); the skip
  // tests must use the SAME order — Java String's UTF-16 code-unit order
  // disagrees for supplementary-plane characters and would make pruning
  // unsound there.
  private def leS(a: String, b: String): Boolean =
    graft.engine.GraftEncoder.compareUtf8(a, b) <= 0
  private def ltS(a: String, b: String): Boolean =
    graft.engine.GraftEncoder.compareUtf8(a, b) < 0

  // Every case is guarded by c.contains so a part-file whose segments lack
  // the chunk (foreign or evolved layout) degrades to may-match=true
  // instead of throwing.
  private def mayMatchOne(c: Map[String, ChunkStats], f: Filter): Boolean = f match {
    case EqualTo(a, v: String) if c.contains(a) =>
      val s = c(a); leS(s.minS, v) && leS(v, s.maxS)
    case GreaterThan(a, v: String) if c.contains(a) => ltS(v, c(a).maxS)
    case GreaterThanOrEqual(a, v: String) if c.contains(a) => leS(v, c(a).maxS)
    case LessThan(a, v: String) if c.contains(a) => ltS(c(a).minS, v)
    case LessThanOrEqual(a, v: String) if c.contains(a) => leS(c(a).minS, v)
    case EqualTo("n_tok", v: Int) if c.contains("n_tok") =>
      val s = c("n_tok"); s.minV <= v && v <= s.maxV
    case GreaterThan("n_tok", v: Int) if c.contains("n_tok") => c("n_tok").maxV > v
    case GreaterThanOrEqual("n_tok", v: Int) if c.contains("n_tok") => c("n_tok").maxV >= v
    case LessThan("n_tok", v: Int) if c.contains("n_tok") => c("n_tok").minV < v
    case LessThanOrEqual("n_tok", v: Int) if c.contains("n_tok") => c("n_tok").minV <= v
    case In(a, vs) if c.contains(a) =>
      val s = c(a)
      vs.exists { case v: String => leS(s.minS, v) && leS(v, s.maxS); case _ => true }
    case SAnd(l, r) => mayMatchOne(c, l) && mayMatchOne(c, r)
    case SOr(l, r) => mayMatchOne(c, l) || mayMatchOne(c, r)
    case _ => true
  }

  private def payloadBytes(c: Map[String, ChunkStats]): Long =
    c.valuesIterator.map(_.payload.length.toLong).sum

  private def decodeGroup(g: Group): DecodedSegment = {
    val byCol = chunks(g)
    if (!mayMatch(byCol)) {
      mSegsPruned += 1
      mBytesPruned += payloadBytes(byCol)
      return null
    }
    // token-range skip on the tokens chunk min/max — the engine's flagship
    // chunk skip (GraftEncoder.decodeWhereTokenRange), reachable from SQL
    // through GraftTokenRangePushdown; inexact, Spark re-filters.
    tokenRange match {
      case Some((lo, hi)) if byCol.contains("tokens") &&
        (byCol("tokens").minV > hi || byCol("tokens").maxV < lo) =>
        mSegsPrunedTok += 1
        mBytesPruned += payloadBytes(byCol)
        return null
      case _ => ()
    }
    mSegsDecoded += 1
    val nRows = g.getInteger("nRows", 0)
    val docIds = if (needDoc) StringCodecs.decodeChunk(byCol("doc_id").payload) else null
    val sources = if (needSrc) StringCodecs.decodeChunk(byCol("source").payload) else null
    val nToks = if (needN) IntCodecs.decodeChunk(byCol("n_tok").payload) else null
    val tokLens = if (needTok) IntCodecs.decodeChunk(byCol("tok_len").payload) else null
    val flat = if (needTok) IntCodecs.decodeChunk(byCol("tokens").payload) else null
    mBytesDecoded += byCol.iterator.collect {
      case (c, s) if (c == "doc_id" && needDoc) || (c == "source" && needSrc) ||
        (c == "n_tok" && needN) || ((c == "tokens" || c == "tok_len") && needTok) =>
        s.payload.length.toLong
    }.sum
    new DecodedSegment(nRows, docIds, sources, nToks, tokLens, flat)
  }
}

/** Row-based reader: wraps the scan core, emits one InternalRow per doc,
  * stops at the pushed limit. */
class GraftPartitionReader(file: String, required: StructType, pushed: Array[Filter],
                           limit: Option[Int], tokenRange: Option[(Long, Long)],
                           conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val core = new SegmentScanCore(file, required, pushed, tokenRange, conf)
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _
  private var mRows = 0L
  private val maxRows: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)

  override def next(): Boolean = {
    if (mRows >= maxRows) return false // pushed limit: stop opening groups
    while (!rows.hasNext) {
      val seg = core.nextSegment()
      if (seg == null) return false
      rows = rowsOf(seg)
    }
    current = rows.next()
    mRows += 1
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = core.close()

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    core.metricsValues(mRows)

  private def rowsOf(seg: DecodedSegment): Iterator[InternalRow] = {
    var pos = 0
    (0 until seg.nRows).iterator.map { i =>
      val row = new GenericInternalRow(required.length)
      var f = 0
      required.fieldNames.foreach { name =>
        name match {
          case "doc_id" => row.update(f, UTF8String.fromString(seg.docIds(i)))
          case "tokens" =>
            val len = seg.tokLens(i).toInt
            val t = new Array[Int](len)
            var j = 0
            while (j < len) { t(j) = seg.flat(pos + j).toInt; j += 1 }
            pos += len
            row.update(f, new GenericArrayData(t))
          case "n_tok" => row.setInt(f, seg.nToks(i).toInt)
          case "source" => row.update(f, UTF8String.fromString(seg.sources(i)))
        }
        f += 1
      }
      row
    }
  }
}

/** Columnar reader: one [[ColumnarBatch]] per decoded segment, built on
  * [[OnHeapColumnVector]]s — the Spark-native rendering of the reference's
  * Arrow `RecordBatch` stream (/root/reference/src/opener.rs:308-358; its
  * DEFAULT_BATCH_SIZE 8192 ≈ our segment row counts). Downstream, Spark
  * fuses the batches into whole-stage codegen via ColumnarToRow, skipping
  * the per-row object allocation of the row path; token arrays land as one
  * bulk `putInts` into the child vector per segment. */
class GraftColumnarPartitionReader(file: String, required: StructType,
                                   pushed: Array[Filter], limit: Option[Int],
                                   tokenRange: Option[(Long, Long)],
                                   conf: Configuration)
    extends PartitionReader[ColumnarBatch] {

  private val core = new SegmentScanCore(file, required, pushed, tokenRange, conf)
  private var batch: ColumnarBatch = _
  private var mRows = 0L
  private val maxRows: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (mRows >= maxRows) return false
    val seg = core.nextSegment()
    if (seg == null) return false
    // a pushed limit truncates the final batch (validity of the emitted
    // rows is unaffected; Spark still applies the exact global limit)
    val n = math.min(seg.nRows.toLong, maxRows - mRows).toInt
    batch = toBatch(seg, n)
    mRows += n
    true
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    if (batch != null) { batch.close(); batch = null }
    core.close()
  }

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    core.metricsValues(mRows)

  private def toBatch(seg: DecodedSegment, n: Int): ColumnarBatch = {
    val vectors = OnHeapColumnVector.allocateColumns(n, required)
    var f = 0
    required.fieldNames.foreach { name =>
      val v = vectors(f)
      name match {
        case "doc_id" =>
          var i = 0
          while (i < n) { v.putByteArray(i, seg.docIds(i).getBytes(utf8)); i += 1 }
        case "source" =>
          var i = 0
          while (i < n) { v.putByteArray(i, seg.sources(i).getBytes(utf8)); i += 1 }
        case "n_tok" =>
          var i = 0
          while (i < n) { v.putInt(i, seg.nToks(i).toInt); i += 1 }
        case "tokens" =>
          // total token count of the emitted rows (== full flat length
          // unless the limit truncated the batch)
          var total = 0
          var i = 0
          while (i < n) { total += seg.tokLens(i).toInt; i += 1 }
          val ints = new Array[Int](total)
          var j = 0
          while (j < total) { ints(j) = seg.flat(j).toInt; j += 1 }
          val child = v.arrayData()
          child.reserve(total)
          child.putInts(0, total, ints, 0)
          var off = 0
          i = 0
          while (i < n) {
            val len = seg.tokLens(i).toInt
            v.putArray(i, off, len)
            off += len
            i += 1
          }
      }
      f += 1
    }
    new ColumnarBatch(vectors.asInstanceOf[Array[ColumnVector]], n)
  }
}
