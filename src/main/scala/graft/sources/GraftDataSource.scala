package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{And => SAnd, DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Or => SOr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
  *  - **scan opener** (§2.A.5/7): one InputPartition per segment part-file;
  *    each reader streams Groups straight from parquet with no Spark
  *    session on the executor path.
  *
  * Works on both layouts: a bare `Dataset[Segment].write.parquet(dir)` dump
  * and a [[graft.lineage.SegmentStore]] table dir (reads `dir/data`,
  * ignores the lineage ledger).
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

  /** Test-only telemetry (single-JVM): segments pruned by pushed stats. */
  val segmentsPruned = new java.util.concurrent.atomic.LongAdder
  val segmentsRead = new java.util.concurrent.atomic.LongAdder
}

class GraftTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft:$path"
  override def schema(): StructType = GraftTable.TokenSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path)
}

class GraftScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var required: StructType = GraftTable.TokenSchema
  private var pushed: Array[Filter] = Array.empty
  private var countStar = false

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

  /** COUNT(*) with no grouping and no residual filters reduces to summing
    * the segment headers' nRows — the reader requests a parquet schema of
    * JUST that int32, so payload pages are never read at all (a count over
    * the 10^12-row table touches megabytes, not petabytes). Partial
    * pushdown: each partition returns its own sum, Spark adds them up.
    * Any filter blocks the push (Spark only offers the aggregate when the
    * plan has no post-scan Filter, and ours always re-filters). */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions()(0).isInstanceOf[CountStar] &&
      pushed.isEmpty
    if (ok) countStar = true
    ok
  }

  override def build(): Scan =
    if (countStar) new GraftCountScan(path) else new GraftScan(path, required, pushed)
}

object GraftScan {
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
}

final case class GraftInputPartition(file: String) extends InputPartition

/** Per-chunk stats + payload pulled from one parquet Group. */
final case class ChunkStats(minV: Long, maxV: Long, minS: String,
                            maxS: String, payload: Array[Byte])

class GraftScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  /** Planning-time size estimate so Catalyst can pick broadcast joins over
    * small graft tables (the optimizer otherwise assumes a v2 scan is huge
    * and never broadcasts). Stored segment bytes times the measured
    * lightweight-compression expansion (~2.2x, BASELINE.md) approximates
    * decoded width; a projection that skips `tokens` shrinks the estimate
    * by the tokens stream's share of stored bytes (~90%). */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val bytes: Long = {
      val conf = new Configuration()
      val stored = planInputPartitions().map { p =>
        val hp = new HPath(p.asInstanceOf[GraftInputPartition].file)
        hp.getFileSystem(conf).getFileStatus(hp).getLen
      }.sum
      val expansion = 2.2
      val projFraction = if (required.fieldNames.contains("tokens")) 1.0 else 0.1
      math.max(1L, (stored * expansion * projFraction).toLong)
    }
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val dataDir = new HPath(path, "data")
    val fs = dataDir.getFileSystem(conf)
    val root = if (fs.exists(dataDir)) dataDir else new HPath(path)
    val files = ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        files += f.getPath.toString
    }
    files.sorted.map(f => GraftInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, pushed)
}

class GraftReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition].file,
      required, pushed)
}

/** COUNT(*)-pushed scan: partial counts from segment headers only. */
class GraftCountScan(path: String) extends GraftScan(path, GraftTable.TokenSchema, Array.empty) {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count", LongType, nullable = false)))
  override def description(): String = s"GraftScan PushedAggregation: [COUNT(*)]"
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new GraftCountReader(partition.asInstanceOf[GraftInputPartition].file)
    }
}

/** Sums nRows per part-file; the parquet requested schema is the single
  * int32 column, so payload pages are skipped at the IO layer. */
class GraftCountReader(file: String) extends PartitionReader[InternalRow] {
  private var done = false
  override def next(): Boolean = !done && { done = true; true }
  override def get(): InternalRow = {
    val conf = new Configuration()
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      "message spark_schema { required int32 nRows; }")
    val reader = ParquetReader.builder(new GroupReadSupport(), new HPath(file))
      .withConf(conf).build()
    var total = 0L
    try {
      var g = reader.read()
      while (g != null) {
        total += g.getInteger("nRows", 0)
        g = reader.read()
      }
    } finally reader.close()
    val row = new GenericInternalRow(1)
    row.setLong(0, total)
    row
  }
  override def close(): Unit = ()
}

/** Streams Segment groups from one parquet part-file, prunes on chunk
  * stats, decodes ONLY the projected streams, emits InternalRows. */
class GraftPartitionReader(file: String, required: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new HPath(file))
      .withConf(new Configuration()).build()
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  private val needDoc = required.fieldNames.contains("doc_id")
  private val needTok = required.fieldNames.contains("tokens")
  private val needN = required.fieldNames.contains("n_tok")
  private val needSrc = required.fieldNames.contains("source")

  override def next(): Boolean = {
    while (!rows.hasNext) {
      val g = reader.read()
      if (g == null) return false
      rows = decodeGroup(g)
    }
    current = rows.next()
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()

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

  private def mayMatchOne(c: Map[String, ChunkStats], f: Filter): Boolean = f match {
    case EqualTo(a, v: String) if c.contains(a) =>
      val s = c(a); leS(s.minS, v) && leS(v, s.maxS)
    case GreaterThan(a, v: String) if c.contains(a) => ltS(v, c(a).maxS)
    case GreaterThanOrEqual(a, v: String) if c.contains(a) => leS(v, c(a).maxS)
    case LessThan(a, v: String) if c.contains(a) => ltS(c(a).minS, v)
    case LessThanOrEqual(a, v: String) if c.contains(a) => leS(c(a).minS, v)
    case EqualTo("n_tok", v: Int) =>
      val s = c("n_tok"); s.minV <= v && v <= s.maxV
    case GreaterThan("n_tok", v: Int) => c("n_tok").maxV > v
    case GreaterThanOrEqual("n_tok", v: Int) => c("n_tok").maxV >= v
    case LessThan("n_tok", v: Int) => c("n_tok").minV < v
    case LessThanOrEqual("n_tok", v: Int) => c("n_tok").minV <= v
    case In(a, vs) if c.contains(a) =>
      val s = c(a)
      vs.exists { case v: String => leS(s.minS, v) && leS(v, s.maxS); case _ => true }
    case SAnd(l, r) => mayMatchOne(c, l) && mayMatchOne(c, r)
    case SOr(l, r) => mayMatchOne(c, l) || mayMatchOne(c, r)
    case _ => true
  }

  private def decodeGroup(g: Group): Iterator[InternalRow] = {
    val byCol = chunks(g)
    if (!mayMatch(byCol)) {
      GraftTable.segmentsPruned.increment()
      return Iterator.empty
    }
    GraftTable.segmentsRead.increment()
    val nRows = g.getInteger("nRows", 0)
    val docIds = if (needDoc) StringCodecs.decodeChunk(byCol("doc_id").payload) else null
    val sources = if (needSrc) StringCodecs.decodeChunk(byCol("source").payload) else null
    val nToks = if (needN) IntCodecs.decodeChunk(byCol("n_tok").payload) else null
    val tokLens = if (needTok) IntCodecs.decodeChunk(byCol("tok_len").payload) else null
    val flat = if (needTok) IntCodecs.decodeChunk(byCol("tokens").payload) else null
    var pos = 0
    (0 until nRows).iterator.map { i =>
      val row = new GenericInternalRow(required.length)
      var f = 0
      required.fieldNames.foreach { name =>
        name match {
          case "doc_id" => row.update(f, UTF8String.fromString(docIds(i)))
          case "tokens" =>
            val len = tokLens(i).toInt
            val t = new Array[Int](len)
            var j = 0
            while (j < len) { t(j) = flat(pos + j).toInt; j += 1 }
            pos += len
            row.update(f, new GenericArrayData(t))
          case "n_tok" => row.setInt(f, nToks(i).toInt)
          case "source" => row.update(f, UTF8String.fromString(sources(i)))
        }
        f += 1
      }
      row
    }
  }
}
