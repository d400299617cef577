package graft.engine

import org.apache.spark.sql.SparkSession

/** Typed engine options parsed from `spark.conf` string keys — the analog
  * of the reference's options plumbing (`OrcReadOptions` string parsing
  * with typed errors, /root/reference/src/options.rs:49-98; its factory
  * accepts `orc.batch_size`-style keys, src/file_format.rs:42-86). Unknown
  * `graft.*` keys are tolerated like the reference tolerates unknown
  * option keys (options.rs behavior pinned by its unit tests :116-225);
  * malformed values fail fast with the offending key in the message.
  *
  * @param tokensPerChunk chunk budget in tokens (the encode work unit)
  * @param buckets        salt/shuffle bucket count (tasks of the encode job)
  * @param zlibLevel      block-compression zlib level 0-9
  * @param deflateMinGain sampled-gain threshold below which the block
  *                       compressor skips the full deflate pass
  * @param dictThreshold  distinct/total ratio bound for dictionary encoding
  *                       (ORC `orc.dictionary.key.threshold` analog)
  * @param bloomColumns   streams carrying a per-chunk bloom filter (ORC
  *                       `orc.bloom.filter.columns` analog: opt-in per
  *                       column; doc_id by default — see
  *                       [[graft.codec.CodecConf.bloomColumns]])
  */
final case class GraftConf(
    tokensPerChunk: Int = GraftEncoder.DefaultTokensPerChunk,
    buckets: Int = 256,
    zlibLevel: Int = 6,
    deflateMinGain: Double = graft.codec.BlockCompression.MinSampledGain,
    dictThreshold: Double = graft.select.CodecSelector.DictThreshold,
    bloomColumns: Set[String] = graft.codec.CodecConf.DefaultBloomColumns,
    fileBloomBytes: Int = graft.codec.CodecConf.DefaultFileBloomBytes,
    sortBy: Option[String] = None) {
  require(tokensPerChunk > 0, s"${GraftConf.TokensPerChunk} must be > 0, got $tokensPerChunk")
  require(buckets > 0, s"${GraftConf.Buckets} must be > 0, got $buckets")
  require(zlibLevel >= 0 && zlibLevel <= 9, s"${GraftConf.ZlibLevel} must be in [0,9], got $zlibLevel")
  require(deflateMinGain >= 0 && deflateMinGain <= 1,
    s"${GraftConf.DeflateMinGain} must be in [0,1], got $deflateMinGain")
  require(dictThreshold >= 0 && dictThreshold <= 1,
    s"${GraftConf.DictThreshold} must be in [0,1], got $dictThreshold")
  // canonical streams by name, plus any legal METADATA column name (the
  // writer validates the actual schema; an opted-in name with no stream
  // simply never builds a filter)
  require(bloomColumns.forall(c => GraftConf.BloomableColumns.contains(c) ||
    (GraftConf.LegalSortName.matches(c) && !c.contains("__"))),
    s"${GraftConf.BloomColumns} entries must be canonical streams " +
      s"(${GraftConf.BloomableColumns.toSeq.sorted.mkString(",")}), legal " +
      "metadata column names, or 'col.member' struct paths, " +
      s"got ${bloomColumns.mkString(",")}")
  require(fileBloomBytes >= 0, s"${GraftConf.FileBloomBytes} must be >= 0, got $fileBloomBytes")
  // USER-facing name: a scalar metadata column, or a struct member as
  // `col.member`; the write builder resolves it to the engine stream and
  // validates it against the actual schema
  require(sortBy.forall(_.split(',').iterator.map(_.trim).filter(_.nonEmpty)
      .forall(GraftConf.LegalSortName.matches)),
    s"${GraftConf.SortBy} must be a comma-separated list of metadata columns " +
      s"or struct members (e.g. 'lang' or 'lang,info.score'), got ${sortBy.getOrElse("")}")

  /** The kernel-facing slice, threaded through every codec call as an
    * immutable value (never global state — see [[graft.codec.CodecConf]]). */
  def codec: graft.codec.CodecConf =
    graft.codec.CodecConf(zlibLevel, deflateMinGain, dictThreshold, bloomColumns,
      fileBloomBytes) // sortBy is resolved to its ENGINE stream by the writer
}

object GraftConf {
  final val TokensPerChunk = "graft.codec.tokensPerChunk"
  final val Buckets = "graft.encode.buckets"
  final val ZlibLevel = "graft.codec.zlibLevel"
  final val DeflateMinGain = "graft.codec.deflateMinGain"
  final val DictThreshold = "graft.codec.dictThreshold"
  final val BloomColumns = "graft.codec.bloomColumns"
  final val FileBloomBytes = "graft.codec.fileBloomBytes"
  final val SortBy = "graft.write.sortBy"

  /** Streams a bloom can be requested on (the five encoded streams). */
  final val BloomableColumns: Set[String] =
    Set("doc_id", "source", "tokens", "n_tok", "tok_len")

  /** Metadata column names follow the same rule [[graft.sources.MetaColumns]]
    * enforces at write time. */
  final val LegalStreamName: scala.util.matching.Regex = "[a-z][a-z0-9_]*".r

  /** sortBy accepts a column name or one `col.member` struct path. */
  final val LegalSortName: scala.util.matching.Regex =
    "[a-z][a-z0-9_]*(\\.[a-z][a-z0-9_]*)?".r

  private def parseInt(key: String, v: String): Int =
    try v.trim.toInt
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"invalid integer for $key: '$v'") }

  private def parseDouble(key: String, v: String): Double =
    try v.trim.toDouble
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"invalid number for $key: '$v'") }

  /** Parse from raw key/value pairs (unit-testable without Spark). Keys
    * match case-INSENSITIVELY: the DSv2 write path hands options through
    * `CaseInsensitiveStringMap`, which lower-cases every key — a
    * case-sensitive lookup would silently ignore every `graft.*` write
    * option (`.option("graft.codec.bloomColumns", ...)` arrives as
    * `graft.codec.bloomcolumns`). */
  def fromMap(m: Map[String, String]): GraftConf = {
    val norm = m.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    def get(key: String): Option[String] = norm.get(key.toLowerCase(java.util.Locale.ROOT))
    val d = GraftConf()
    GraftConf(
      tokensPerChunk = get(TokensPerChunk).map(parseInt(TokensPerChunk, _)).getOrElse(d.tokensPerChunk),
      buckets = get(Buckets).map(parseInt(Buckets, _)).getOrElse(d.buckets),
      zlibLevel = get(ZlibLevel).map(parseInt(ZlibLevel, _)).getOrElse(d.zlibLevel),
      deflateMinGain = get(DeflateMinGain).map(parseDouble(DeflateMinGain, _)).getOrElse(d.deflateMinGain),
      dictThreshold = get(DictThreshold).map(parseDouble(DictThreshold, _)).getOrElse(d.dictThreshold),
      bloomColumns = get(BloomColumns)
        .map(_.split(',').iterator.map(_.trim.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty).toSet)
        .getOrElse(d.bloomColumns),
      fileBloomBytes = get(FileBloomBytes).map(parseInt(FileBloomBytes, _)).getOrElse(d.fileBloomBytes),
      sortBy = get(SortBy).map(_.trim.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty))
  }

  /** Read every `graft.*` key from the session conf. */
  def fromSession(spark: SparkSession): GraftConf =
    fromMap(spark.conf.getAll.filter(_._1.startsWith("graft.")))
}
