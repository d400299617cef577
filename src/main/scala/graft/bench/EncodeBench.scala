package graft.bench

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{GraftEncoder, TokenTables}

/** Encode-throughput measurement kit (the north metric: GB/s of token bytes
  * in, compression ratio vs an independent ORC writer, scaling efficiency
  * between two parallelism levels — BASELINE.json). Shared by [[graft.Bench]]
  * (per-round driver run) and [[graft.ScalingBench]] (the N vs 4N evidence).
  */
object EncodeBench {

  final case class EncodeRun(
      cpus: Int,
      secs: Double,
      nDocs: Long,
      nTokens: Long,
      tokenBytes: Long,
      bytesIn: Long,
      bytesOut: Long) {
    def gbps: Double = tokenBytes / 1e9 / secs
    def ratio: Double = bytesIn.toDouble / bytesOut
  }

  /** Materialize the deterministic synthetic token table once as parquet so
    * timed runs measure encode, not synthesis. Path keyed by (nDocs, seed). */
  def ensureInput(spark: SparkSession, nDocs: Long, seed: Long = 42L): String = {
    val path = s"target/bench-input/tokens-$nDocs-$seed.parquet"
    if (!new java.io.File(path).exists()) {
      TokenTables.synthetic(spark, nDocs, seed, partitions = 64)
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
    path
  }

  /** One timed encode job: read parquet -> salt/repartition -> encode ->
    * aggregate byte totals (forces every payload). No disk on the output
    * side so both parallelism levels hit compute+shuffle, not the single
    * local SSD. */
  def timedEncode(spark: SparkSession, inputPath: String, buckets: Int,
                  cpus: Int): EncodeRun = {
    import spark.implicits._
    val input = spark.read.parquet(inputPath).as[graft.engine.TokenRow]
    val t0 = System.nanoTime()
    val agg = GraftEncoder.encode(input, buckets)
      .agg(
        sum($"nRows").as("rows"),
        sum($"nTokens").as("toks"),
        sum($"bytesIn").as("bi"),
        sum($"bytesOut").as("bo"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    val nTokens = agg.getLong(1)
    EncodeRun(cpus, secs, agg.getLong(0), nTokens, nTokens * 4L,
      agg.getLong(2), agg.getLong(3))
  }

  /** Independent ORC writer baseline (the reference's own stance: its size
    * baseline came from PyArrow's ORC writer, not its own code —
    * /root/reference/scripts/convert_tpcds_to_orc.py:71). Returns
    * (snappyBytes, zlibBytes) of the same table written by ORC Java. */
  def orcBaseline(spark: SparkSession, inputPath: String): (Long, Long) = {
    val df = spark.read.parquet(inputPath)
    def write(codec: String): Long = {
      val out = s"target/bench-input/orc-$codec-${new java.io.File(inputPath).getName}"
      df.write.mode(SaveMode.Overwrite).option("compression", codec).orc(out)
      dirBytes(new java.io.File(out))
    }
    (write("snappy"), write("zlib"))
  }

  def dirBytes(f: java.io.File): Long =
    if (f.isFile) { if (f.getName.startsWith("_") || f.getName.startsWith(".")) 0L else f.length() }
    else if (f.isDirectory) f.listFiles().map(dirBytes).sum
    else 0L

  /** Our end-to-end stored size: segments written as the parquet segment
    * table (what actually lands on disk, headers + lineage overhead
    * included). */
  def storedBytes(spark: SparkSession, inputPath: String, buckets: Int): Long = {
    import spark.implicits._
    val input = spark.read.parquet(inputPath).as[graft.engine.TokenRow]
    val out = s"target/bench-input/graft-segments-${new java.io.File(inputPath).getName}"
    GraftEncoder.encode(input, buckets).write.mode(SaveMode.Overwrite).parquet(out)
    dirBytes(new java.io.File(out))
  }

  def session(cpus: Int): SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // Shuffle spill dir on tmpfs: on a real cluster every executor has its
    // own local disks; in this single-node sandbox all `local[n]` threads
    // share one SSD, which would fake a scaling ceiling that a cluster
    // doesn't have. 125 GiB RAM >> bench shuffle volume.
    val shm = new java.io.File("/dev/shm/graft-spark-local")
    if (!shm.exists()) shm.mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.local.dir", shm.getAbsolutePath)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
