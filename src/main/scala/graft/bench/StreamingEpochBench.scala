package graft.bench

import org.apache.spark.sql.SparkSession

import graft.engine.TokenTables
import graft.lineage.SegmentStore

/** Per-epoch fixed-cost probe for the streaming sink (round-5 item 4):
  * drain K tiny micro-batches (one input file each) after a warm-up drain,
  * and report seconds per epoch. The batches are deliberately near-empty,
  * so the number is almost pure fixed cost — source listing, the single
  * encode job, and the driver-side ledger append.
  *
  * Usage: `sbt "runMain graft.bench.StreamingEpochBench [epochs] [docsPerEpoch]"`
  */
object StreamingEpochBench {
  def main(args: Array[String]): Unit = {
    val epochs = args.headOption.map(_.toInt).getOrElse(6)
    val docsPerEpoch = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-streaming-epoch-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-epoch-bench").toString
    try {
      def writeBatches(dir: String, n: Int): Unit =
        (0 until n).foreach { i =>
          TokenTables.synthetic(spark, nDocs = docsPerEpoch, seed = 100L + i)
            .coalesce(1).write.parquet(s"$dir/b$i")
        }
      // warm-up: one full drain on its own table (JIT, codegen, committers)
      writeBatches(s"$base/in-warm", 2)
      graft.streaming.StreamingEncode.drain(
        spark, s"$base/in-warm/*", s"$base/t-warm", s"$base/ck-warm", buckets = 4)
      // A-B floor: the same drain with a NO-OP foreachBatch body — pure
      // Structured Streaming machinery (listing, offset/commit logs,
      // micro-batch planning); the encode path cannot go below this.
      writeBatches(s"$base/in-noop", epochs)
      val tn0 = System.nanoTime()
      spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[graft.engine.TokenRow].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in-noop/*")
        .writeStream
        .option("checkpointLocation", s"$base/ck-noop")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      val noopSec = (System.nanoTime() - tn0) / 1e9
      // measured drain: `epochs` single-file micro-batches
      writeBatches(s"$base/in", epochs)
      val t0 = System.nanoTime()
      graft.streaming.StreamingEncode.drain(
        spark, s"$base/in/*", s"$base/t", s"$base/ck", buckets = 4)
      val dt = (System.nanoTime() - t0) / 1e9
      val n = SegmentStore.readLineage(spark, s"$base/t")
        .filter(org.apache.spark.sql.functions.col("status") === SegmentStore.Committed)
        .select("snapshotId").distinct().count()
      println(f"""{"bench":"streaming_epoch","epochs":$n,"docs_per_epoch":$docsPerEpoch,""" +
        f""""total_sec":$dt%.3f,"sec_per_epoch":${dt / math.max(1L, n)}%.3f,""" +
        f""""noop_sec_per_epoch":${noopSec / epochs}%.3f}""")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(base))
      spark.stop()
    }
  }
}
