package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.TokenTables
import graft.lineage.SegmentStore

/** Row vs columnar connector-scan microbench: the same full-decode
  * aggregation through `spark.read.format("graft")` with the columnar
  * reader on and off (aggregates chosen to be NON-pushable — `sum(n_tok)`
  * with `sum(size(tokens))` and `sum(length(doc_id))` force a real decode
  * of every projected stream; a bare count would collapse to the
  * header-only COUNT path and measure nothing).
  *
  * Usage: `sbt "runMain graft.bench.Dsv2ScanBench [nDocs] [reps]"`
  * (defaults 600000 docs ≈ 160 MB of tokens, 5 reps, min-of reported).
  */
object Dsv2ScanBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(600000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-dsv2-scan-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-dsv2-bench").toString
    try {
      val input = TokenTables.synthetic(spark, nDocs = nDocs, seed = 42L)
      SegmentStore.encodeCommit(input, base, snapshotId = 1L, buckets = cpus.toInt)
      val decodedBytes = SegmentStore.readLineage(spark, base)
        .agg(sum(col("bytesIn"))).collect()(0).getLong(0)

      def fullScan(columnar: Boolean): DataFrame =
        spark.read.format("graft").option("columnar", columnar.toString).load(base)
          .agg(sum(col("n_tok")).as("s1"),
            sum(size(col("tokens"))).cast("long").as("s2"),
            sum(length(col("doc_id"))).cast("long").as("s3"))

      def projScan(columnar: Boolean): DataFrame =
        spark.read.format("graft").option("columnar", columnar.toString).load(base)
          .select(col("doc_id"), col("n_tok"))
          .agg(sum(col("n_tok")).as("s1"), sum(length(col("doc_id"))).cast("long").as("s3"))

      def time(mk: => DataFrame): Double = {
        var best = Double.MaxValue
        var check: Long = -1L
        (1 to reps).foreach { _ =>
          val t0 = System.nanoTime()
          val r = mk.collect()(0)
          val dt = (System.nanoTime() - t0) / 1e9
          val s1 = r.getLong(0)
          if (check < 0) check = s1 else require(check == s1, "result drift across reps")
          if (dt < best) best = dt
        }
        best
      }

      // pruning A-B: a selective point lookup with pushdown+bloom on vs the
      // kill switches off ([[graft.sources.ScanToggles]]) — the measured
      // win of the stat/bloom machinery on the SAME data and query
      def pointScan(pushdown: Boolean): DataFrame =
        spark.read.format("graft")
          .option("pushdown", pushdown.toString).option("bloom", pushdown.toString)
          .load(base)
          .filter(col("doc_id") === f"doc_${nDocs / 2}%012d")
          .agg(sum(col("n_tok")).as("s1"))

      val rowFull = time(fullScan(columnar = false))
      val colFull = time(fullScan(columnar = true))
      val rowProj = time(projScan(columnar = false))
      val colProj = time(projScan(columnar = true))
      val prunedOn = time(pointScan(pushdown = true))
      val prunedOff = time(pointScan(pushdown = false))
      val gb = decodedBytes / 1e9
      println(f"""{"bench":"dsv2_scan","n_docs":$nDocs,"decoded_gb":$gb%.3f,""" +
        f""""full_row_sec":$rowFull%.3f,"full_columnar_sec":$colFull%.3f,""" +
        f""""full_row_gbps":${gb / rowFull}%.3f,"full_columnar_gbps":${gb / colFull}%.3f,""" +
        f""""proj_row_sec":$rowProj%.3f,"proj_columnar_sec":$colProj%.3f,""" +
        f""""columnar_speedup_full":${rowFull / colFull}%.3f,"columnar_speedup_proj":${rowProj / colProj}%.3f,""" +
        f""""point_pruned_sec":$prunedOn%.3f,"point_unpruned_sec":$prunedOff%.3f,""" +
        f""""pruning_speedup":${prunedOff / prunedOn}%.3f}""")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
      spark.stop()
    }
  }
}
