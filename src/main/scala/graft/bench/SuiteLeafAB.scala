package graft.bench

import org.apache.spark.sql.SparkSession

import graft.queries0.Relational
import graft.sources.GraftTableBridge

/** A-B profiler for the graft-suite sub-second leaf cost (round-5 item 5):
  * run ONE relational entry alternately against parquet and graft-bridge
  * leaves, several reps each, and print per-rep seconds — isolates the
  * per-query fixed cost the full suite can only show once per entry.
  *
  * Usage: `sbt "runMain graft.bench.SuiteLeafAB [entry] [reps] [sfDir]"`
  */
object SuiteLeafAB {
  def main(args: Array[String]): Unit = {
    val entry = args.headOption.getOrElse("q_agg_avg_filtered")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val sfDir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-suite-leaf-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft-leaf-ab").toString
    try {
      val fn = Relational.all(entry)
      // bridge only the tables the suite bridges (same bucket counts)
      Seq("region" -> 1, "nation" -> 1, "supplier" -> 2, "part" -> 2,
        "customer" -> 4, "orders" -> 8, "lineitem" -> 8, "events" -> 4,
        "documents" -> 4).foreach { case (name, buckets) =>
        GraftTableBridge.write(
          spark.read.parquet(s"$sfDir/$name.parquet"), s"$root/$name", name, buckets)
      }
      def time(label: String, graft: Boolean): Unit = {
        if (graft) spark.conf.set(GraftTableBridge.TableRootKey, root)
        else spark.conf.unset(GraftTableBridge.TableRootKey)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[leaf-ab] $label%-8s ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
      // interleave so both sides sample the same noise climate
      (1 to reps).foreach { _ => time("parquet", graft = false); time("graft", graft = true) }
    } finally {
      spark.conf.unset(GraftTableBridge.TableRootKey)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(root))
      spark.stop()
    }
  }
}
