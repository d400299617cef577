package graft.bench

import org.apache.spark.sql.functions._

/** Scan-side payoff of column-pruned decode ([[graft.engine.GraftEncoder
  * .decodeProjected]]): time a full decode vs a `doc_id, n_tok` projected
  * decode of the same stored segment table. The projection skips inflating
  * the tokens/tok_len streams (~95% of stored bytes), so the projected scan
  * should approach parquet-read speed. One JSON line; numbers belong in
  * BASELINE.md next to the decode row.
  *
  * Env: SPARK_GRAFT_BENCH_DOCS (default 3000000), SPARK_GRAFT_CORES
  * (default 16), SPARK_GRAFT_REPS (default 3).
  */
object ProjectedScanBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "3000000").toLong
    val cores = sys.env.getOrElse("SPARK_GRAFT_CORES", "16").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt

    val prep = EncodeBench.session(cores)
    val inputPath = EncodeBench.ensureInput(prep, nDocs)
    EncodeBench.storedBytes(prep, inputPath, buckets = 512) // ensure segDir
    val segDir = EncodeBench.storedSegDir(inputPath)
    val spark = EncodeBench.session(cores)
    import spark.implicits._

    def segs = spark.read.parquet(segDir).drop("snapshotId")
      .as[graft.engine.Segment]
    def timedFull(): (Double, Long) = {
      val t0 = System.nanoTime()
      val agg = graft.engine.GraftEncoder.decode(segs)
        .agg(sum(size($"tokens")).cast("long")).collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, agg)
    }
    def timedProjected(): (Double, Long) = {
      val t0 = System.nanoTime()
      val agg = graft.engine.GraftEncoder.decodeProjected(segs, Seq("doc_id", "n_tok"))
        .agg(sum($"n_tok").cast("long")).collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, agg)
    }

    timedFull(); timedProjected() // warm
    val full = (1 to reps).map(_ => timedFull()).minBy(_._1)
    val proj = (1 to reps).map(_ => timedProjected()).minBy(_._1)
    require(full._2 == proj._2,
      s"projected n_tok total ${proj._2} != full token count ${full._2}")
    val tokenGb = full._2 * 4.0 / 1e9
    println(
      f"""{"metric":"projected_scan","cores":$cores,"n_docs":$nDocs,"token_gb":$tokenGb%.3f,""" +
        f""""full_secs":${full._1}%.3f,"full_gbps":${tokenGb / full._1}%.3f,""" +
        f""""projected_secs":${proj._1}%.3f,"projected_gbps":${tokenGb / proj._1}%.3f,""" +
        f""""speedup":${full._1 / proj._1}%.2f}""")
    EncodeBench.session(1).stop()
  }
}
