package graft

import graft.bench.EncodeBench

/** The north_rule two-cluster-size evidence, adapted to this sandbox per
  * the driver instruction: no real cluster exists, so the SAME encode job
  * runs on the SAME input at two parallelism levels (N = local[8],
  * 4N = local[32]; 32 hw threads available) and we report throughput at
  * both plus scaling efficiency = (T_N / T_4N) / 4. Also measures the
  * compression gate: our stored bytes vs ORC Java (snappy + zlib) on the
  * same table. Prints one JSON line; results are recorded in BASELINE.md.
  *
  * Env knobs: SPARK_GRAFT_BENCH_DOCS (default 400000),
  *            SPARK_GRAFT_LEVELS (default "8,32"),
  *            SPARK_GRAFT_WARMUP (default "1").
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "3000000").toLong
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val timedReps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt

    // Phase 0 at max parallelism: materialize input + size baselines.
    val prep = EncodeBench.session(levels.max)
    val inputPath = EncodeBench.ensureInput(prep, nDocs)
    val (orcSnappy, orcZlib) = EncodeBench.orcBaseline(prep, inputPath)
    val parquetIn = EncodeBench.dirBytes(new java.io.File(inputPath))
    val stored = EncodeBench.storedBytes(prep, inputPath, buckets = 16 * levels.max)

    // Per level: one warm run (JIT + page cache), then best of `timedReps`.
    // buckets = 16x parallelism: each task ~one bucket, enough tasks that
    // the scheduler smooths bucket-size variance (same recipe a 1000-
    // executor cluster would use: tasks >> slots).
    val runs = levels.map { cpus =>
      val s = EncodeBench.session(cpus)
      EncodeBench.timedEncode(s, inputPath, buckets = 16 * cpus, cpus)
      (1 to timedReps)
        .map(_ => EncodeBench.timedEncode(s, inputPath, buckets = 16 * cpus, cpus))
        .minBy(_.secs)
    }

    val lo = runs.minBy(_.cpus)
    val hi = runs.maxBy(_.cpus)
    val eff = (hi.gbps / lo.gbps) / (hi.cpus.toDouble / lo.cpus)
    val runsJson = runs.map { r =>
      f"""{"cpus":${r.cpus},"secs":${r.secs}%.3f,"gbps":${r.gbps}%.4f,"token_gb":${r.tokenBytes / 1e9}%.3f}"""
    }.mkString("[", ",", "]")
    println(
      f"""{"metric":"encode_scaling","n_docs":$nDocs,"n_tokens":${hi.nTokens},"runs":$runsJson,""" +
        f""""scaling_efficiency":$eff%.3f,"lightweight_ratio":${hi.ratio}%.3f,""" +
        f""""stored_bytes":$stored,"orc_snappy_bytes":$orcSnappy,"orc_zlib_bytes":$orcZlib,""" +
        f""""parquet_input_bytes":$parquetIn,""" +
        f""""stored_vs_orc_snappy":${stored.toDouble / orcSnappy}%.3f,""" +
        f""""stored_vs_orc_zlib":${stored.toDouble / orcZlib}%.3f}""")
    EncodeBench.session(1).stop()
  }
}
