package graft.bench

/** Timed encode runs only (no ORC baseline / stored-size phases) — the
  * quick harness for GC/heap/parallelism A-B experiments. */
object TimedOnly {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "3000000").toLong
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val prep = EncodeBench.session(levels.max)
    val inputPath = EncodeBench.ensureInput(prep, nDocs)
    val runs = levels.map { cpus =>
      val s = EncodeBench.session(cpus)
      EncodeBench.timedEncode(s, inputPath, buckets = 16 * cpus, cpus)
      val timed = (1 to reps).map(_ => EncodeBench.timedEncode(s, inputPath, buckets = 16 * cpus, cpus))
      (cpus, timed.map(_.secs))
    }
    val runsJson = runs.map { case (c, ts) =>
      s""""$c":[${ts.map(t => f"$t%.2f").mkString(",")}]"""
    }.mkString("{", ",", "}")
    println(s"""{"timed_only":$runsJson,"n_docs":$nDocs}""")
    EncodeBench.session(1).stop()
  }
}
