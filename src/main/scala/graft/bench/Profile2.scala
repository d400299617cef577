package graft.bench

import org.apache.spark.sql.DataFrame

import graft.engine.TokenRow

/** Is the typed-encoder boundary the bottleneck? Compare columnar SQL,
  * typed map, and raw InternalRow iteration at one core count. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "400000").toLong
    val spark = EncodeBench.session(cpus)
    import spark.implicits._
    val path = EncodeBench.ensureInput(spark, nDocs)
    def df: DataFrame = spark.read.parquet(path)

    Profile.time("warm")(df.selectExpr("sum(size(tokens))").collect())
    for (r <- 1 to 2) {
      Profile.time(s"sql sum(size(tokens)) r$r")(df.selectExpr("sum(size(tokens))").collect())
      Profile.time(s"typed map r$r")(df.as[TokenRow].map(_.tokens.length.toLong).reduce(_ + _))
      Profile.time(s"internalrow scan r$r") {
        val plan = df.select("doc_id", "tokens", "n_tok", "source").queryExecution.toRdd
        plan.mapPartitions { it =>
          var acc = 0L
          var rows = 0L
          while (it.hasNext) {
            val r = it.next()
            val toks = r.getArray(1).toIntArray()
            acc += toks.length
            val _d = r.getUTF8String(0).toString
            val _s = r.getUTF8String(3).toString
            rows += 1
          }
          Iterator.single(acc)
        }.reduce(_ + _)
      }
    }
    spark.stop()
  }
}
