package graft.bench

import org.apache.spark.sql.functions._

import graft.engine.{GraftEncoder, TokenRow, TokenTables}
import graft.codec._

/** Stage-by-stage encode profiler (dev tool): where does the wall time go —
  * read+deserialize, shuffle+sort, kernels, or block compression? */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "400000").toLong
    val spark = EncodeBench.session(cpus)
    import spark.implicits._
    val path = EncodeBench.ensureInput(spark, nDocs)

    def input = spark.read.parquet(path).as[TokenRow]

    // warm page cache + JIT
    time("warm read")(input.map(_.tokens.length.toLong).reduce(_ + _))

    time("read+deserialize only")(input.map(_.tokens.length.toLong).reduce(_ + _))

    time("read+shuffle+sort") {
      GraftEncoder.partitionForEncode(GraftEncoder.bucketed(input, 4 * cpus), 4 * cpus)
        .mapPartitions(it => Iterator.single(it.map(_.tokens.length.toLong).sum))
        .reduce(_ + _)
    }

    for (rep <- 1 to 2)
      time(s"full encode rep$rep") {
        GraftEncoder.encode(input, 4 * cpus).agg(sum($"bytesOut")).collect()(0)
      }

    // single-threaded kernel ceiling, no Spark: 64k-token chunks
    val rnd = new java.util.Random(7)
    val chunk = Array.fill(64 * 1024)((rnd.nextDouble() * 50257).toInt.toLong)
    val reps = 200
    time(s"kernel rle_v2 x$reps chunks (1 thread, ${reps * chunk.length / 1000000}M toks)") {
      var i = 0; var acc = 0L
      while (i < reps) { acc += IntCodecs.encodeChunk(chunk, RleV2Codec).length; i += 1 }
      acc
    }
    time(s"kernel bitpack x$reps") {
      var i = 0; var acc = 0L
      while (i < reps) { acc += IntCodecs.encodeChunk(chunk, BitPackCodec).length; i += 1 }
      acc
    }
    time(s"kernel auto-select x$reps") {
      var i = 0; var acc = 0L
      while (i < reps) { acc += CodecSelectorRef.auto(chunk).length; i += 1 }
      acc
    }
    time(s"kernel auto-select lvl1 x$reps") {
      val lvl1 = CodecConf(zlibLevel = 1)
      var i = 0; var acc = 0L
      while (i < reps) { acc += CodecSelectorRef.auto(chunk, lvl1).length; i += 1 }
      acc
    }
    spark.stop()
  }

  private object CodecSelectorRef {
    def auto(values: Array[Long], conf: CodecConf = CodecConf.Default): Array[Byte] =
      graft.select.CodecSelector.encodeIntsAuto(values, conf)._2
  }
}
