package graft.bench

import org.apache.spark.sql.functions._

import graft.engine.{GraftEncoder, TokenPack, BucketedRow, PackedRow, TokenTables}

/** A-B harness (dev tool): the packed-partition encode path vs the
  * unpack-then-row path, interleaved in ONE JVM so shared-host noise hits
  * both arms equally. Both arms consume the same shuffled PackedRow input
  * and produce byte-identical segments (EnginePipelineSpec pins that);
  * this measures wall only. */
object PackedPathAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "600000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = EncodeBench.session(cpus)
    import spark.implicits._
    val path = EncodeBench.ensureInput(spark, nDocs)
    def input = spark.read.parquet(path).as[graft.engine.TokenRow]
    val buckets = 4 * cpus

    def viaPacked(): Long =
      GraftEncoder.encode(input, buckets).agg(sum($"bytesOut")).collect()(0).getLong(0)

    def viaRows(): Long =
      GraftEncoder.bucketed(input, buckets)
        .map(r => PackedRow(r.doc_id, TokenPack.pack(r.tokens), r.n_tok, r.source, r.bucket))
        .repartition(buckets, $"bucket")
        .mapPartitions { rows =>
          GraftEncoder.encodePartition(
            rows.map(p => BucketedRow(p.doc_id, TokenPack.unpack(p.pack),
              p.n_tok, p.source, p.bucket)),
            GraftEncoder.DefaultTokensPerChunk)
        }
        .agg(sum($"bytesOut")).collect()(0).getLong(0)

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // warm both arms
    viaPacked(); viaRows()
    val packed = new Array[Double](reps)
    val rows = new Array[Double](reps)
    for (r <- 0 until reps) { packed(r) = time(viaPacked _); rows(r) = time(viaRows _) }
    println(f"""{"bench":"packed_path_ab","n_docs":$nDocs,"packed_min":${packed.min}%.3f,"rows_min":${rows.min}%.3f,"packed":[${packed.map(t => f"$t%.2f").mkString(",")}],"rows":[${rows.map(t => f"$t%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
