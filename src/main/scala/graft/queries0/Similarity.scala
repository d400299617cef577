package graft.queries0

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (embedding: array<float>, 64-dim).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is tiny (a handful of probe vectors) so Catalyst
  *    broadcasts it; the scan side streams once. At 100 TB this is the
  *    pattern for "small query batch vs huge corpus".
  *  - [[annLsh]]: the scale path — random-hyperplane LSH buckets computed
  *    in one narrow pass; search only joins within a bucket. Hyperplanes
  *    are a deterministic function of a fixed seed.
  */
object Similarity {

  final val Dim = 64
  final val TopK = 10
  final val NProbes = 5
  final val HyperPlanes = 8

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-gaussian hyperplanes from a fixed seed. */
  def hyperplanes(seed: Long = 7L): Array[Array[Double]] =
    Array.tabulate(HyperPlanes) { p =>
      Array.tabulate(Dim) { d =>
        // sum of 4 mixed uniforms - 2 ~ approx gaussian, deterministic
        var s = 0.0
        var k = 0
        while (k < 4) {
          s += (mix(seed ^ (p * 131L + d * 17L + k)).toDouble / Long.MaxValue + 1.0) / 2.0
          k += 1
        }
        s - 2.0
      }
    }

  private def normalized(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("norm",
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  /** Exact cosine top-k for the first NProbes vec_ids (broadcast probes). */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = normalized(spark, dir)
    val probes = e.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** LSH-bucketed ANN: sign-bit bucket from HyperPlanes fixed hyperplanes,
    * candidates restricted to the probe's bucket. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(hyperplanes())
    val e = normalized(spark, dir)
    val bucketed = e.select(col("vec_id"), col("embedding"), col("norm"))
      .as[(Long, Array[Float], Double)]
      .map { case (id, emb, norm) =>
        var bucket = 0
        val ps = planes.value
        var p = 0
        while (p < ps.length) {
          var s = 0.0
          var d = 0
          while (d < emb.length) { s += emb(d) * ps(p)(d); d += 1 }
          if (s > 0) bucket |= 1 << p
          p += 1
        }
        (id, emb, norm, bucket)
      }
      .toDF("vec_id", "embedding", "norm", "bucket")
    val probes = bucketed.filter(col("vec_id") < NProbes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("bucket").as("q_bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    bucketed.join(broadcast(probes), col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("embedding"), col("q_emb")) / (col("norm") * col("q_norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** ANN recall of the LSH path vs the exact baseline — quality telemetry. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = bruteForceTopK(spark, dir).select(col("q_id"), col("vec_id"))
    val approx = annLsh(spark, dir).select(
      col("q_id").as("a_q"), col("vec_id").as("a_v"))
    exact.join(approx, exact("q_id") === col("a_q") && exact("vec_id") === col("a_v"),
        "left_outer")
      .groupBy(col("q_id"))
      .agg(
        count(lit(1)).as("n_exact"),
        count(col("a_v")).as("n_hit"),
        (count(col("a_v")).cast("double") / count(lit(1))).as("recall"))
      .orderBy(col("q_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce_topk" -> (bruteForceTopK _),
    "ann_lsh_topk" -> (annLsh _),
    "ann_recall" -> (annRecall _)) ++ Multimodal.all

  val oracles: Map[String, String] = Map.empty
}

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata. The Spark-side schema, partitioning, and batch
  * shape are real; the actual media decode is STUBBED with a deterministic
  * fake (this container has no image/audio libraries) — the seam where a
  * real decoder (e.g. a Pandas UDF over mapInPandas in PySpark, or a JNI
  * decoder here) slots in is `fakeDecode`. */
object Multimodal {

  /** STUB: deterministic fake "decode" of a binary blob -> (width, height,
    * format). A real implementation would parse the media container. */
  def fakeDecode(media: Array[Byte]): (Int, Int, String) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(media.length, 64)) { h = (h ^ media(i)) * 1099511628211L; i += 1 }
    val w0 = 160 + (Math.floorMod(h, 8L).toInt * 80)
    ((w0), (w0 * 3) / 4, if (Math.floorMod(h >> 8, 2L) == 0L) "jpeg-stub" else "png-stub")
  }

  /** Binary media table derived deterministically from documents (text
    * bytes stand in for media payloads), then "decoded" per partition —
    * the batch shape a real decoder UDF would see. */
  def decodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, media) =>
          val (w, h, fmt) = fakeDecode(media)
          (id, media.length.toLong, w, h, fmt)
        }
      }
      .toDF("doc_id", "media_bytes", "width", "height", "format")
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"), sum(col("media_bytes")).as("total_bytes"),
        min(col("width")).as("min_w"), max(col("width")).as("max_w"))
      .orderBy(col("format"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode_stub" -> (decodeStub _))
}
