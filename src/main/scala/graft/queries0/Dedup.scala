package graft.queries0

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket-join),
  * SimHash (banded hamming), n-gram Jaccard verification, and
  * embedding-cosine near-dup.
  *
  * Scale design: signatures are computed in ONE narrow map pass per
  * document (no shingle explosion shuffle — a doc's shingle set never
  * leaves the task), the only wide ops are the band-bucket self-join
  * (standard LSH join, key space 2^64 so buckets stay small) and the final
  * pair dedup. At 100 TB the band join is the bottleneck by design; salting
  * hot bands would bolt on here if a corpus had giant near-dup cliques.
  *
  * The test corpus is `documents` plus DETERMINISTIC perturbed/duplicate
  * copies, so near-dup structure exists at every sf (the raw synthetic
  * docs are all unique).
  */
object Dedup {

  final val MinhashK = 16 // signature length
  final val Bands = 4     // 4 bands x 4 rows
  final val SimhashBits = 64
  final val SimhashBands = 4

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def stableHash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
    h
  }

  /** documents + exact duplicates (+200000) + near-duplicates (+100000,
    * one appended token). Deterministic. */
  def corpus(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val exactDups = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val nearDups = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" appended tail token")).as("text"))
    d.unionByName(exactDups).unionByName(nearDups)
  }

  /** Exact dedup by content hash: total/unique/removed + kept ids sample. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .agg(
        count(lit(1)).as("n_unique"),
        sum(col("n_copies")).cast("long").as("n_docs"),
        (sum(col("n_copies")) - count(lit(1))).cast("long").as("n_removed"))

  // ---- MinHash ------------------------------------------------------------

  /** Word 3-shingle set of a text (hashed to 64-bit). */
  def shingles(text: String, n: Int = 3): Array[Long] = {
    val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (words.length < n) {
      if (words.isEmpty) Array.emptyLongArray else Array(stableHash64(words.mkString(" ")))
    } else {
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + n <= words.length) {
        set.add(stableHash64(words.slice(i, i + n).mkString(" ")))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** MinHash signature: k independent mixes, one pass over the shingle set
    * (no explode — the whole signature is computed inside the map task). */
  def minhashSignature(sh: Array[Long], k: Int = MinhashK): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var f = 0
      while (f < k) {
        val h = mix(sh(i) ^ (0xabcdef123L * (f + 1)))
        if (h < sig(f)) sig(f) = h
        f += 1
      }
      i += 1
    }
    sig
  }

  private def signatures(spark: SparkSession, dir: String): Dataset[(Long, Array[Long], Array[Long])] = {
    import spark.implicits._
    corpus(spark, dir).as[(Long, String)].map { case (id, text) =>
      val sh = shingles(text)
      (id, sh, minhashSignature(sh))
    }
  }

  /** LSH candidate pairs + exact shingle-Jaccard verification. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = signatures(spark, dir).toDF("doc_id", "shingles", "sig")
    val rowsPerBand = MinhashK / Bands
    val banded = sigs.select(
      col("doc_id"), col("shingles"),
      explode(expr(
        (0 until Bands).map { b =>
          val slice = s"slice(sig, ${b * rowsPerBand + 1}, $rowsPerBand)"
          s"named_struct('band', $b, 'bh', xxhash64(cast($slice as string)))"
        }.mkString("array(", ", ", ")"))).as("bb"))
      .select(col("doc_id"), col("shingles"), col("bb.band"), col("bb.bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.shingles").as("sh1"), col("b.shingles").as("sh2"))
      .distinct()
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", size(array_union(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Exact n-gram Jaccard over LSH candidates (the verify stage). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    minhashLsh(spark, dir)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("jaccard") >= 0.9, 1L).otherwise(0L)).as("n_strong"))

  // ---- SimHash ------------------------------------------------------------

  def simhash(text: String): Long = {
    val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val acc = new Array[Int](SimhashBits)
    var i = 0
    while (i < words.length) {
      val h = mix(stableHash64(words(i)))
      var b = 0
      while (b < SimhashBits) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimhashBits) {
      if (acc(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  /** Banded SimHash near-dup pairs (hamming <= 4, candidate via one equal
    * 16-bit band — standard banding guarantee). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = corpus(spark, dir).as[(Long, String)]
      .map { case (id, text) => (id, simhash(text)) }
      .toDF("doc_id", "sh")
    val banded = hashed.select(col("doc_id"), col("sh"),
      explode(expr(
        (0 until SimhashBands).map { b =>
          s"named_struct('band', $b, 'bits', shiftright(sh, ${b * 16}) & 65535)"
        }.mkString("array(", ", ", ")"))).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bits"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sh").as("sh1"), col("b.sh").as("sh2"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh1").bitwiseXOR(col("sh2"))))
      .filter(col("hamming") <= 4)
      .select(col("id1"), col("id2"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  // ---- embedding cosine -----------------------------------------------------

  /** Embedding-cosine near-dup: broadcast nested-loop over normalized
    * vectors with primitive inner loops — the small-side-broadcast x
    * streamed-corpus pattern (a `zip_with` cross join allocates an array
    * per pair and was ~30x slower). Correctness baseline; the LSH-bucketed
    * scale path is Similarity.annLsh. At 100 TB the broadcast side is
    * blocked: iterate this with one broadcast block at a time. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val side = e.collect().sortBy(_._1)
    val norms = side.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((side, norms))
    e.flatMap { case (id, emb) =>
      val (rows, ns) = bc.value
      var n1 = 0.0
      var i = 0
      while (i < emb.length) { n1 += emb(i).toDouble * emb(i); i += 1 }
      n1 = math.sqrt(n1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var j = 0
      while (j < rows.length) {
        val (id2, emb2) = rows(j)
        if (id2 > id) {
          var dot = 0.0
          var d = 0
          while (d < emb.length) { dot += emb(d).toDouble * emb2(d); d += 1 }
          val cos = dot / (n1 * ns(j))
          if (cos >= 0.95) out += ((id, id2, cos))
        }
        j += 1
      }
      out
    }.toDF("id1", "id2", "cosine").orderBy(col("id1"), col("id2"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (exact _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_simhash" -> (simhashPairs _),
    "dedup_embedding_cosine" -> (embeddingNearDup _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id + 100000, text || ' appended tail token' FROM documents WHERE doc_id % 10 = 0
        |), groups AS (
        |  SELECT md5(text) AS h, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
        |  FROM corpus GROUP BY md5(text)
        |)
        |SELECT COUNT(*) AS n_unique, CAST(SUM(n_copies) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_removed
        |FROM groups""".stripMargin)
}
