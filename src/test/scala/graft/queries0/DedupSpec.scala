package graft.queries0

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Second-implementation cross-checks for the dedup operators whose Spark
  * pipelines cannot be expressed in DuckDB SQL (simhash needs wrapping
  * 64-bit multiplies). The distributed banded pipeline must equal an
  * independent driver-side brute-force evaluation of the same contract.
  * (The minhash/ngram/embedding pipelines are instead oracle-checked
  * against DuckDB per the driver contract — see Dedup.oracles.) */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def band16(h: Long, b: Int): Long = (h >>> (16 * b)) & 0xffffL

  test("simhash banded pairs equal an independent brute-force implementation") {
    import spark.implicits._
    val hashes = Dedup.corpus(spark, dir).as[(Long, String)].collect()
      .map { case (id, text) => (id, Dedup.simhash(text)) }
    val expected = (for {
      (i1, h1) <- hashes.iterator
      (i2, h2) <- hashes.iterator
      if i1 < i2
      if java.lang.Long.bitCount(h1 ^ h2) <= 4
      if (0 until Dedup.SimhashBands).exists(b => band16(h1, b) == band16(h2, b))
    } yield (i1, i2, java.lang.Long.bitCount(h1 ^ h2))).toSet
    assert(expected.nonEmpty, "corpus must contain simhash near-dups to test anything")
    val got = Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("simhash banding is complete for hamming <= 3 (pigeonhole over 4 bands)") {
    import spark.implicits._
    val hashes = Dedup.corpus(spark, dir).as[(Long, String)].collect()
      .map { case (id, text) => (id, Dedup.simhash(text)) }
    val close = (for {
      (i1, h1) <- hashes.iterator
      (i2, h2) <- hashes.iterator
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)).toSet
    val got = Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(close.subsetOf(got),
      s"banding must never miss a hamming<=3 pair: ${close -- got}")
  }

  test("embedding corpus plants near-dup pairs above the cosine threshold") {
    import spark.implicits._
    val corpus = Dedup.embCorpus(spark, dir).collect().toMap
    val planted = corpus.keys.filter(_ >= 100000L).toSeq.sorted
    assert(planted.nonEmpty)
    planted.foreach { pid =>
      val orig = corpus(pid - 100000L)
      val copy = corpus(pid)
      val cos = Similarity.dot(orig, copy) / (Similarity.norm(orig) * Similarity.norm(copy))
      assert(cos > 0.99 && cos < 1.0, s"planted pair $pid cosine $cos")
    }
  }

  test("embedding LSH near-dup equals brute-force all-pairs (no misses at this sf)") {
    import spark.implicits._
    val corpus = Dedup.embCorpus(spark, dir).collect()
    val withNorm = corpus.map { case (id, e) => (id, e, Similarity.norm(e)) }
    val expected = (for {
      (i1, e1, n1) <- withNorm.iterator
      (i2, e2, n2) <- withNorm.iterator
      if i1 < i2
      cos = Similarity.dot(e1, e2) / (n1 * n2)
      if cos >= Dedup.CosineThreshold
    } yield (i1, i2)).toSet
    assert(expected.nonEmpty)
    val got = Dedup.embeddingNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("ngram df-cap bounds the inverted-index fan-out on planted boilerplate") {
    import spark.implicits._
    // 60 docs sharing ONE boilerplate sentence, each with a unique tail;
    // docs 58 and 59 are true near-dups (identical full text). The
    // boilerplate shingles have df = 60 and make every doc pair a
    // candidate — exactly the quadratic blow-up the cap exists to stop.
    val boiler = "terms of service apply to every registered user of this website"
    def tail(i: Int) =
      (0 until 8).map(k => s"unique${i}word$k").mkString(" ")
    val docs = (0 until 60).map { i =>
      val t = if (i == 59) tail(58) else tail(i)
      (i.toLong, s"$boiler $t")
    }.toDF("doc_id", "text")

    val uncapped = Dedup.ngramCandidates(Dedup.ngramIndex(docs, None)._1).count()
    assert(uncapped >= 60L * 59 / 2,
      s"boilerplate must make every pair a candidate uncapped, got $uncapped")

    val (flatCapped, _) = Dedup.ngramIndex(docs, Some(10))
    val capped = Dedup.ngramCandidates(flatCapped).count()
    assert(capped < 60,
      s"df cap must collapse the boilerplate fan-out, got $capped candidates")

    // the true near-dup pair survives the cap and is still reported
    val result = Dedup.ngramJaccardOn(docs, Some(10)).collect()(0)
    assert(result.getAs[Long]("n_pairs") === 1L, "planted near-dup lost under the cap")
    assert(result.getAs[Long]("n_strong") === 1L)
    // and the uncapped operator agrees on the REPORTED pairs (boilerplate
    // pairs share too little to pass the J >= 0.5 verify either way)
    val un = Dedup.ngramJaccardOn(docs, None).collect()(0)
    assert(un.getAs[Long]("n_pairs") === 1L)
  }
}
