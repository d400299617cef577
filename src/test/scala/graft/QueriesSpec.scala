package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must execute on sf0.001 and the engine entries
  * must report zero mismatches. Golden-count asserts pin a few results the
  * way the reference pins batch literals. */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  /** Entries allowed to be legitimately empty at sf0.001: set difference
    * of identical key domains. Everything else must return rows — a
    * 0-row result proves nothing about the operator (the vacuousness trap
    * r1's IS NULL entry fell into). */
  private val mayBeEmpty = Set("q_set_except")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes on sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (mayBeEmpty(name)) assert(n >= 0)
      else assert(n > 0, s"$name returned 0 rows — vacuous evidence")
    }
  }

  test("round-trip queries report zero mismatches") {
    for (q <- Seq("encode_roundtrip_docs", "encode_roundtrip_synthetic")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.nonEmpty, s"$q returned no rows")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_mismatch") === 0L, s"$q source=${r.getAs[String]("source")}")
      }
    }
  }

  test("dedup_exact finds the planted duplicates") {
    val r = SparkEntry.queries("dedup_exact")(spark, dir).collect().head
    assert(r.getAs[Long]("n_removed") > 0, "planted exact dups must be found")
    assert(r.getAs[Long]("n_docs") === r.getAs[Long]("n_unique") + r.getAs[Long]("n_removed"))
  }

  test("minhash lsh finds the planted near-duplicates") {
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir).collect()
    assert(pairs.nonEmpty, "planted near-dups must be found")
    // planted near-dup pairs are (id, id+100000) with jaccard near 1
    assert(pairs.exists(r => r.getAs[Long]("id2") - r.getAs[Long]("id1") == 100000L))
  }

  test("simhash finds the planted near-duplicates") {
    val pairs = SparkEntry.queries("dedup_simhash")(spark, dir).collect()
    assert(pairs.exists(r => r.getAs[Long]("id2") - r.getAs[Long]("id1") >= 100000L))
  }

  test("ann brute force returns TopK per probe") {
    val rows = SparkEntry.queries("ann_bruteforce_topk")(spark, dir).collect()
    val perProbe = rows.groupBy(_.getAs[Long]("q_id")).map(_._2.length)
    assert(perProbe.forall(_ == 10))
  }

  test("ann recall is computable and sane") {
    val rows = SparkEntry.queries("ann_recall")(spark, dir).collect()
    rows.foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }
}
