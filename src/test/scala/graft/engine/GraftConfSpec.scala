package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Options parsing — the reference's options.rs unit layer re-expressed
  * (/root/reference/src/options.rs:116-225: defaults, each key, error
  * cases, unknown-key tolerance). */
class GraftConfSpec extends AnyFunSuite {

  test("defaults when no keys present") {
    val c = GraftConf.fromMap(Map.empty)
    assert(c === GraftConf())
    assert(c.tokensPerChunk === GraftEncoder.DefaultTokensPerChunk)
    assert(c.zlibLevel === 6)
  }

  test("each key parses") {
    val c = GraftConf.fromMap(Map(
      GraftConf.TokensPerChunk -> "4096",
      GraftConf.Buckets -> "64",
      GraftConf.ZlibLevel -> "1",
      GraftConf.DeflateMinGain -> "0.2",
      GraftConf.DictThreshold -> "0.5"))
    assert(c === GraftConf(4096, 64, 1, 0.2, 0.5))
  }

  test("whitespace tolerated, like the reference's trim") {
    assert(GraftConf.fromMap(Map(GraftConf.Buckets -> " 16 ")).buckets === 16)
  }

  test("unknown graft.* keys are tolerated (options.rs unknown-key stance)") {
    val c = GraftConf.fromMap(Map("graft.future.flag" -> "whatever"))
    assert(c === GraftConf())
  }

  test("malformed int fails fast naming the key") {
    val e = intercept[IllegalArgumentException](
      GraftConf.fromMap(Map(GraftConf.TokensPerChunk -> "abc")))
    assert(e.getMessage.contains(GraftConf.TokensPerChunk))
  }

  test("malformed double fails fast naming the key") {
    val e = intercept[IllegalArgumentException](
      GraftConf.fromMap(Map(GraftConf.DictThreshold -> "many")))
    assert(e.getMessage.contains(GraftConf.DictThreshold))
  }

  test("out-of-range values rejected") {
    intercept[IllegalArgumentException](GraftConf.fromMap(Map(GraftConf.ZlibLevel -> "10")))
    intercept[IllegalArgumentException](GraftConf.fromMap(Map(GraftConf.Buckets -> "0")))
    intercept[IllegalArgumentException](GraftConf.fromMap(Map(GraftConf.DeflateMinGain -> "1.5")))
  }

  test("two concurrent encodes with different confs do not interact (no global codec state)") {
    // Same chunk encoded under two codec confs, interleaved across threads:
    // each thread's bytes must equal its own sequential baseline. With
    // JVM-global knobs this races (the old @volatile design); with
    // explicitly threaded CodecConf it cannot.
    val rnd = new scala.util.Random(3)
    val rows = Array.tabulate(400) { i =>
      val n = 50 + rnd.nextInt(400)
      TokenRow(f"doc_$i%09d", Array.fill(n)(rnd.nextInt(50257)), n, "web")
    }
    val confA = graft.codec.CodecConf(zlibLevel = 1, deflateMinGain = 0.0)
    val confB = graft.codec.CodecConf(zlibLevel = 9, deflateMinGain = 0.5)
    def bytes(conf: graft.codec.CodecConf): Seq[Byte] =
      GraftEncoder.encodeChunk(rows, 0, 0, 0, conf).cols
        .flatMap(_.payload.toSeq)
    val baseA = bytes(confA)
    val baseB = bytes(confB)
    assert(baseA !== baseB, "confs must actually produce different bytes")
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 32).map { i =>
        val conf = if (i % 2 == 0) confA else confB
        val base = if (i % 2 == 0) baseA else baseB
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = bytes(conf) == base
        })
      }
      assert(futures.forall(_.get()), "concurrent encodes must match their sequential baselines")
    } finally pool.shutdown()
  }

  test("conf-driven encode honors tokensPerChunk and round-trips") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(GraftConf.TokensPerChunk, "2048")
      .config(GraftConf.Buckets, "4")
      .getOrCreate()
    val conf = GraftConf.fromSession(spark)
    assert(conf.tokensPerChunk === 2048 && conf.buckets === 4)
    val input = TokenTables.synthetic(spark, nDocs = 200, seed = 9L)
    val segs = GraftEncoder.encodeWithConf(input, conf).collect()
    assert(segs.forall(_.nTokens <= 2048 + 20000)) // budget + one straddling doc
    val decoded = segs.flatMap(GraftEncoder.decodeSegment).map(r => r.doc_id -> r).toMap
    input.collect().foreach { r =>
      assert(decoded(r.doc_id).tokens.toSeq === r.tokens.toSeq)
    }
  }
}
