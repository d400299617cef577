package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}

/** The engine's input row — exactly the `input_hint` shape from
  * /root/repo/BASELINE.json: (doc_id:string, tokens:array<int32>,
  * n_tok:int32, source:string). */
final case class TokenRow(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

/** Deterministic token-table construction.
  *
  * Two sources, both fully deterministic (TESTDATA is read-only and the
  * driver re-runs us, so any nondeterminism would flake the correctness
  * gate — same reason the reference keeps its fixtures tiny and frozen,
  * /root/reference/AGENTS.md:47):
  *
  *  - [[fromDocuments]]: tokenize the driver-provided `documents` parquet
  *    with a fixed hash vocabulary — ties the token table to the sf dir.
  *  - [[synthetic]]: pure function of (seed, row id) — partitioning-
  *    independent, usable at any scale for benchmarks. Token streams are a
  *    zipf-ish mixture with repeat runs (exercises dict + RLE) and doc
  *    lengths are log-normal (10x-1000x skew, the north_rule skew clause).
  */
object TokenTables {

  final val VocabSize = 50257 // GPT-2-style vocab size; public constant

  /** Stable string hash (FNV-1a 32) — do NOT use String.hashCode for data
    * layout; this one is ours and pinned. */
  def stableHash(s: String): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x01000193
      i += 1
    }
    h
  }

  /** Tokens = maximal runs of [a-z0-9] in the lowercased text, each hashed
    * with [[stableHash]] — semantically identical to the original
    * `split("[^a-z0-9]+")` formulation, but computed in one allocation-free
    * scan: no per-call regex compile, no String[] of word copies (this
    * kernel runs once per row in every encode entry and dominated their
    * map-stage task time). The FNV fold is applied to the run's chars
    * directly, which equals hashing the word substring. */
  def tokenize(text: String): Array[Int] = {
    val s = text.toLowerCase
    val len = s.length
    var out = new Array[Int](math.min(16, len + 1))
    var n = 0
    var i = 0
    while (i < len) {
      var c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var h = 0x811c9dc5
        do {
          h ^= c
          h *= 0x01000193
          i += 1
          c = if (i < len) s.charAt(i) else ' '
        } while ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
        if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
        out(n) = (h & 0x7fffffff) % VocabSize
        n += 1
      } else i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** documents.parquet (doc_id:int64, text, lang, source, n_chars) → TokenRow. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[TokenRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "source")
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val tokens = tokenize(text)
        TokenRow(f"doc_$id%09d", tokens, tokens.length, source)
      }
  }

  private val Sources = Array("web", "books", "code", "wiki")
  private val SourceCum = Array(0.70, 0.85, 0.95, 1.0) // weighted mix

  /** splitmix64 — public-domain mixer; row id -> independent rng stream. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic synthetic table: value depends only on (seed, id). */
  def synthetic(spark: SparkSession, nDocs: Long, seed: Long = 42L,
                partitions: Int = 0): Dataset[TokenRow] = {
    import spark.implicits._
    val range =
      if (partitions > 0) spark.range(0L, nDocs, 1L, partitions) else spark.range(nDocs)
    range.as[Long].map(id => syntheticRow(seed, id))
  }

  def syntheticRow(seed: Long, id: Long): TokenRow = {
    val rnd = new java.util.Random(mix(seed ^ mix(id)))
    val u = rnd.nextDouble()
    var s = 0
    while (u > SourceCum(s)) s += 1
    val source = Sources(s)
    // log-normal-ish length: median ~150 tokens, tail to 20k (skew clause)
    val len0 = math.exp(rnd.nextGaussian() * 1.1 + 5.0).toInt
    val nTok = math.max(8, math.min(20000, len0))
    val tokens = new Array[Int](nTok)
    var i = 0
    var prev = 0
    while (i < nTok) {
      val r = rnd.nextDouble()
      if (i > 0 && r < 0.12) {
        tokens(i) = prev // repeat run: RLE fodder
      } else {
        // zipf-ish: cube concentrates mass on small ids (frequent tokens)
        val z = rnd.nextDouble()
        tokens(i) = (z * z * z * VocabSize).toInt
      }
      prev = tokens(i)
      i += 1
    }
    TokenRow(f"doc_$id%012d", tokens, nTok, source)
  }
}
