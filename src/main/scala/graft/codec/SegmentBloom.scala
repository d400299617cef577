package graft.codec

/** Split-block Bloom filter over a column chunk's value set — the graft
  * analog of ORC's per-row-group BLOOM_FILTER_UTF8 stream (ORC v1 spec
  * §"Bloom Filters": optional per-column streams consulted by the reader's
  * predicate pushdown when min/max stats cannot prune, exactly the gap
  * here: zipf token ids and hash-distributed doc ids put the global
  * min/max into nearly every chunk, so interval stats prune point lookups
  * ~never while a 1%-FPP bloom prunes them ~always).
  *
  * The block layout is the public split-block design (Parquet format spec,
  * BloomFilter.md; originally Putze/Sanders/Singler "Cache-, Hash- and
  * Space-Efficient Bloom Filters", 2007): a filter is a sequence of 256-bit
  * blocks (8×32-bit words); an item selects ONE block from the upper hash
  * bits and sets/tests one bit in each of the 8 words, chosen by the 8
  * public salt constants. One cache line per probe, no modulo chains.
  *
  * Framing: 4-byte magic "GBF1" then the block words little-endian. An
  * empty/absent array means "no filter" — every membership test returns
  * may-contain, so readers degrade soundly on foreign or pre-bloom files
  * (same stance as the connector's guarded stat checks).
  *
  * Hashing is deterministic and replayable from the spec constants only:
  * splitmix64 finalization over the raw long for ints, over FNV-1a-64 for
  * strings (both public-domain constants, already the repo's convention in
  * simhash/fingerprinting).
  */
object SegmentBloom {

  /** Parquet split-block bloom salt constants (public format spec). */
  private val Salts: Array[Int] = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  private val Magic: Array[Byte] = Array('G', 'B', 'F', '1').map(_.toByte)
  private final val BlockBytes = 32 // 256 bits
  final val MaxBytes: Int = 16 * 1024 // payload cap per chunk (~6% of a token chunk)
  final val MinBytes: Int = 64
  final val BitsPerValue: Int = 16 // ~0.3-1% FPP for split-block at this budget

  /** splitmix64 finalizer (public-domain constants, Steele et al.). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes (public-domain offset/prime). */
  def hashString(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  def hashLong(v: Long): Long = mix64(v)

  /** Block count for an expected distinct-value count, clamped to
    * [MinBytes, MaxBytes]. At the cap the filter degrades gracefully
    * (higher FPP = less pruning, never wrong results). */
  def numBlocks(ndv: Int): Int = {
    val bytes = math.max(MinBytes.toLong, math.min(MaxBytes.toLong,
      (math.max(1, ndv).toLong * BitsPerValue + 7) / 8))
    (((bytes + BlockBytes - 1) / BlockBytes)).toInt
  }

  /** Block count under an explicit byte cap (file-level filters use a
    * larger budget than the per-chunk MaxBytes — a whole part-file's
    * distinct doc ids at 16 bits/value outgrow 16 KiB immediately; at the
    * cap the filter degrades to higher FPP, never to wrong answers). */
  def numBlocksCapped(ndv: Int, maxBytes: Int): Int = {
    val bytes = math.max(MinBytes.toLong, math.min(math.max(MinBytes, maxBytes).toLong,
      (math.max(1, ndv).toLong * BitsPerValue + 7) / 8))
    (((bytes + BlockBytes - 1) / BlockBytes)).toInt
  }

  /** Build with an explicit size cap (see [[numBlocksCapped]]). */
  def buildCapped(hashes: Iterator[Long], ndv: Int, maxBytes: Int): Array[Byte] = {
    val blocks = numBlocksCapped(ndv, maxBytes)
    buildWithBlocks(hashes, blocks)
  }

  /** Build a filter from pre-mixed 64-bit hashes. */
  def build(hashes: Iterator[Long], ndv: Int): Array[Byte] =
    buildWithBlocks(hashes, numBlocks(ndv))

  private def buildWithBlocks(hashes: Iterator[Long], blocks: Int): Array[Byte] = {
    val words = new Array[Int](blocks * 8)
    while (hashes.hasNext) insert(words, blocks, hashes.next())
    val out = new Array[Byte](Magic.length + words.length * 4)
    System.arraycopy(Magic, 0, out, 0, Magic.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      val o = Magic.length + i * 4
      out(o) = w.toByte
      out(o + 1) = (w >>> 8).toByte
      out(o + 2) = (w >>> 16).toByte
      out(o + 3) = (w >>> 24).toByte
      i += 1
    }
    out
  }

  private def insert(words: Array[Int], blocks: Int, hash: Long): Unit = {
    // fastrange block selection on the upper 32 bits (public trick:
    // Lemire, "A fast alternative to the modulo reduction")
    val block = (((hash >>> 32) * blocks) >>> 32).toInt
    val key = hash.toInt
    var i = 0
    while (i < 8) {
      val bit = (key * Salts(i)) >>> 27 // top 5 bits -> [0, 32)
      words(block * 8 + i) |= 1 << bit
      i += 1
    }
  }

  /** Sound membership test: false ONLY when the value was provably never
    * inserted. Absent/foreign filters answer may-contain. */
  def mightContain(bloom: Array[Byte], hash: Long): Boolean = {
    if (bloom == null || bloom.length < Magic.length + BlockBytes) return true
    if (bloom(0) != Magic(0) || bloom(1) != Magic(1) ||
      bloom(2) != Magic(2) || bloom(3) != Magic(3)) return true
    val blocks = (bloom.length - Magic.length) / BlockBytes
    if (blocks <= 0) return true
    val block = (((hash >>> 32) * blocks) >>> 32).toInt
    val key = hash.toInt
    var i = 0
    while (i < 8) {
      val bit = (key * Salts(i)) >>> 27
      val o = Magic.length + (block * 8 + i) * 4
      val w = (bloom(o) & 0xFF) | ((bloom(o + 1) & 0xFF) << 8) |
        ((bloom(o + 2) & 0xFF) << 16) | ((bloom(o + 3) & 0xFF) << 24)
      if ((w & (1 << bit)) == 0) return false
      i += 1
    }
    true
  }

  def mightContainLong(bloom: Array[Byte], v: Long): Boolean =
    mightContain(bloom, hashLong(v))
  def mightContainString(bloom: Array[Byte], s: String): Boolean =
    mightContain(bloom, hashString(s))

  /** Build from int-domain values (token ids): exact ndv via a bitset when
    * the value range is modest (always true for vocab-id tokens), value
    * count as the sizing upper bound otherwise — sizing only affects FPP,
    * never soundness. */
  def buildFromLongs(values: Array[Long]): Array[Byte] = {
    if (values.isEmpty) return Array.emptyByteArray
    var minV = values(0)
    var maxV = values(0)
    var i = 1
    while (i < values.length) {
      if (values(i) < minV) minV = values(i)
      if (values(i) > maxV) maxV = values(i)
      i += 1
    }
    val range = maxV - minV
    val ndv =
      if (range >= 0 && range < (1L << 22)) {
        val seen = new java.util.BitSet(range.toInt + 1)
        var n = 0
        var j = 0
        while (j < values.length) {
          val k = (values(j) - minV).toInt
          if (!seen.get(k)) { seen.set(k); n += 1 }
          j += 1
        }
        n
      } else values.length
    build(values.iterator.map(hashLong), ndv)
  }

  /** Int-domain twin of [[buildFromLongs]] — hashes `v.toLong`, so the
    * bloom bytes are identical to the widened path. */
  def buildFromInts(values: Array[Int]): Array[Byte] = {
    if (values.isEmpty) return Array.emptyByteArray
    var minV = values(0)
    var maxV = values(0)
    var i = 1
    while (i < values.length) {
      if (values(i) < minV) minV = values(i)
      if (values(i) > maxV) maxV = values(i)
      i += 1
    }
    val range = maxV.toLong - minV.toLong
    val ndv =
      if (range < (1L << 22)) {
        val seen = new java.util.BitSet(range.toInt + 1)
        var n = 0
        var j = 0
        while (j < values.length) {
          val k = values(j) - minV
          if (!seen.get(k)) { seen.set(k); n += 1 }
          j += 1
        }
        n
      } else values.length
    build(values.iterator.map(v => hashLong(v.toLong)), ndv)
  }

  /** Build from strings; `ndv` defaults to the value count (doc ids are
    * unique within a chunk by construction). */
  def buildFromStrings(values: Array[String]): Array[Byte] = {
    if (values.isEmpty) return Array.emptyByteArray
    build(values.iterator.map(hashString), values.length)
  }
}
