package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Unit layer for the split-block bloom filter (the ORC BLOOM_FILTER
  * stream analog): the no-false-negative contract, an observed FPP bound
  * at the sizing budget, sound degradation on absent/foreign bytes, and
  * determinism (the filter participates in the segment-bytes determinism
  * contract, so identical inputs must produce identical filter bytes). */
class SegmentBloomSpec extends AnyFunSuite {

  test("no false negatives over longs (the soundness contract)") {
    val rnd = new scala.util.Random(7)
    val values = Array.fill(5000)(rnd.nextLong() % 1000000L)
    val bloom = SegmentBloom.buildFromLongs(values)
    values.foreach(v => assert(SegmentBloom.mightContainLong(bloom, v)))
  }

  test("no false negatives over strings") {
    val values = Array.tabulate(3000)(i => f"doc_$i%09d")
    val bloom = SegmentBloom.buildFromStrings(values)
    values.foreach(v => assert(SegmentBloom.mightContainString(bloom, v)))
  }

  test("false-positive rate stays near the sizing budget (strings)") {
    val values = Array.tabulate(4000)(i => f"doc_$i%09d")
    val bloom = SegmentBloom.buildFromStrings(values)
    val probes = 20000
    var fp = 0
    var i = 0
    while (i < probes) {
      if (SegmentBloom.mightContainString(bloom, s"absent_$i")) fp += 1
      i += 1
    }
    // 16 bits/value split-block sits well under 1% FPP; allow 2% slack
    assert(fp.toDouble / probes < 0.02, s"FPP ${fp.toDouble / probes}")
  }

  test("false-positive rate over a vocab-id token distribution") {
    val rnd = new scala.util.Random(13)
    // zipf-ish low ids present, probe the absent high range
    val values = Array.fill(30000)((math.pow(rnd.nextDouble(), 3) * 25000).toLong)
    val bloom = SegmentBloom.buildFromLongs(values)
    values.foreach(v => assert(SegmentBloom.mightContainLong(bloom, v)))
    var fp = 0
    (30000L until 50000L).foreach(v => if (SegmentBloom.mightContainLong(bloom, v)) fp += 1)
    assert(fp.toDouble / 20000 < 0.02, s"FPP ${fp.toDouble / 20000}")
  }

  test("empty / absent / foreign bytes answer may-contain (sound degradation)") {
    assert(SegmentBloom.mightContainLong(Array.emptyByteArray, 42L))
    assert(SegmentBloom.mightContainLong(null, 42L))
    assert(SegmentBloom.mightContainString(Array[Byte](1, 2, 3), "x"))
    // right length, wrong magic -> treated as foreign, may-contain
    val foreign = new Array[Byte](4 + 64)
    assert(SegmentBloom.mightContainLong(foreign, 42L))
  }

  test("deterministic bytes for identical input (segment determinism contract)") {
    val values = Array.tabulate(1000)(i => (i * 31 % 997).toLong)
    val a = SegmentBloom.buildFromLongs(values)
    val b = SegmentBloom.buildFromLongs(values.clone())
    assert(java.util.Arrays.equals(a, b))
  }

  test("sizing clamps: tiny chunk gets MinBytes, huge ndv capped at MaxBytes") {
    assert(SegmentBloom.buildFromLongs(Array(1L)).length ===
      4 + math.max(SegmentBloom.MinBytes, 32))
    val big = Array.tabulate(200000)(i => i.toLong)
    assert(SegmentBloom.buildFromLongs(big).length === 4 + SegmentBloom.MaxBytes)
  }

  test("empty value set yields an empty (absent) filter") {
    assert(SegmentBloom.buildFromLongs(Array.emptyLongArray).isEmpty)
    assert(SegmentBloom.buildFromStrings(Array.empty[String]).isEmpty)
  }
}
