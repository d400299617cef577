package graft.codec

import java.nio.charset.StandardCharsets

/** FSST — Fast Static Symbol Table compression for strings / byte
  * sequences, per the public VLDB 2020 paper (Boncz, Neumann, Leis:
  * "FSST: Fast Random Access String Compression"); required by the north
  * star as the string codec the ORC stack lacks (SURVEY §1.4 item 8).
  *
  * A table of up to 255 symbols, each 1..8 bytes; code 255 is the escape
  * marker followed by one raw byte. The table is built by the paper's
  * iterative bottom-up algorithm over a deterministic sample: parse the
  * sample with the current table, count symbol and concatenated-pair
  * frequencies, keep the 255 candidates with the highest gain
  * (frequency x length). Fully deterministic: ties broken by symbol bytes
  * (SURVEY §7.4 risk 2 — a nondeterministic table would flake round-trips).
  *
  * Stream format:
  *   [varint nSymbols] ([len:1B][bytes])* [varint rawLen] [varint codeLen] [codes]
  */
object Fsst {
  final val Escape = 255
  final val MaxSymbols = 255
  final val MaxSymbolLen = 8
  private final val BuildIterations = 5
  private final val SampleTarget = 16 * 1024

  final class SymbolTable(val symbols: Array[Array[Byte]]) extends Serializable {
    // first-byte buckets, each sorted by symbol length descending (greedy
    // longest-match encode)
    @transient private lazy val buckets: Array[Array[Int]] = {
      val tmp = Array.fill(256)(List.empty[Int])
      var c = 0
      while (c < symbols.length) {
        val b = symbols(c)(0) & 0xff
        tmp(b) = c :: tmp(b)
        c += 1
      }
      tmp.map(_.sortBy(code => -symbols(code).length).toArray)
    }

    /** Longest symbol matching data at pos, or -1. */
    def findLongest(data: Array[Byte], pos: Int, end: Int): Int = {
      val cand = buckets(data(pos) & 0xff)
      var i = 0
      while (i < cand.length) {
        val code = cand(i)
        val sym = symbols(code)
        if (pos + sym.length <= end && matches(data, pos, sym)) return code
        i += 1
      }
      -1
    }

    private def matches(data: Array[Byte], pos: Int, sym: Array[Byte]): Boolean = {
      var j = 1 // byte 0 matched via bucket
      while (j < sym.length) {
        if (data(pos + j) != sym(j)) return false
        j += 1
      }
      true
    }
  }

  /** Deterministic sample: up to 16 strided slices covering the input. */
  private def sample(data: Array[Byte]): Array[Byte] = {
    if (data.length <= SampleTarget) return data
    val sliceLen = SampleTarget / 16
    val out = new Array[Byte](sliceLen * 16)
    val stride = (data.length - sliceLen).toLong / 15
    var s = 0
    while (s < 16) {
      val from = (s * stride).toInt
      System.arraycopy(data, from, out, s * sliceLen, sliceLen)
      s += 1
    }
    out
  }

  def buildTable(data: Array[Byte]): SymbolTable = {
    val smp = sample(data)
    var table = new SymbolTable(Array.empty)
    var iter = 0
    while (iter < BuildIterations) {
      table = refine(table, smp)
      iter += 1
    }
    table
  }

  /** One build iteration: parse sample with `table`, count gains, re-select. */
  private def refine(table: SymbolTable, smp: Array[Byte]): SymbolTable = {
    // key = symbol bytes as latin-1 string (deterministic hash/equality)
    val gain = new java.util.HashMap[String, java.lang.Long]()
    def bump(bytes: Array[Byte], from: Int, len: Int, by: Long): Unit = {
      if (len <= MaxSymbolLen) {
        val k = new String(bytes, from, len, StandardCharsets.ISO_8859_1)
        val prev = gain.get(k)
        gain.put(k, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) + by))
      }
    }
    var pos = 0
    var prevStart = -1
    var prevLen = 0
    val end = smp.length
    while (pos < end) {
      val code = if (table.symbols.isEmpty) -1 else table.findLongest(smp, pos, end)
      val len = if (code >= 0) table.symbols(code).length else 1
      // gain of this symbol (escapes count as single-byte candidates)
      bump(smp, pos, len, len.toLong)
      // gain of concatenation with previous parsed symbol
      if (prevStart >= 0 && prevLen + len <= MaxSymbolLen)
        bump(smp, prevStart, prevLen + len, (prevLen + len).toLong)
      prevStart = pos
      prevLen = len
      pos += len
    }
    // select top-255 by gain, ties by key bytes (deterministic)
    val entries = new java.util.ArrayList(gain.entrySet())
    entries.sort {
      (a: java.util.Map.Entry[String, java.lang.Long],
       b: java.util.Map.Entry[String, java.lang.Long]) =>
        val byGain = java.lang.Long.compare(b.getValue.longValue(), a.getValue.longValue())
        if (byGain != 0) byGain else a.getKey.compareTo(b.getKey)
    }
    val n = math.min(MaxSymbols, entries.size)
    val symbols = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      symbols(i) = entries.get(i).getKey.getBytes(StandardCharsets.ISO_8859_1)
      i += 1
    }
    new SymbolTable(symbols)
  }

  def compress(data: Array[Byte]): Array[Byte] = {
    val table = buildTable(data)
    compressWith(table, data)
  }

  def compressWith(table: SymbolTable, data: Array[Byte]): Array[Byte] = {
    val codes = new ByteWriter(data.length / 2 + 16)
    var pos = 0
    val end = data.length
    while (pos < end) {
      val code = if (table.symbols.isEmpty) -1 else table.findLongest(data, pos, end)
      if (code >= 0) {
        codes.writeByte(code)
        pos += table.symbols(code).length
      } else {
        codes.writeByte(Escape)
        codes.writeByte(data(pos) & 0xff)
        pos += 1
      }
    }
    val codeBytes = codes.toArray
    val out = new ByteWriter(codeBytes.length + 16)
    out.writeVarLong(table.symbols.length.toLong)
    var c = 0
    while (c < table.symbols.length) {
      out.writeByte(table.symbols(c).length)
      out.writeBytes(table.symbols(c))
      c += 1
    }
    out.writeVarLong(data.length.toLong)
    out.writeVarLong(codeBytes.length.toLong)
    out.writeBytes(codeBytes)
    out.toArray
  }

  def decompress(bytes: Array[Byte]): Array[Byte] = decompress(new ByteReader(bytes))

  def decompress(in: ByteReader): Array[Byte] = {
    val nSymbols = in.readVarLong().toInt
    val symbols = new Array[Array[Byte]](nSymbols)
    var c = 0
    while (c < nSymbols) {
      val len = in.readByte()
      symbols(c) = in.readBytes(len)
      c += 1
    }
    val rawLen = in.readVarLong().toInt
    val codeLen = in.readVarLong().toInt
    val out = new Array[Byte](rawLen)
    var outPos = 0
    var i = 0
    while (i < codeLen) {
      val code = in.readByte()
      i += 1
      if (code == Escape) {
        out(outPos) = in.readByte().toByte
        outPos += 1
        i += 1
      } else {
        val sym = symbols(code)
        System.arraycopy(sym, 0, out, outPos, sym.length)
        outPos += sym.length
      }
    }
    require(outPos == rawLen, s"FSST decode length mismatch: $outPos != $rawLen")
    out
  }
}
