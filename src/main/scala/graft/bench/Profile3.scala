package graft.bench

import graft.codec._
import graft.engine.TokenTables
import graft.select.CodecSelector

/** Deflate-level tradeoff on realistic token chunks: speed vs size of the
  * shipped (wrapped) chunk at zlib levels 0/1/6, per codec path. */
object Profile3 {
  def main(args: Array[String]): Unit = {
    // realistic chunks: zipf-ish synthetic rows, flattened to 64k-token chunks
    val rows = (0L until 4000L).map(id => TokenTables.syntheticRow(42L, id))
    val flat = rows.flatMap(_.tokens.map(_.toLong)).toArray
    val chunks = flat.grouped(64 * 1024).filter(_.length == 64 * 1024).toArray
    println(s"[p3] ${chunks.length} chunks of 64Ki tokens")

    def run(label: String, level: Int): Unit = {
      BlockCompression.level = level
      // warm
      chunks.take(4).foreach(c => CodecSelector.encodeIntsAuto(c))
      val t0 = System.nanoTime()
      var bytes = 0L
      var in = 0L
      chunks.foreach { c =>
        bytes += CodecSelector.encodeIntsAuto(c)._2.length
        in += c.length * 4L
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[p3] $label%-18s ${in / 1e6 / secs}%8.1f MB/s/thread  ratio=${in.toDouble / bytes}%6.3f")
    }
    // level 0 = wrap still tries deflate(0) (stored blocks) — emulate "no
    // deflate" by a huge min-size instead: temporarily level 1 vs 6 vs skip.
    run("zlib level 6", 6)
    run("zlib level 1", 1)
    run("zlib level 6 (2nd)", 6)
    run("zlib level 1 (2nd)", 1)
    run("zlib level 0 ~none", 0)
    BlockCompression.level = 6
  }
}
