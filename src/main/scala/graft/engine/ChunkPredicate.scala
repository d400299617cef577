package graft.engine

import org.apache.spark.sql.Dataset

/** Composable chunk-skipping predicates — the analog of the reference's
  * predicate tree conversion (/root/reference/src/predicate.rs:53-166:
  * comparisons composed under AND/OR, unsupported shapes degrade to
  * no-op). Evaluation is MAY-MATCH against chunk statistics: `true` means
  * the chunk could hold a matching row and must be decoded; `false` means
  * provably no row matches. Soundness composes: AND/OR of upper bounds is
  * an upper bound, so pruning stays inexact-but-superset (the
  * PushedDown::No contract, src/source.rs:279-281) and callers re-filter
  * exactly. NOT is deliberately unsupported: interval stats cannot prove
  * the complement empty for array columns, so a Not node would have to
  * degrade to always-true — callers should push negations into range
  * bounds instead.
  */
sealed trait ChunkPredicate {
  /** Could this segment contain a matching row? (false = provably not) */
  def mayMatch(seg: Segment): Boolean
}

object ChunkPredicate {

  private def chunk(seg: Segment, col: String): Option[ColChunk] =
    seg.cols.find(_.col == col)

  /** Some token value in [lo, hi] may exist in the chunk. */
  final case class TokenRange(lo: Long, hi: Long) extends ChunkPredicate {
    def mayMatch(seg: Segment): Boolean =
      chunk(seg, "tokens").exists(c => c.minV <= hi && c.maxV >= lo)
  }

  /** Some doc_id in [lo, hi] (UTF-8 byte order) may exist in the chunk. */
  final case class DocIdRange(lo: String, hi: String) extends ChunkPredicate {
    def mayMatch(seg: Segment): Boolean =
      chunk(seg, "doc_id").exists(c =>
        GraftEncoder.compareUtf8(c.minS, hi) <= 0 &&
          GraftEncoder.compareUtf8(c.maxS, lo) >= 0)
  }

  /** Some row of `source` may exist in the chunk. */
  final case class SourceEquals(source: String) extends ChunkPredicate {
    def mayMatch(seg: Segment): Boolean =
      chunk(seg, "source").exists(c =>
        GraftEncoder.compareUtf8(c.minS, source) <= 0 &&
          GraftEncoder.compareUtf8(c.maxS, source) >= 0)
  }

  final case class And(l: ChunkPredicate, r: ChunkPredicate) extends ChunkPredicate {
    def mayMatch(seg: Segment): Boolean = l.mayMatch(seg) && r.mayMatch(seg)
  }

  final case class Or(l: ChunkPredicate, r: ChunkPredicate) extends ChunkPredicate {
    def mayMatch(seg: Segment): Boolean = l.mayMatch(seg) || r.mayMatch(seg)
  }

  /** Decode only segments the predicate tree cannot rule out. Runs the
    * skip test inside the task (serialized predicate tree), so arbitrary
    * compositions prune without any Catalyst plumbing; skipped payloads
    * are never inflated. */
  def decodeWhere(segments: Dataset[Segment], pred: ChunkPredicate): Dataset[TokenRow] = {
    val spark = segments.sparkSession
    import spark.implicits._
    segments.filter(pred.mayMatch _).flatMap(GraftEncoder.decodeSegment _)
  }
}
