package graft.engine

import org.apache.spark.SparkContext
import org.apache.spark.sql.Dataset
import org.apache.spark.util.LongAccumulator

/** Read-side scan metrics — the decode-path analog of the reference's 12
  * per-file scan counters (/root/reference/src/metrics.rs:57-218:
  * bytes_scanned, stripes_pruned_statistics matched/pruned, decode_time,
  * rows_decoded, batches_produced, scan_efficiency = bytes_scanned /
  * file_size). Spark accumulators: each executor task adds as it prunes or
  * decodes, the driver reads totals after the action — the same lifecycle
  * as the reference's ExecutionPlanMetricsSet.
  *
  * `bytesScanned` counts payload bytes actually inflated+decoded;
  * `bytesPruned` counts payload bytes skipped by chunk statistics without
  * being touched. scanEfficiency = scanned / (scanned + pruned) — 1.0
  * means the statistics saved nothing (the reference's "1.0 = full read"
  * convention, metrics.rs:203-217).
  *
  * Counting semantics are AT-LEAST-ONCE, exactly like Spark's own
  * non-SQL-metric accumulators: updates happen inside a transformation, so
  * a task retry, speculative duplicate, or re-computation of an un-cached
  * dataset adds again. Treat the counters as scan telemetry (ratios like
  * scanEfficiency stay meaningful — both sides inflate together), not as
  * exactly-once accounting; for per-query exact counters use the DSv2
  * connector's CustomMetrics, which Spark aggregates from successful tasks
  * only. */
final class DecodeMetrics(sc: SparkContext) extends Serializable {
  val segmentsMatched: LongAccumulator = sc.longAccumulator("graft.decode.segmentsMatched")
  val segmentsPruned: LongAccumulator = sc.longAccumulator("graft.decode.segmentsPruned")
  val bytesScanned: LongAccumulator = sc.longAccumulator("graft.decode.bytesScanned")
  val bytesPruned: LongAccumulator = sc.longAccumulator("graft.decode.bytesPruned")
  val rowsDecoded: LongAccumulator = sc.longAccumulator("graft.decode.rowsDecoded")
  val tokensDecoded: LongAccumulator = sc.longAccumulator("graft.decode.tokensDecoded")
  val decodeNanos: LongAccumulator = sc.longAccumulator("graft.decode.decodeNanos")

  def scanEfficiency: Double = {
    val total = bytesScanned.value + bytesPruned.value
    if (total == 0L) 1.0 else bytesScanned.value.toDouble / total
  }
}

object DecodeMetrics {

  /** Metered decode with token-range chunk skipping: the same inexact
    * pruning contract as [[GraftEncoder.decodeWhereTokenRange]], with every
    * prune/decode decision counted. The skip test runs inside the task
    * lambda (not as a Catalyst filter) so both branches are observable —
    * this is the instrumented surface, the plain path stays declarative. */
  def decodeWhereTokenRange(segments: Dataset[Segment], lo: Long, hi: Long,
                            m: DecodeMetrics): Dataset[TokenRow] = {
    val spark = segments.sparkSession
    import spark.implicits._
    segments.mapPartitions { it =>
      it.flatMap { seg =>
        val tokenCol = seg.cols.find(_.col == "tokens")
        val hit = tokenCol.exists(c => c.minV <= hi && c.maxV >= lo)
        if (!hit) {
          m.segmentsPruned.add(1L)
          m.bytesPruned.add(seg.bytesOut)
          Iterator.empty
        } else {
          m.segmentsMatched.add(1L)
          m.bytesScanned.add(seg.bytesOut)
          val t0 = System.nanoTime()
          val rows = GraftEncoder.decodeSegment(seg).toArray
          m.decodeNanos.add(System.nanoTime() - t0)
          m.rowsDecoded.add(rows.length.toLong)
          m.tokensDecoded.add(rows.iterator.map(_.tokens.length.toLong).sum)
          rows.iterator
        }
      }
    }
  }
}
