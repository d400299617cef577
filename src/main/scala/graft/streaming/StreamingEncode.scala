package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.TokenRow
import graft.lineage.SegmentStore

/** Incremental (Structured Streaming) front-end to the encode engine.
  *
  * The reference is a batch-only format extension; a 10^12-sequence
  * training-data pipeline, however, is fed continuously — new token files
  * land in the input table and must be encoded without re-running the whole
  * job. This module turns the existing batch commit path into an exactly-once
  * incremental one with ZERO new commit machinery:
  *
  *  - each micro-batch commits through [[SegmentStore.encodeCommit]] with
  *    `snapshotId = StreamEpochBase + batchId` (the streaming id space —
  *    disjoint from batch appends' max+1 allocation, so an interleaved
  *    batch write can never land on a future epoch's id and trip the
  *    replay skip into dropping real data), so every batch is its own
  *    ledgered snapshot (input files -> snapshot id is recorded by the
  *    checkpoint's offset log, chunk/codec/byte stats by our ledger);
  *  - after a crash, Structured Streaming REPLAYS the last uncommitted batch
  *    with the SAME batchId; `encodeCommit` then skips buckets already in
  *    the ledger and rewrites the rest byte-identically (Segment
  *    determinism), so the pair composes to exactly-once end-to-end —
  *    the same argument as the batch restart protocol, with the streaming
  *    checkpoint replacing the driver loop;
  *  - a re-run over an already-drained checkpoint processes nothing
  *    (asserted in StreamingEncodeSpec).
  *
  * At scale this runs as one long-lived job per table: `maxFilesPerTrigger`
  * bounds micro-batch size (memory ceiling per executor is the same as the
  * batch path's per-bucket bound), and `Trigger.AvailableNow` gives the
  * catch-up/backfill mode that drains everything pending and exits.
  */
object StreamingEncode {

  /** Start the incremental encode over a parquet directory of [[TokenRow]]s.
    *
    * @param maxFilesPerTrigger micro-batch size bound (files per trigger)
    * @param availableNow true = drain everything currently present and stop
    *                     (backfill / catch-up); false = run continuously
    */
  def start(spark: SparkSession,
            inputDir: String,
            tableDir: String,
            checkpointDir: String,
            buckets: Int = 16,
            maxFilesPerTrigger: Int = 1,
            availableNow: Boolean = true): StreamingQuery = {
    implicit val enc = Encoders.product[TokenRow]
    val stream = spark.readStream
      .schema(enc.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .as[TokenRow]
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[TokenRow], batchId: Long) =>
        SegmentStore.encodeCommit(batch, tableDir,
          snapshotId = graft.sources.GraftWriteCommit.StreamEpochBase + batchId,
          buckets = buckets)
        () // value discarded: commit evidence lives in the lineage ledger
      }
      .trigger(
        if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime("1 second"))
      .start()
  }

  /** Drain everything currently in `inputDir` into `tableDir` and return
    * when done (Trigger.AvailableNow + awaitTermination). */
  def drain(spark: SparkSession,
            inputDir: String,
            tableDir: String,
            checkpointDir: String,
            buckets: Int = 16,
            maxFilesPerTrigger: Int = 1): Unit =
    start(spark, inputDir, tableDir, checkpointDir, buckets, maxFilesPerTrigger,
      availableNow = true).awaitTermination()
}
