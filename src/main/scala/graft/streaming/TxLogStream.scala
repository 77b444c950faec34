package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.etl.TxLog

/** Structured-Streaming ingest INTO the TxLog table format — the
  * streaming half of the lakehouse story: micro-batches land as ACID
  * commits, exactly once.
  *
  * Exactly-once contract: Spark's checkpoint guarantees each batch id is
  * REPROCESSED at least once after a crash, never skipped — so the sink
  * must make re-commits of the same batch no-ops. Each batch commits via
  * [[TxLog.appendOnce]] with marker `"<appId>/<batchId>"`: a replay whose
  * commit already published finds its own marker and does nothing (the
  * Delta-protocol appId/version txn pattern). Readers see each batch's
  * rows exactly once regardless of where the writer crashed.
  *
  * Scale shape: the data write is an ordinary distributed parquet write
  * (executors never touch the log); the driver publishes one version
  * file per micro-batch. At 100 TB the same structure holds — commit
  * frequency, not data volume, bounds the log, and checkpoint compaction
  * (TxLog scaladoc) caps replay cost. */
object TxLogStream {

  /** One-shot (AvailableNow) ingest of `stream` into `table`; blocks
    * until drained. `appId` scopes idempotence markers so independent
    * pipelines writing one table cannot collide. */
  def ingest(spark: SparkSession, stream: DataFrame, table: String,
             checkpoint: String, appId: String = "graft-ingest"): Unit =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(spark, batch, table, appId, id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

  /** One micro-batch commit — public so crash-replay is spec-testable
    * without faking a checkpoint rollback. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
                                  table: String, appId: String,
                                  batchId: Long): Unit = {
    TxLog.appendOnce(spark, table, batch, s"$appId/$batchId")
    ()
  }

  // --------------------------------------------- streaming CDC-apply

  /** Structured-Streaming keyed UPSERT into the table format — the
    * CDC-APPLY sink (round 13): each micro-batch MERGEs into `table` on
    * `keyCols` (matched rows replaced, new keys inserted). With `opCol`,
    * rows whose op value is `"D"` are applied as a keyed DELETE instead
    * ([[TxLog.deleteMatched]]) and the op column is dropped from the
    * upserted rows — the Debezium-style apply loop. Each batch must be
    * key-unique after op-splitting (MERGE's multiple-matches rule);
    * compact multi-op keys upstream.
    *
    * Exactly-once END STATE under crash replay, two layers: the content
    * operations are themselves idempotent (re-merging identical rows
    * replaces them with themselves; re-deleting absent keys is a
    * no-commit no-op), and a MARKER commit (`<appId>/<batchId>`)
    * published after the batch's content lets an already-completed
    * batch's replay skip entirely — only a crash INSIDE the batch window
    * re-runs the idempotent ops. Readers therefore converge to the same
    * snapshot regardless of where the writer crashed; only the version
    * COUNT can differ, never content. */
  def applyCdc(spark: SparkSession, stream: DataFrame, table: String,
               keyCols: Seq[String], checkpoint: String,
               opCol: Option[String] = None,
               appId: String = "graft-cdc-apply"): Unit =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, batch, table, keyCols, opCol, appId, id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

  /** One CDC-apply batch — public so crash replay is spec-testable. */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
                                table: String, keyCols: Seq[String],
                                opCol: Option[String], appId: String,
                                batchId: Long): Unit = {
    val txn = s"$appId/$batchId"
    if (TxLog.txnSeen(table, txn)) return // completed batch: whole replay skips
    import org.apache.spark.sql.functions.col
    opCol match {
      case None =>
        if (!batch.isEmpty) { TxLog.merge(spark, table, batch, keyCols); () }
      case Some(op) =>
        val deletes = batch.filter(col(op) === "D")
          .select(keyCols.map(col): _*)
        val upserts = batch.filter(col(op) =!= "D").drop(op)
        if (!deletes.isEmpty) { TxLog.deleteMatched(spark, table, deletes, keyCols); () }
        if (!upserts.isEmpty) { TxLog.merge(spark, table, upserts, keyCols); () }
    }
    TxLog.commitMarker(table, txn)
    ()
  }

  // ------------------------------------------------------- CDC tail

  /** One un-acked increment: the rows of versions `(fromV, toV]`, plus
    * the ack that durably advances the consumer offset to `toV`. */
  final case class Increment(df: DataFrame, fromV: Long, toV: Long,
                             ack: () => Unit)

  /** The OTHER half of the streaming story: a durable incremental
    * consumer ("CDC tail") reading OUT of a TxLog table. Each [[poll]]
    * returns the increment between the last ACKED version and the
    * current head (file-level — an ordinary distributed scan of just
    * the added files, via [[TxLog.changes]]), with an ack handle that
    * persists the new offset.
    *
    * Delivery contract — the consumer side of exactly-once: a crash
    * BETWEEN processing and ack replays the SAME increment on the next
    * poll (at-least-once); a downstream that writes each increment with
    * [[TxLog.appendOnce]] marker `"tail:<toV>"` makes the replay a
    * no-op, upgrading the pipeline to exactly-once end-to-end — the
    * same process-then-checkpoint discipline Spark's own sources use,
    * here over the commit log itself.
    *
    * Offsets are versioned files (`<v>.ack`) published with the log's
    * own createLink CAS, so racing consumers sharing one checkpoint dir
    * cannot corrupt the offset — both may process an increment
    * (at-least-once stands), but acks serialize and the offset only
    * advances. Driver-side metadata only; bounded by commit count. */
  object Tail {
    private def ackDir(checkpoint: String): java.nio.file.Path =
      java.nio.file.Paths.get(checkpoint, "acks")

    /** Last durably-acked version (0 = nothing acked). */
    def acked(checkpoint: String): Long = {
      val d = ackDir(checkpoint)
      if (!java.nio.file.Files.isDirectory(d)) return 0L
      val it = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".ack"))
          .map(_.stripSuffix(".ack").toLong)
          .foldLeft(0L)(math.max)
      } finally it.close()
    }

    /** The next un-acked increment, or None when the tail has caught up.
      * Process the frame FIRST, then call `ack()` — acking first turns
      * the contract into at-most-once. Inherits [[TxLog.changes]]'
      * round-13 CDC semantics: optimize rewrites are silently skipped
      * (never re-delivered), and a CHANGE commit in the range fails the
      * poll loudly unless `skipChangeCommits` opts in to skipping it. */
    def poll(spark: SparkSession, table: String,
             checkpoint: String,
             skipChangeCommits: Boolean = false): Option[Increment] = {
      val from = acked(checkpoint)
      val head = TxLog.versions(table).lastOption.getOrElse(0L)
      if (head <= from) return None
      val df = TxLog.changes(spark, table, from, Some(head), skipChangeCommits)
      Some(Increment(df, from, head, () => {
        val d = ackDir(checkpoint)
        java.nio.file.Files.createDirectories(d)
        val tmp = d.resolve(s".tmp-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.write(tmp, Array.empty[Byte])
        try java.nio.file.Files.createLink(d.resolve(s"$head.ack"), tmp)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
        finally java.nio.file.Files.deleteIfExists(tmp)
      }))
    }
  }
}
