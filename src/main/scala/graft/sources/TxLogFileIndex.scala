package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

import graft.etl.{TxLog, TxStats}

/** Catalyst-integrated data skipping for [[TxLog]] tables: a custom
  * `FileIndex` whose `listFiles` receives every query's data filters
  * DURING PLANNING and consults the commit log's per-file stats
  * ([[TxStats]]) to hand the parquet scan only the files that can hold
  * matching rows — the production-lakehouse integration pattern (a
  * log-derived file index under an ordinary relation), in contrast to
  * `TxLog.readWhere`, which prunes for one explicit predicate at call
  * time. Through [[TxLogTable.apply]] the table behaves like any other
  * DataFrame: joins, aggregates, and views all prune automatically,
  * and everything BELOW file granularity (row-group pushdown, column
  * pruning, vectorized reading) is the stock parquet path — the index
  * only swaps which files the scan sees.
  *
  * Snapshot isolation: the live file set is fixed at construction
  * (optionally AS OF a version), so a concurrent commit never changes
  * what a running query reads; `refresh()` is deliberately a no-op.
  * Pruning is conservative exactly like readWhere: a file is dropped
  * only when its stats PROVE no row matches; Spark re-applies the
  * filters to the survivors, so correctness never depends on the
  * stats. Driver-side metadata only — O(files) per planning pass.
  */
final class TxLogFileIndex(table: String, asOf: Option[Long] = None)
    extends FileIndex with org.apache.spark.internal.Logging {

  /** (hadoop status, decoded stats) per live file, fixed at
    * construction. Stats are footer min/max merged with the file's
    * partition point-stats ([[TxLog.statsResolver]]) — on a PARTITIONED
    * table every pushed partition predicate prunes exactly, even for
    * files whose footer harvest failed. */
  private val entries: Seq[(FileStatus, Option[TxStats.FileStats])] = {
    val resolve = TxLog.statsResolver(table, asOf)
    TxLog.snapshotAdds(table, asOf).map { a =>
      val p = Paths.get(table, a.path).toAbsolutePath
      val st = new FileStatus(Files.size(p), false, 1, 0L,
        Files.getLastModifiedTime(p).toMillis, new Path(p.toUri))
      (st, resolve(a))
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(Paths.get(table).toUri))

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = entries.map(_._1.getLen).sum

  override def inputFiles: Array[String] =
    entries.map(_._1.getPath.toString).toArray

  /** Snapshot-isolated by design: the set was pinned at construction. */
  override def refresh(): Unit = ()

  /** Files pruned by the LAST listFiles call (planning pass) — makes the
    * skipping decision observable next to the plan instead of only via
    * result hashes (round-11 VERDICT #8): `EXPLAIN` shows the scan, this
    * shows what the scan never saw. One planning pass per query; the
    * volatile write is driver-side only. */
  @volatile var lastPrunedCount: Int = 0

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = dataFilters.reduceOption(And) match {
      case None => entries
      case Some(pred) => entries.filter {
        case (_, Some(fs)) => fs.rows > 0 && TxStats.mayTrue(pred, fs)
        case (_, None)     => true // stats-less file: never skipped
      }
    }
    lastPrunedCount = entries.size - kept.size
    if (lastPrunedCount > 0)
      logInfo(s"TxLogFileIndex($table): pruned $lastPrunedCount of " +
        s"${entries.size} files via commit-log stats")
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
  }
}

object TxLogTable {

  /** Open a TxLog table as an ordinary DataFrame whose scan prunes
    * files through the commit log's stats for WHATEVER filters each
    * query pushes — `TxLogTable(spark, t).filter(...)`, joins against
    * it, SQL over a view of it: all skip automatically. Binds the
    * log's declared schema (evolved tables read with the union schema,
    * absent columns as null); pre-schema tables fall back to parquet
    * footer inference. */
  def apply(spark: SparkSession, table: String,
            asOf: Option[Long] = None): DataFrame =
    withIndex(spark, table, asOf)._1

  /** Same, returning the live [[TxLogFileIndex]] too, so callers (specs,
    * diagnostics) can observe `lastPrunedCount` after an action. */
  def withIndex(spark: SparkSession, table: String,
                asOf: Option[Long] = None): (DataFrame, TxLogFileIndex) = {
    // reader-capability gate (the Delta minReaderVersion pattern): a
    // plain file relation CANNOT apply deletion vectors, and silently
    // returning deleted rows would be corruption — refuse and point at
    // the DV-aware reader
    require(TxLog.dvsAt(table, asOf).isEmpty,
      s"$table carries deletion vectors, which this file-index relation " +
        "cannot apply — read via TxLog.read / TxLog.readWhere, or run " +
        "TxLog.optimize to materialize the deletes first")
    // same reader-capability discipline for column mapping: the index
    // binds the logical schema onto physical-named files
    require(TxLog.renameMap(table, asOf).isEmpty,
      s"$table uses column mapping (RENAME COLUMN), which this " +
        "file-index relation cannot translate — read via TxLog.read / " +
        "TxLog.readWhere")
    val idx = new TxLogFileIndex(table, asOf)
    val schema = TxLog.schemaOf(table, asOf).getOrElse {
      require(idx.inputFiles.nonEmpty, s"empty snapshot for $table asOf=$asOf")
      spark.read.parquet(idx.inputFiles.toIndexedSeq: _*).schema
    }
    val rel = HadoopFsRelation(
      location = idx,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    (spark.baseRelationToDataFrame(rel), idx)
  }
}
