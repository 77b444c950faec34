package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.etl.TxLog

/** `table_changes(...)` — the SQL-visible BATCH change-feed entry
  * (round-15, VERDICT r14 #5), mirroring the public Delta TVF:
  *
  * {{{
  *   SELECT * FROM table_changes('<table-path>', <startVersion> [, <endVersion>])
  *   SELECT * FROM table_changes('<table-path>', '<startTsMillis>' [, <endVersion>])
  * }}}
  *
  * Bounds are INCLUSIVE on both ends (the Delta contract; the engine
  * half is [[TxLog.changeFeed]]'s half-open `(from, to]` shifted by
  * one). A STRING second argument is an epoch-millis timestamp resolved
  * through the commit-timestamp monotonization ([[TxLog.versionAtOrAfter]]
  * — "changes committed at or after this time"), the same rule as the
  * reader option by that name. Registered by `GraftExtensions`
  * (spark.sql.extensions) and imperatively by [[TxLogSqlDml.install]] —
  * a TVF is analysis-time, so unlike the DML strategy it needs the
  * registry, not the planner.
  *
  * The builder runs at ANALYSIS on the driver: it materializes the CDF
  * plan (bounded scans of each version's cdc/changed files) and hands
  * the analyzer its logical plan — ordinary distributed execution from
  * there. */
object TableChanges {

  val info = new ExpressionInfo(TableChanges.getClass.getName, "table_changes")
  val ident: FunctionIdentifier = FunctionIdentifier("table_changes")

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 2 || exprs.size == 3,
      "table_changes takes (tablePath, startVersion|'startTsMillis'[, endVersion])")
    val spark = SparkSession.active
    val path = exprs.head match {
      case Literal(s, StringType) if s != null => TxLogSource.normalize(s.toString)
      case other => throw new IllegalArgumentException(
        s"table_changes: the table path must be a string literal, got ${other.sql}")
    }
    def longLit(e: Expression, what: String): Long = e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"table_changes: $what must be an integer literal, got ${other.sql}")
    }
    val from = exprs(1) match {
      case Literal(s, StringType) if s != null =>
        val ts = s.toString.trim.toLong
        TxLog.versionAtOrAfter(path, ts).getOrElse(
          throw new IllegalArgumentException(
            s"no committed version of $path at or after timestamp $ts")) - 1
      case e =>
        val v = longLit(e, "startVersion")
        require(v >= 1, s"table_changes: startVersion must be >= 1, got $v")
        v - 1
    }
    val to = if (exprs.size == 3)
      Some(longLit(exprs(2), "endVersion")) else None
    org.apache.spark.sql.graft.GraftSqlBridge
      .logicalPlan(TxLog.changeFeed(spark, path, from, to))
  }
}
