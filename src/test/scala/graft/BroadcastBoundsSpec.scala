package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** Broadcast-hint scale audit (round-12 VERDICT #8, the dims-at-scale
  * guard): an EXPLICIT `broadcast()` hint is an order, not a suggestion —
  * AQE never demotes it — so a hint wrapping an SF-PROPORTIONAL relation
  * is a driver OOM deferred to the first real cluster run. This sweep
  * walks the analyzed plan of EVERY registered query, finds each
  * broadcast-hinted subtree, and requires it to be bounded BY
  * CONSTRUCTION: either it contains a cardinality-bounding node
  * (Aggregate / GlobalLimit / Sample / Deduplicate) above every
  * SF-proportional leaf, or it reads no SF-proportional table at all
  * (literal frames, dimension tables region/nation whose cardinality is
  * fixed by the data model, driver-built stats rows).
  *
  * SF-proportional tables are recognized by their column fingerprints
  * (l_*, o_*, doc_id/text, embedding vectors, event ts), so the check
  * survives path/layout changes. The companion PlanSpec "scale
  * simulation" test verifies size-based broadcasts demote cleanly; this
  * one verifies the non-demotable hints can never need to. */
class BroadcastBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("bcast-bounds", cores = 8)
  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  /** Does this leaf read an SF-proportional table? Fact tables and the
    * big synthetic tables scale with SF; region/nation are fixed-size by
    * the data model (5 / 25 rows at every SF) and customer/supplier/part
    * are NEVER explicitly hinted (PlanSpec's demotion test covers their
    * size-based broadcasts), so only unbounded-by-construction sources
    * count here. */
  private def sfProportional(leaf: LogicalPlan): Boolean = {
    val cols = leaf.output.map(_.name).toSet
    cols.contains("l_orderkey") || cols.contains("o_orderkey") ||
      (cols.contains("doc_id") && cols.contains("text")) ||
      (cols.contains("doc_id") && cols.contains("embedding")) ||
      (cols.contains("event_id") || (cols.contains("user_id") && cols.contains("ts"))) ||
      cols.contains("c_custkey") || cols.contains("s_suppkey") ||
      cols.contains("p_partkey")
  }

  /** A node that bounds the cardinality of everything beneath it. */
  private def bounding(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: Sample | _: Deduplicate => true
    case _ => false
  }

  /** Every SF-proportional leaf must sit under a bounding node WITHIN the
    * hinted subtree. */
  private def boundedByConstruction(root: LogicalPlan): Boolean = {
    def walk(p: LogicalPlan): Boolean =
      bounding(p) || (p.children.nonEmpty && p.children.forall(walk)) ||
        (p.children.isEmpty && !sfProportional(p))
    walk(root)
  }

  /** Hints whose bound the structural walk cannot see — each one is a
    * FILTER-bounded side, audited by hand and named here so a new
    * unbounded hint anywhere else still fails the sweep. Two shapes:
    *
    *   - rank-equality median selection: row_number per source, then
    *     `filter(rn === (n+1) DIV 2)` — EXACTLY one row per source
    *     (q163/q178 robust stats, q197's conformal qhat-rank pick);
    *   - eval-set postings: `filter(doc_id < evalMax)` with a literal
    *     bound, so the broadcast side is |eval docs| × shingles/doc —
    *     independent of corpus size (q87/q168 contamination).
    *
    * A structural recognizer for "filter provably bounds cardinality"
    * would have to reason about window ranks and literal predicates —
    * the whitelist keeps the audit exact instead of heuristic. */
  private val boundedByFilter = Set(
    "q87_contamination", "q168_contam_evidence", // doc_id < evalMax postings
    "q163_robust_stats", "q178_robust_outliers", // rank-equality medians
    "q197_conformal") // rank-equality qhat selection on the calibration split

  test("every explicit broadcast() hint wraps a scale-bounded relation") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val analyzed =
          try fn(spark, sf).queryExecution.analyzed
          catch { case e: Throwable =>
            fail(s"$name failed to analyze at $sf: ${e.getMessage}")
          }
        val hinted = analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.exists(
            _.toString.toUpperCase.contains("BROADCAST")) => h.child
        }
        hinted.zipWithIndex.collect {
          case (sub, i) if !boundedByConstruction(sub) &&
              !boundedByFilter(name) =>
            s"$name#$i: ${sub.nodeName} over ${sub.collectLeaves().map(_.nodeName).mkString(",")}"
        }
    }
    assert(offenders.isEmpty,
      s"broadcast hints over SF-proportional, unbounded relations (driver " +
        s"OOM at scale): ${offenders.mkString("; ")}")
  }
}
