package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import graft.functions.{CosineSimilarity, HashedWordShingles, WinnowedFingerprint, WordShingles}

/** Optimizer rule: a projection carrying one of the engine's compute-heavy
  * expressions (shingling, winnowing, cosine) directly over a SMALL leaf
  * relation is rewritten to repartition the input first.
  *
  * Why this is a real rule and not a heuristic hack: Spark sizes scan
  * parallelism from BYTES (`maxPartitionBytes`/row groups), which is the
  * right cost model for scan-bound plans but the wrong one when the
  * projection does O(len^2-ish) work per row — a 1 MB corpus of 5k docs is
  * "one split" to the scheduler yet carries seconds of expression work
  * (measured: the whole shingle pass ran on 1 of 32 cores before this).
  * The rule only fires when
  *   - an expensive graft expression appears in a Project list,
  *   - the child is a bare leaf relation (no exchange below already), and
  *   - the relation's estimated size is under
  *     `spark.graft.parallelize.maxBytes` (default 64 MB — above that,
  *     byte-based splitting already yields parallel scans),
  * so at 100 TB it never touches a healthy plan. Round-robin repartition
  * (not hash) because the projection is per-row: no key needed, no skew.
  *
  * Registered by `GraftExtensions` (injectOptimizerRule) — pure-SQL users
  * get it with `spark.sql.extensions=graft.GraftExtensions`; the
  * DataFrame-API path achieves the same via `Tables.load`'s spread.
  */
case class ParallelizeExpensiveProjection(
    session: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {

  private val MaxBytesKey = "spark.graft.parallelize.maxBytes"

  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: WordShingles | _: HashedWordShingles |
         _: WinnowedFingerprint | _: CosineSimilarity => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maxBytes = session.conf.get(MaxBytesKey, (64L * 1024 * 1024).toString).toLong
    val target = session.sparkContext.defaultParallelism
    plan.transformUp {
      case p @ Project(list, child: LogicalRelation)
          if list.exists(isExpensive) &&
            child.stats.sizeInBytes <= BigInt(maxBytes) =>
        p.copy(child = Repartition(target, shuffle = true, child))
      // the same projection over an already-filtered scan (filters get
      // pushed below the exchange anyway, so parallelizing above the
      // filter is still correct and still cheap)
      case p @ Project(list, f @ Filter(_, _: LogicalRelation))
          if list.exists(isExpensive) &&
            f.child.stats.sizeInBytes <= BigInt(maxBytes) =>
        p.copy(child = Repartition(target, shuffle = true, f))
    }
  }
}
