package graft.core

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame

/** Deterministic lifetime management for library-internal caches.
  *
  * The candidate-then-verify operators (Dedup, Curation, Mining) must
  * `.cache()` a corpus-scale intermediate because several sibling subtrees
  * of the ONE returned plan consume it and Catalyst has no DAG sharing.
  * That cache cannot be released inside the operator — the caller's action
  * hasn't run yet — so by default its lifetime is the session's (released
  * by `spark.catalog.clearCache()`, which the Verify/Bench harnesses call
  * per query).
  *
  * `CacheScope.scoped` gives composing callers a precise alternative:
  *
  * {{{
  * CacheScope.scoped {
  *   Dedup.jaccardPairs(docs).count()   // consume INSIDE the scope
  * } // every operator-internal cache created in the scope is unpersisted
  * }}}
  *
  * Operators register their caches via [[cached]]; outside any scope it is
  * exactly `.cache()`. Scopes are thread-local (operator construction and
  * the consuming action happen on the caller's thread) and nest: each scope
  * releases only the caches created while it was innermost.
  */
object CacheScope {

  private val active = new ThreadLocal[List[ListBuffer[DataFrame]]] {
    override def initialValue(): List[ListBuffer[DataFrame]] = Nil
  }

  /** Cache `df` and register it with the innermost active scope (if any). */
  def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    active.get() match {
      case scope :: _ => scope += c
      case Nil        =>
    }
    c
  }

  /** Run `body` — which must CONSUME the frames it builds — then unpersist
    * every cache the library registered during it. Returns body's result. */
  def scoped[T](body: => T): T = {
    val scope = new ListBuffer[DataFrame]
    active.set(scope :: active.get())
    try body
    finally {
      active.set(active.get().tail)
      scope.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    }
  }
}
