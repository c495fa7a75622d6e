package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Targeted cleanup for operator-INTERNAL persist()s.
  *
  * Several dedup detectors persist shared intermediate frames (capped
  * inverted indexes, corpus shingle frames) that their callers cannot
  * reach. Through round 8 the composing pipelines
  * ([[graft.operators.Dedup.verbatimCleanFixpoint]], the streaming
  * ingest sinks) dropped them with `spark.catalog.clearCache()` — which
  * also evicted every frame the CALLER had persisted, making the
  * operators unsafe to compose with caller-side caching (round-8
  * verdict nit). This registry scopes the cleanup to exactly the
  * detector-owned handles:
  *
  *   - operators register their internal persists with [[track]] — a
  *     no-op when no scope is active, so standalone use keeps the
  *     existing caller-owned-cleanup contract (Bench/Verify clearCache
  *     between queries);
  *   - pipelines that own a detector invocation wrap it in [[scoped]];
  *     at scope exit every frame tracked INSIDE it is unpersisted —
  *     and nothing else.
  *
  * Scopes are thread-local and nest (innermost wins), which matches how
  * the pipelines run: plan building AND the actions that consume the
  * persisted frames happen on the invoking thread (a foreachBatch body,
  * a compaction loop round). A scope must only wrap code that EXECUTES
  * its consumers — frames returned out of a scope lazily would lose
  * their cache marks before running.
  */
object CacheScope {
  private val scopes = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue: List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Register a detector-internal persisted frame with the innermost
    * active scope; returns it for chaining. No scope active → no-op
    * (the caller-owned-cleanup contract).
    */
  def track(df: DataFrame): DataFrame = {
    scopes.get().headOption.foreach(_ += df)
    df
  }

  /** Run `body`, then unpersist exactly the frames [[track]]ed inside
    * it. Frames persisted by the caller outside the scope survive.
    */
  def scoped[T](body: => T): T = {
    val buf = ArrayBuffer.empty[DataFrame]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.unpersist())
    }
  }
}
