package graft.operators

import org.apache.spark.sql.SparkSession

/** Driver-side overlap of two INDEPENDENT pipeline builds (optimization
  * guide §2.6): Spark happily schedules several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. Audit-twin queries build two self-contained
  * pipelines (e.g. a semantic and a brute dedup, or an exact and a
  * cell-restricted miner) whose construction is EAGER (k-means driver
  * loops, localCheckpoint materializations, connected-components
  * rounds); built one after the other, each pipeline's scheduling gaps
  * and stage tails leave the cluster idle while the other waits. One
  * extra driver thread lets the second pipeline's jobs back-fill those
  * gaps.
  *
  * Results are unaffected: both builds are pure functions of their
  * inputs, touch disjoint state, and every observation/checkpoint they
  * register is instance-scoped (Observation() auto-names — see the
  * connectedComponents note). Use ONLY for genuinely independent
  * builds. */
object Overlap {
  def inParallel[A, B](a: => A, b: => B): (A, B) = {
    val session = SparkSession.getActiveSession.orNull
    var bRes: Option[Either[Throwable, B]] = None
    val t = new Thread(() => {
      // job groups/descriptions are thread-local; the child thread only
      // needs the active-session binding for code that resolves it
      // implicitly (frames carry their own session regardless)
      if (session != null) SparkSession.setActiveSession(session)
      val r = try Right(b) catch { case e: Throwable => Left(e) }
      bRes = Some(r)
    }, "graft-overlap")
    t.setDaemon(true)
    t.start()
    val aRes =
      try a
      finally t.join() // never leave the sibling build running
    bRes match {
      case Some(Right(r)) => (aRes, r)
      case Some(Left(e)) => throw e
      case None => throw new IllegalStateException(
        "overlapped build produced no result")
    }
  }
}
