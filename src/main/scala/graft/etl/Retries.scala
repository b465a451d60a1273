package graft.etl

/** The one retry/backoff loop both network seams share —
  * [[Embedder.embedColumn]] on the source side and
  * [[graft.sources.VectorSink.write]] on the sink side (the reference
  * retries both its OpenAI and Qdrant calls the same way). Exponential
  * backoff doubles per attempt from `backoffMs`.
  *
  * Only non-fatal failures retry: an `InterruptedException` (task
  * cancellation) rethrows immediately — swallowing it into the retry
  * loop would stall executor shutdown for the whole backoff schedule. */
private[graft] object Retries {

  def withRetries[T](maxRetries: Int, backoffMs: Long)(f: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    var lastErr: Throwable = null
    while (out.isEmpty && attempt <= maxRetries) {
      try out = Some(f)
      catch {
        case e: InterruptedException => throw e
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          attempt += 1
          if (attempt <= maxRetries) Thread.sleep(backoffMs << (attempt - 1))
      }
    }
    out.getOrElse(throw lastErr)
  }
}
