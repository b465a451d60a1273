package graft

/** Shared generated-class hygiene for the long-running harness mains
  * (Bench/Verify): hundreds of queries compile thousands of codegen
  * classes; once the JVM code cache fills, the JIT stops compiling and
  * late queries degrade 10-30×. Each generated class has its own
  * classloader, so a GC after the plan reference is dropped lets the JVM
  * unload them and reclaim cache. Cadence is adaptive — every `every`
  * queries, or IMMEDIATELY when any CodeHeap pool passes 60% occupancy
  * (the launcher may run with the default 240 MB ReservedCodeCacheSize). */
object JvmHygiene {
  def codeCachePressed: Boolean = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .exists { p =>
        p.getName.startsWith("CodeHeap") && p.getUsage != null &&
          p.getUsage.getMax > 0 &&
          p.getUsage.getUsed.toDouble / p.getUsage.getMax > 0.6
      }
  }

  /** Returns the new sinceGc counter. */
  def maybeGc(sinceGc: Int, every: Int = 8): Int =
    if (sinceGc + 1 >= every || codeCachePressed) { System.gc(); 0 }
    else sinceGc + 1

  /** Cross-query block hygiene (r7 bench-tail adjudication): queries
    * that localCheckpoint (LSH connected components, winnow fingerprint
    * frames) or persist internally leave their blocks pinned in the
    * block manager after the plan reference dies — across 225 queries
    * the accumulated blocks raise memory pressure until mid-suite
    * readings inflate 4-40× over isolated runs (dedup_substring_spans
    * 48.5 s in-suite vs 12.7 s isolated on UNCHANGED code). Queries are
    * independent, so between them every tracked cache entry and leaked
    * persistent RDD is droppable. */
  def purgeBlocks(spark: org.apache.spark.sql.SparkSession): Unit = {
    try {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    } catch { case _: Exception => () }
  }
}
