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
}
