package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Results are materialized through the `noop` sink — unlike `count()`,
  * which lets Catalyst prune projections/orderings out of the plan, noop
  * executes the full query including expression evaluation on every row,
  * so per-query seconds reflect real operator cost. */
object Bench {
  /** Fresh session + uncounted warmup (JIT/codegen compile, parquet
    * footer+filesystem caches, shuffle machinery) — otherwise the first
    * query of each chunk absorbs the one-time session cost. */
  private def newSession(sfDir: String, cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    JvmHygiene.silenceGatedWarnings() // GlobalWindowSpec carries this gate
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Local-iteration escape hatch: SPARK_GRAFT_ONLY=q1,q2 times a subset
    // (unset in driver runs — full suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Suite partitioning (r6-r8 adjudications): one long-lived session
    // across 249 plans accumulated JVM state — generated-class/JIT
    // CodeHeap residue that per-query purgeBlocks+GC never reclaimed —
    // until mid-suite readings inflated ~2× over isolated runs of the
    // SAME code (r8: top-8 entries 270 s in-suite vs 37.8 s isolated).
    // Structural fix: run the suite as sequential FRESH sessions of ~50
    // queries; between chunks stop the session, flush the static codegen
    // cache, and GC so dead generated classes actually unload.
    val chunkSize = sys.env.getOrElse("SPARK_GRAFT_BENCH_CHUNK", "50").toInt
    var first = true
    val results = names.grouped(chunkSize).toSeq.flatMap { chunk =>
      val spark = newSession(sfDir, cpus)
      if (first) {
        // Fail fast with ONE named error if the testdata's engine-visible
        // schema drifted (driver regeneration) — otherwise every query
        // fails with its own analysis error and the round's bench is
        // garbage.
        graft.queries.SchemaContract.enforce(spark, sfDir)
        first = false
      }
      var sinceGc = 0
      val rs = chunk.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // generated-class hygiene — see JvmHygiene (adaptive: every 8
        // queries, or immediately under CodeHeap pressure)
        JvmHygiene.purgeBlocks(spark) // drop leaked persisted/checkpoint blocks
        sinceGc = JvmHygiene.maybeGc(sinceGc)
        (name, dt, ok)
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      JvmHygiene.purgeCodegenCache()
      System.gc()
      rs
    }
    // The driver keeps only the TAIL (~2 kB) of the run's output
    // (BENCH_r05 was front-truncated → parsed:null), so the one line must
    // fit entirely: per-query detail is capped to the 30 most expensive
    // entries (cost-descending — truncation would lose the cheap tail,
    // not the head) with the remainder folded into rest_sum/rest_n; the
    // full per-query map goes to bench_detail_local.json for offline
    // regression triage.
    val byCost = results.sortBy(-_._2)
    val top = byCost.take(30)
    val rest = byCost.drop(30)
    val qs = top.map { case (k, v, _) => "\"" + k + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    // a throwing query must stay distinguishable from a fast success in the
    // one JSON line the driver keeps (stderr is not retained).
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val restSum = rest.map(_._2).sum
    try {
      val full = results.sortBy(_._1)
        .map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_detail_local.json"),
        full.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","sf":"$sfDir","n":${results.size},"failed":$failed,"rest_sum":$restSum%.2f,"rest_n":${rest.size},"queries":$qs}""")
  }
}
