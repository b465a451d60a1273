package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY r16 probe — per-stage walls of prefixFilterJaccardPairs.
  * Not committed; delete after use. */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
    val threshold = 0.8

    // warmup: run the full operator once so JIT is hot
    time("warmup full op") {
      noop(Dedup.prefixFilterJaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = threshold))
    }

    // replicate internals
    val base = time("base cp (shingleFrame)") {
      Dedup
        .signatureFrame(docs, "doc_id", "text", 3, 0)
        .withColumn("n_sh", size($"shs"))
        .localCheckpoint()
    }
    val sh = base.select($"id", $"n_sh", explode($"shs").as("sg"))
    time("sh explode")(noop(sh))
    val dfreq = sh.groupBy($"sg").agg(count(lit(1)).as("_df"))
    time("dfreq agg")(noop(dfreq))
    val prefix = sh.join(dfreq, "sg")
      .groupBy($"id")
      .agg(min($"n_sh").as("_n"),
        array_sort(collect_list(struct($"_df", $"sg"))).as("_ord"))
      .select($"id", explode(slice($"_ord", lit(1),
        ($"_n" - ceil($"_n" * lit(threshold)) + lit(1)).cast("int"))
        .getField("sg")).as("sg"))
    time("prefix build (incl dfreq)")(noop(prefix))
    val prefixCp = time("prefix cp")(prefix.localCheckpoint())
    val cand = prefixCp.as("a").join(prefixCp.as("b"),
        col("a.sg") === col("b.sg") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("cand join (from prefix cp)")(noop(cand))
    val candCp = time("cand cp")(cand.localCheckpoint())
    val sets = base.select($"id", $"shs", $"n_sh")
    val out = candCp
      .join(sets.select($"id".as("id_a"), $"shs".as("_sa"),
        $"n_sh".as("na")), "id_a")
      .join(sets.select($"id".as("id_b"), $"shs".as("_sb"),
        $"n_sh".as("nb")), "id_b")
      .withColumn("_c", size(array_intersect($"_sa", $"_sb")))
      .select($"id_a", $"id_b",
        ($"_c" / ($"na" + $"nb" - $"_c")).as("jaccard"))
      .filter($"jaccard" >= threshold)
    time("verify (from cand cp)")(noop(out))
    println("[probe] rows: base=" + base.count() + " cand=" + candCp.count())
    val sizes = base.select($"id", $"n_sh")
    val lenOk = candCp
      .join(sizes.select($"id".as("id_a"), $"n_sh".as("na")), "id_a")
      .join(sizes.select($"id".as("id_b"), $"n_sh".as("nb")), "id_b")
      .filter($"nb" >= $"na" * lit(threshold) - lit(1e-6) &&
        $"na" >= $"nb" * lit(threshold) - lit(1e-6))
    println("[probe] lenOk cand=" + lenOk.count())
    val emitted = out.count()
    println("[probe] emitted pairs=" + emitted)

    // second full run for a hot-JIT total
    time("full op again") {
      noop(Dedup.prefixFilterJaccardPairs(
        docs, "doc_id", "text", n = 3, threshold = threshold))
    }
    spark.stop()
  }
}
