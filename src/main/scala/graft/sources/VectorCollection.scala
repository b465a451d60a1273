package graft.sources

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed vector collection — the engine's Qdrant
  * (qdrant_text_loader.py S8-S10, W2, K1): create/recreate, id-offset
  * append, count reconciliation, and cosine top-k search over
  * `(id BIGINT, vector ARRAY<DOUBLE>, page_content STRING, materia STRING,
  * ano INT)`.
  *
  * Scale notes:
  *  - `assignIds` uses per-partition offsets (zipWithIndex semantics) —
  *    NOT a global row_number window, which would funnel 100 TB through a
  *    single partition. Ids are (offset + dense enumeration), matching the
  *    reference's running-count ids (qdrant_text_loader.py:189-210) without
  *    a driver loop.
  *  - append is idempotent per batch directory; `count()` after write is
  *    the reference's status-check reconciliation (:222, :306).
  */
object VectorCollection {

  def path(root: String, name: String): String = s"$root/$name"

  def create(spark: SparkSession, root: String, name: String,
      dim: Int): Unit = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vector", ArrayType(DoubleType, containsNull = false)),
      StructField("page_content", StringType),
      StructField("materia", StringType),
      StructField("ano", IntegerType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
      .write.mode(SaveMode.ErrorIfExists).parquet(path(root, name))
    // record the declared dimensionality in a SIBLING sidecar (inside
    // the dir it would not survive compact's directory swap); append
    // enforces it in-plan, so a wrong-width vector fails the load
    // loudly instead of silently vanishing from every search
    val sidecar = new org.apache.hadoop.fs.Path(path(root, name) + "._dim")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(sidecar, true)
    try out.write(dim.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The collection's declared dim from the create-time sidecar; None
    * for collections predating it (no enforcement — back-compat). */
  private def declaredDim(spark: SparkSession, root: String,
      name: String): Option[Int] = {
    val sidecar = new org.apache.hadoop.fs.Path(path(root, name) + "._dim")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sidecar)) None
    else {
      val in = fs.open(sidecar)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  def recreate(spark: SparkSession, root: String, name: String,
      dim: Int): Unit = {
    // Hadoop FS, like every other operation here — a java.io.File
    // delete is a no-op against hdfs://-/s3a://-style roots and
    // create() would then fail on the surviving directory
    val dir = new org.apache.hadoop.fs.Path(path(root, name))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir) && !fs.delete(dir, true))
      throw new java.io.IOException(s"cannot recreate: delete $dir failed")
    val sidecar = new org.apache.hadoop.fs.Path(path(root, name) + "._dim")
    if (fs.exists(sidecar)) fs.delete(sidecar, false)
    create(spark, root, name, dim)
  }

  /** `compact`'s directory swap (live → `._old`, tmp → live) has a crash
    * window in which the live path is briefly absent while the data sits
    * intact in `._old`. Readers heal it: if the live dir is missing but a
    * backup exists, roll the backup forward before reading; a leftover
    * backup NEXT TO a live dir (crash after the second rename) is stale
    * and is dropped. Called from `read` and `compact`, so no manual
    * recovery step exists. */
  /** Single-writer assumption (standard for bare parquet directories —
    * cross-process atomicity needs a table format's manifest): no reader
    * heals WHILE a compact is mid-swap in another process. Rename results
    * are checked — a false return here means the filesystem refused the
    * heal and silently proceeding could misclassify the backup as stale
    * on a later pass. */
  private def recoverInterruptedSwap(spark: SparkSession, root: String,
      name: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path(root, name))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(path(root, name) + "._old")
    if (fs.exists(bak)) {
      if (!fs.exists(dir)) {
        if (!fs.rename(bak, dir))
          throw new java.io.IOException(
            s"failed to heal interrupted swap: rename $bak -> $dir")
      } else fs.delete(bak, true)
    }
  }

  def read(spark: SparkSession, root: String, name: String): DataFrame = {
    recoverInterruptedSwap(spark, root, name)
    spark.read.parquet(path(root, name))
  }

  def count(spark: SparkSession, root: String, name: String): Long =
    read(spark, root, name).count()

  /** Dense sequential ids continuing from `offset` in partition order —
    * zipWithIndex semantics: one count pass + one emit pass, no
    * single-partition funnel (W2 scale form). */
  def assignIds(points: DataFrame, offset: Long): DataFrame = {
    val spark = points.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        points.schema.fields)
    val rdd = points.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq((i + offset) +: row.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Ordered, deterministic id assignment: global sort then dense ids.
    * Matches the reference's enumeration order semantics exactly; the
    * range-partitioned sort scales (no single-partition window). */
  def assignIdsOrdered(points: DataFrame, offset: Long,
      orderCols: Seq[String]): DataFrame = {
    val spark = points.sparkSession
    val sorted = points.orderBy(orderCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq((i + offset) +: row.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** S8: batched upsert-append; returns (attempted, added) — the
    * reference's per-file reconciliation pair (A3).
    *
    * `added` is derived from the part files THIS write created (snapshot
    * the directory listing before/after, count only the delta), so the
    * reconcile cost is O(batch), not two O(collection) scans per load —
    * at 100 TB a full-collection count per append is the difference
    * between a metadata read and re-listing the world. Parquet `count()`
    * over the new files reads only footers. A full-collection audit is
    * still available as `count(...)` for callers that want it. */
  def append(spark: SparkSession, root: String, name: String,
      points: DataFrame): (Long, Long) = {
    // heal BEFORE appending: if a crashed compact left the live dir
    // absent, SaveMode.Append would quietly recreate it with only this
    // batch, and the next read would then drop the '._old' backup holding
    // every pre-crash row as "stale".
    recoverInterruptedSwap(spark, root, name)
    val dir = new org.apache.hadoop.fs.Path(path(root, name))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(): Set[String] =
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).iterator
        .filter(_.isFile).map(_.getPath.getName)
        .filter(_.startsWith("part-")).toSet
    val before = partFiles()
    // the attempted count rides the WRITE as an Observation — a separate
    // points.count() would re-execute the whole batch plan (including any
    // embedding stage) a second time just to count it.
    // dim enforcement (when the create-time sidecar exists): an
    // assert_true INSIDE a filter predicate — it evaluates per row
    // during the write scan (a projected-then-dropped column would be
    // pruned away with its assertion), costs no extra pass, and fails
    // the load loudly on the first wrong-width vector
    val checked = declaredDim(spark, root, name) match {
      case Some(d) => points.filter(assert_true(
          size(col("vector")) === lit(d),
          lit(s"vector dim != declared $d")).isNull)
      case None => points
    }
    val obs = org.apache.spark.sql.Observation()
    checked.observe(obs, org.apache.spark.sql.functions
        .count(org.apache.spark.sql.functions.lit(1)).as("attempted"))
      .write.mode(SaveMode.Append).parquet(path(root, name))
    val attempted = obs.get("attempted").asInstanceOf[Long]
    val newFiles = (partFiles() -- before).toSeq.sorted
      .map(n => s"${path(root, name)}/$n")
    val added =
      if (newFiles.isEmpty) 0L
      else spark.read.parquet(newFiles: _*).count()
    (attempted, added)
  }

  /** Maintenance: compact the collection's accumulated small append files
    * into ~`targetRowsPerFile`-row files. Incremental loads (one parquet
    * file per append batch per partition) eventually drown a reader in
    * file-open overhead — at 100 TB the file COUNT, not the byte count,
    * becomes the scan bottleneck. Rewrites into a temp dir first and swaps
    * only after success, so a crashed compaction never loses the
    * collection: a failure before the swap leaves the live dir untouched,
    * and a failure INSIDE the swap (live renamed away, tmp not yet renamed
    * in) is healed by `recoverInterruptedSwap` on the next read/compact —
    * the data is never absent AND unrecoverable. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, root: String, name: String,
      targetRowsPerFile: Long = 1000000L): (Int, Int) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    recoverInterruptedSwap(spark, root, name)
    val dir = new org.apache.hadoop.fs.Path(path(root, name))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(s => s.isFile &&
        s.getPath.getName.startsWith("part-"))
    val before = partFiles(dir)
    val rows = count(spark, root, name)
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1)
      / targetRowsPerFile).toInt
    val tmp = new org.apache.hadoop.fs.Path(path(root, name) + "._compact")
    fs.delete(tmp, true)
    read(spark, root, name).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val after = partFiles(tmp)
    val bak = new org.apache.hadoop.fs.Path(path(root, name) + "._old")
    fs.delete(bak, true)
    def renameOrThrow(a: org.apache.hadoop.fs.Path,
        b: org.apache.hadoop.fs.Path): Unit =
      if (!fs.rename(a, b))
        throw new java.io.IOException(s"compact swap: rename $a -> $b failed")
    renameOrThrow(dir, bak)
    renameOrThrow(tmp, dir)
    fs.delete(bak, true)
    (before, after)
  }

  /** K1: cosine top-k search with the reference's dimension guard
    * (qdrant_text_loader.py:134-135). */
  def search(spark: SparkSession, root: String, name: String,
      query: Seq[Double], k: Int = 1): DataFrame = {
    val coll = read(spark, root, name)
    require(query.nonEmpty, "empty query vector")
    coll.select(col("id"), col("page_content"), col("materia"), col("ano"),
        VectorFunctions.cosineSimilarity(col("vector"), typedLit(query))
          .as("score"))
      .filter(size(col("vector")) === query.length)
      .orderBy(desc("score"), col("id").asc)
      .limit(k)
  }
}
