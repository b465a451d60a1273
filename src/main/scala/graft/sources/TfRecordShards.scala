package graft.sources

import graft.functions.TfRecordCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord shards on disk — the file-level form of the
  * [[graft.functions.TfRecordCodec]] round trip: one `.tfrecord` file
  * per partition (loaders stripe reads across shards, so shard count =
  * parallelism; repartition upstream to pick it), written through the
  * Hadoop FS API so the same code targets local disk or HDFS/object
  * stores. Writes go to a per-ATTEMPT tmp file and RENAME into place —
  * readers never observe a torn shard (the VectorCollection commit
  * discipline), and speculative/zombie duplicate attempts cannot
  * truncate each other's tmp (shard content is deterministic per
  * partition, so whichever attempt wins the rename commits identical
  * bytes). BEFORE launching tasks the driver sweeps every previous
  * run's `part-*.tfrecord` shard and orphaned tmp file — loudly, a
  * failed delete whose file persists aborts the write — so a re-run
  * with fewer (or differently-empty) partitions cannot leave stale
  * shards for `read` to silently mix in, and a task that finds the
  * destination already present can only be observing a sibling
  * attempt's identical bytes. Nothing is deleted after tasks launch:
  * task kills are asynchronous, so a zombie attempt can outlive the
  * job, and a post-job sweep of its tmp would make its rename-failure
  * path delete a freshly committed shard (its leftover tmp is instead
  * cleared by the next write's pre-sweep; tmps never match `read`'s
  * `*.tfrecord` glob). */
object TfRecordShards {

  /** Write `payloadCol` (binary Example payloads) as TFRecord shards;
    * returns rows written. Empty partitions write no shard (no
    * zero-record files for loaders to trip on). */
  def write(df: DataFrame, payloadCol: String, dir: String): Long = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    // pre-sweep, BEFORE any task launches: previous-run shards and
    // orphaned tmps. Must be loud — if a stale shard survives a failed
    // delete, a task's rename-failure path below would accept the OLD
    // run's bytes as this run's commit.
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dirFs = dirPath.getFileSystem(conf.value)
    if (dirFs.exists(dirPath)) dirFs.listStatus(dirPath).foreach { st =>
      val name = st.getPath.getName
      if (name.endsWith(".tfrecord") || name.contains(".tfrecord.tmp")) {
        if (!dirFs.delete(st.getPath, false) && dirFs.exists(st.getPath))
          throw new java.io.IOException(
            s"cannot clear stale shard ${st.getPath} before write")
      }
    }
    val counts = df.select(col(payloadCol).cast("binary"))
      .rdd.mapPartitionsWithIndex { (idx, it) =>
        val payloads = it.map(_.getAs[Array[Byte]](0)).toSeq
        if (payloads.isEmpty) Iterator.single((idx, 0L))
        else {
          val bytes = TfRecordCodec.encodeRecords(payloads)
          val path = new org.apache.hadoop.fs.Path(dir,
            f"part-$idx%05d.tfrecord")
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f"part-$idx%05d.tfrecord.tmp-$attempt")
          val fs = path.getFileSystem(conf.value)
          val out = fs.create(tmp, true)
          try out.write(bytes) finally out.close()
          if (!fs.rename(tmp, path)) {
            // lost the commit race to a concurrent attempt of THIS job
            // writing the SAME deterministic bytes (the pre-sweep
            // removed every stale shard, so an existing destination
            // can only be a sibling's) — drop our tmp, accept theirs
            fs.delete(tmp, false)
            if (!fs.exists(path))
              throw new java.io.IOException(s"cannot commit $path")
          }
          Iterator.single((idx, payloads.size.toLong))
        }
      }.collect() // one (idx, count) per partition — bounded sidecar
    counts.map(_._2).sum
  }

  /** Read shards back: (shard, rec_idx, payload). CRC-corrupt tails
    * degrade per shard (codec contract), never abort the scan. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val explodeRecs = udf((bytes: Array[Byte]) =>
      TfRecordCodec.decodeRecords(bytes).zipWithIndex
        .map { case (p, i) => (i, p) })
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord")
      .load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("shard"),
        explode(explodeRecs(col("content"))).as("_r"))
      .select(col("shard"), col("_r._1").as("rec_idx"),
        col("_r._2").as("payload"))
  }
}
