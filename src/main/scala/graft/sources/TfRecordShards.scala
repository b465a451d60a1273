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
  * bytes). After the job the driver removes every `part-*.tfrecord`
  * NOT written by this run plus orphaned tmp files, so a re-run with
  * fewer (or differently-empty) partitions cannot leave stale shards
  * for `read` to silently mix in. */
object TfRecordShards {

  /** Write `payloadCol` (binary Example payloads) as TFRecord shards;
    * returns rows written. Empty partitions write no shard (no
    * zero-record files for loaders to trip on). */
  def write(df: DataFrame, payloadCol: String, dir: String): Long = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
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
          if (fs.exists(path)) fs.delete(path, false)
          if (!fs.rename(tmp, path)) {
            // lost the commit race to a concurrent attempt writing the
            // SAME deterministic bytes — drop our tmp and accept theirs
            fs.delete(tmp, false)
            if (!fs.exists(path))
              throw new java.io.IOException(s"cannot commit $path")
          }
          Iterator.single((idx, payloads.size.toLong))
        }
      }.collect() // one (idx, count) per partition — bounded sidecar
    // stale-shard sweep: shards from a previous wider run (or from a
    // partition that was non-empty then and is empty now) would
    // otherwise survive and read() would mix them into results
    val written = counts.collect {
      case (i, n) if n > 0 => f"part-$i%05d.tfrecord"
    }.toSet
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    if (fs.exists(dirPath)) fs.listStatus(dirPath).foreach { st =>
      val name = st.getPath.getName
      if ((name.endsWith(".tfrecord") && !written.contains(name)) ||
          name.contains(".tfrecord.tmp"))
        fs.delete(st.getPath, false)
    }
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
