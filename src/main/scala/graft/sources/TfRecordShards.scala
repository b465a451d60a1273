package graft.sources

import graft.functions.TfRecordCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord shards on disk — the file-level form of the
  * [[graft.functions.TfRecordCodec]] round trip: one `.tfrecord` file
  * per partition (loaders stripe reads across shards, so shard count =
  * parallelism; repartition upstream to pick it), written through the
  * Hadoop FS API so the same code targets local disk or HDFS/object
  * stores. Writes go to `part-NNNNN.tfrecord.tmp` and RENAME into place
  * — readers never observe a torn shard (the VectorCollection commit
  * discipline); a re-run overwrites whole shards idempotently. */
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
        if (payloads.isEmpty) Iterator.single(0L)
        else {
          val bytes = TfRecordCodec.encodeRecords(payloads)
          val path = new org.apache.hadoop.fs.Path(dir,
            f"part-$idx%05d.tfrecord")
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f"part-$idx%05d.tfrecord.tmp")
          val fs = path.getFileSystem(conf.value)
          val out = fs.create(tmp, true)
          try out.write(bytes) finally out.close()
          if (fs.exists(path) && !fs.delete(path, false))
            throw new java.io.IOException(s"cannot replace $path")
          if (!fs.rename(tmp, path))
            throw new java.io.IOException(s"cannot commit $path")
          Iterator.single(payloads.size.toLong)
        }
      }.collect() // one long per partition — bounded sidecar
    counts.sum
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
