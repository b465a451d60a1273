package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access (TESTDATA.md): one parquet per table under the
  * sf directory passed by the driver. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
      // reader rejects by default; read the raw int64 nanos and convert.
      // The testdata is microsecond-aligned so `ts div 1000` is lossless
      // (integer division — a double roundtrip would corrupt ns epochs,
      // which exceed 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
