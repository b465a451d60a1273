package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table access (TESTDATA.md): one parquet per table under the
  * sf directory passed by the driver. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet has shipped as both TIMESTAMP(NANOS) (which Spark's
      // parquet reader rejects unless nanosAsLong is set, then surfaces as
      // int64 nanos) and plain timestamp[us] (which reads natively).
      // Setting the flag is harmless for micros, so set it, read, and
      // dispatch on the type `ts` actually arrived as: convert only when
      // it is a raw long of nanos. The nanos testdata is microsecond-
      // aligned so `ts div 1000` is lossless (integer division — a double
      // roundtrip would corrupt ns epochs, which exceed 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else
        // timestamp[us] arrives as TIMESTAMP_NTZ; normalize to
        // TimestampType (the type every query was written against —
        // unix_micros and BIGINT casts reject NTZ). Session TZ is
        // pinned UTC, so the cast is value-identical.
        df.withColumn("ts", col("ts").cast("timestamp"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
