package graft

import graft.queries.DigestGate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The digest gate's carrier contract (round-11 regression): the r10
  * driver byte-hashed a DECIMAL(38,0) digest differently on its
  * Spark-dump vs DuckDB-oracle paths even with identical values AND
  * declared types, turning seven by-design rows hard red. The carrier
  * is now STRING (plain signed digits of the exact DECIMAL sum) +
  * BIGINT row count — the two types with ten rounds of proven driver
  * hash agreement. This spec fails if anyone reintroduces a
  * DECIMAL-typed (or otherwise unsafe) gate carrier, and pins the
  * digest's semantics: order-free, duplicate-sensitive, empty-safe. */
class DigestGateSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  test("carrier types are STRING + BIGINT — never DECIMAL") {
    val out = DigestGate.digestRow(df)
    assert(out.schema("digest").dataType === StringType)
    assert(out.schema("n_rows").dataType === LongType)
    // and the rendering is plain signed digits (no exponent, no '.')
    val d = out.head().getString(0)
    assert(d.matches("-?[0-9]+"), d)
  }

  test("digest is row-order free but duplicate- and value-sensitive") {
    def dig(x: org.apache.spark.sql.DataFrame) =
      DigestGate.digestRow(x).head().getString(0)
    assert(dig(df.orderBy(col("id").desc)) === dig(df))
    assert(dig(df.repartition(7)) === dig(df))
    assert(dig(df.union(df.limit(1))) !== dig(df))
    assert(dig(df.withColumn("v",
      when(col("id") === 1, "z").otherwise(col("v")))) !== dig(df))
  }

  test("empty input digests to '0' with n_rows 0, not null") {
    val out = DigestGate.digestRow(df.filter(col("id") < 0)).head()
    assert(out.getString(0) === "0")
    assert(out.getLong(1) === 0L)
  }

  test("oracle emits the same (digest, n_rows) shape as a constant") {
    val sql = DigestGate.oracle("-123", 7L)
    val out = spark.sql(sql).head()
    assert(out.getString(0) === "-123")
    assert(out.getLong(1) === 7L)
  }
}
