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

  test("oracleBySf selects the pin matching the lineitem count and " +
      "fails shut (NULL digest) on an unpinned scale factor") {
    import spark.implicits._
    val pins = Map(3L -> ("111", 10L), 6000L -> ("222", 20L))
    val sql = DigestGate.oracleBySf(pins)
    // a 3-row lineitem view selects the 3L pin
    (1 to 3).toDF("x").createOrReplaceTempView("lineitem")
    val out = spark.sql(sql).head()
    assert(out.getString(0) === "111" && out.getLong(1) === 10L)
    // an UNPINNED count (4 rows) yields NULL digest and NULL n_rows —
    // a loud gate mismatch, never a silent pass
    (1 to 4).toDF("x").createOrReplaceTempView("lineitem")
    val miss = spark.sql(sql).head()
    assert(miss.isNullAt(0) && miss.isNullAt(1))
    spark.catalog.dropTempView("lineitem")
    intercept[IllegalArgumentException] {
      DigestGate.oracleBySf(Map.empty)
    }
  }

  test("NO gate query ships a DECIMAL column to the driver — the " +
      "carrier rule enforced over every SparkEntry.queries output " +
      "schema (VERDICT r11 #6)") {
    // the r10 incident generalized: the driver's byte-hash disagrees
    // with itself on DECIMAL regardless of which query ships it, so the
    // rule is suite-wide — DECIMAL/BigInt arithmetic stays INSIDE the
    // plan, the output casts to STRING/BIGINT/DOUBLE/BOOLEAN/DATE/TS.
    // Building each DataFrame pays any driver-side scalar stages
    // (medians, fits) at sf0.001 but collects nothing.
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf).schema
          catch { case e: Throwable =>
            fail(s"$name failed to construct at $sf: ${e.getMessage}")
          }
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[
              org.apache.spark.sql.types.DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"DECIMAL gate carriers found:\n${offenders.mkString("\n")}")
  }
}
