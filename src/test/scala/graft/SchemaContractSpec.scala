package graft

import graft.queries.Tables
import org.apache.spark.sql.types._

/** Engine-visible schema contract for every testdata table, read through
  * the SAME entry point the queries use (`Tables.t`). The driver has
  * regenerated the testdata between rounds with changed physical types
  * (events.ts shipped as int64 TIMESTAMP(NANOS) in one round and
  * timestamp[us] in the next, silently breaking 40 queries) — this spec
  * turns the next such regeneration into ONE failing test naming the
  * exact column, instead of a wall of analysis errors. */
class SchemaContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts is normalized to TimestampType by Tables.t regardless of the
    // physical encoding (int64 nanos OR timestamp[us]) — every query is
    // written against that type.
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table: engine-visible schema matches the query contract") {
      val df = Tables.t(spark, sfDir, table)
      val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      assert(got === cols,
        s"\n$table schema drifted — the driver likely regenerated " +
          s"testdata.\n  got:      $got\n  expected: $cols\n" +
          "If the physical type of a column changed, teach Tables.t to " +
          "normalize it (as it does for events.ts) rather than changing " +
          "query code.")
    }
  }

  test("every table is non-empty at sf0.001") {
    for (table <- expected.keys)
      assert(Tables.t(spark, sfDir, table).limit(1).count() === 1L,
        s"$table is empty")
  }
}
