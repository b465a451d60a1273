package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Engine-visible schema contract for every testdata table, read through
  * the SAME entry point the queries use ([[Tables.t]]). The driver has
  * regenerated testdata between rounds with changed physical types
  * (events.ts shipped as int64 TIMESTAMP(NANOS) in one round and
  * timestamp[us] the next, silently breaking 40 queries) — this contract
  * turns the next such regeneration into ONE named failure: a failing
  * `SchemaContractSpec` test in CI, and a fail-fast
  * `SCHEMA CONTRACT VIOLATION` from `Bench`/`Verify`-side use, instead
  * of a wall of per-query analysis errors that burns a round. */
object SchemaContract {

  val expected: Map[String, Seq[(String, DataType)]] = Map(
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

  /** One human-readable violation line per drifted/unreadable table;
    * empty = contract holds. */
  def violations(spark: SparkSession, sfDir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val got = Tables.t(spark, sfDir, table).schema.fields
          .map(f => f.name -> f.dataType).toSeq
        if (got == cols) None
        else Some(s"$table: got $got, expected $cols")
      } catch {
        case e: Exception => Some(s"$table: unreadable (${e.getMessage})")
      }
    }

  /** Fail-fast entry for the bench/verify mains: throws a single named
    * error listing every drifted table. */
  def enforce(spark: SparkSession, sfDir: String): Unit = {
    val v = violations(spark, sfDir)
    if (v.nonEmpty)
      throw new IllegalStateException(
        "SCHEMA CONTRACT VIOLATION — testdata was likely regenerated " +
          "with different physical types; teach Tables.t to normalize " +
          "(as it does for events.ts) rather than changing query code:\n" +
          v.mkString("  ", "\n  ", ""))
  }
}
