package graft

import graft.queries.{SchemaContract, Tables}

/** CI face of [[graft.queries.SchemaContract]] — one failing test naming
  * the exact table/column when a driver testdata regeneration changes an
  * engine-visible type. `Bench` enforces the SAME contract at startup
  * (fail-fast named error), so a drift can't silently burn a bench round
  * either. */
class SchemaContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  for ((table, cols) <- SchemaContract.expected.toSeq.sortBy(_._1)) {
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

  test("violations() is empty on conforming testdata") {
    assert(SchemaContract.violations(spark, sfDir) === Seq.empty)
  }

  test("every table is non-empty at sf0.001") {
    for (table <- SchemaContract.expected.keys)
      assert(Tables.t(spark, sfDir, table).limit(1).count() === 1L,
        s"$table is empty")
  }
}
