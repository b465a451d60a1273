package graft

import graft.operators.ZOrder
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton16 interleaves bits (known values)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 0L))
      .toDF("a", "b")
      .select(ZOrder.morton16(col("a"), col("b")))
      .collect().map(_.getLong(0))
    // a occupies even bit positions, b odd: (3,5) = a:0b11, b:0b101
    // → even bits 1,1 + odd bits 1,0,1 → 0b100111 = 39.
    assert(got === Array(0L, 1L, 2L, 39L, 0x55555555L))
  }

  test("z-ordered layout prunes a two-dimensional box predicate that a " +
      "random layout cannot") {
    // 256×256 grid, one row per (x, y).
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_z").toString

    ZOrder.layoutByZ(grid, "x", "y", nFiles = 32)
      .write.parquet(s"$base/zorder")
    grid.repartition(32).write.parquet(s"$base/random")

    def scanRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("x") >= 32 && col("x") < 48 &&
          col("y") >= 96 && col("y") < 112)
      // collect() drives THIS DataFrame's QueryExecution, so the scan
      // metrics below belong to the plan that actually ran (count() would
      // build and execute a different one, leaving these at 0).
      val n = df.collect().length.toLong
      val rows = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
      (n, rows)
    }
    val (nZ, scannedZ) = scanRows(s"$base/zorder")
    val (nR, scannedR) = scanRows(s"$base/random")
    // identical answers…
    assert(nZ === 256L && nR === 256L) // 16×16 box
    // …but the z layout's row-group statistics exclude most of the grid,
    // while every random file intersects the box ranges.
    assert(scannedZ * 2 < scannedR,
      s"z-order scanned $scannedZ rows vs random $scannedR — no pruning win")
  }
}
