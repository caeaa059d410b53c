package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("mortonInterleave places a-bits at even, b-bits at odd positions") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (5L, 3L))
      .toDF("a", "b")
      .select(Layout.mortonInterleave(col("a"), col("b"), 4).as("z"))
      .as[Long].collect()
    // a=1 -> bit0; b=1 -> bit1; a=3 -> bits 0,2; b=3 -> bits 1,3
    // a=5 (101), b=3 (011) -> a bits at 0,4; b bits at 1,3 -> 1+2+8+16 = 27
    assert(out.toSeq === Seq(0L, 1L, 2L, 5L, 10L, 27L))
  }

  test("z-clustered files keep small bounding boxes in BOTH dimensions") {
    // 32x32 grid; z-layout into 16 files vs linear sort by x alone
    val dir = Files.createTempDirectory("graft-z").toString
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    Layout.zorderWrite(grid, s"$dir/z", "x", "y", bits = 5, numFiles = 16)
    grid.orderBy(col("x"), col("y")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/linear")

    def fileSpreads(path: String): Seq[(Long, Long)] =
      new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y"))).head()
          (r.getLong(0), r.getLong(1))
        }

    val zSpreads = fileSpreads(s"$dir/z")
    assert(zSpreads.size > 4, "range partitioning should emit multiple files")
    // each z-file's bounding box must cover at most half the domain in
    // EITHER dimension — the property that lets min/max stats prune
    // files for filters on x OR y
    zSpreads.foreach { case (sx, sy) =>
      assert(sx <= 16 && sy <= 16, s"bounding box too wide: x-spread $sx, y-spread $sy")
    }
    // the linear layout covers the full y-domain in every file: a
    // y-filter can prune nothing
    val (_, linY) = fileSpreads(s"$dir/linear").head
    assert(linY === 31L)
  }

  test("mortonInterleave rejects out-of-range bit widths") {
    val df = Seq((1L, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException](
      df.select(Layout.mortonInterleave(col("a"), col("b"), 0)))
    intercept[IllegalArgumentException](
      df.select(Layout.mortonInterleave(col("a"), col("b"), 32)))
  }

  test("zorderWrite rejects a pre-existing __z column instead of clobbering it") {
    val df = Seq((1L, 2L, 3L)).toDF("x", "y", "__z")
    intercept[IllegalArgumentException](
      Layout.zorderWrite(df, "/tmp/never-written", "x", "y", 4, 2))
  }
}
