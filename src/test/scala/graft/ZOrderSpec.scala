package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference interleave on the driver. */
  private def morton(xs: Seq[Long], bits: Int): Long = {
    var out = 0L
    for (i <- 0 until bits; j <- xs.indices)
      out |= ((xs(j) >> i) & 1L) << (i * xs.size + j)
    out
  }

  test("key matches the driver-side interleave on random grids") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.key(Seq(col("x"), col("y")), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == morton(Seq(x, y), 10), s"($x, $y)")
    }
  }

  test("bit-exact round trip: 2-dim key is invertible") {
    // every (x, y) in a small full grid maps to a distinct z — the key
    // is a bijection onto [0, 4^bits)
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val zs = grid.toDF("x", "y")
      .select(ZOrder.key(Seq(col("x"), col("y")), 5).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == 1024 && zs.min == 0L && zs.max == 1023L)
  }

  test("3-dim key matches the driver-side interleave") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = rows.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.key(Seq(col("x"), col("y"), col("z")), 8).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    rows.foreach { case (x, y, z) =>
      assert(got((x, y, z)) == morton(Seq(x, y, z), 8), s"($x, $y, $z)")
    }
  }

  test("out-of-range and null values raise") {
    intercept[Exception] {
      Seq(1024L).toDF("x")
        .select(ZOrder.key(Seq(col("x")), 10)).collect()
    }
    intercept[Exception] {
      Seq(Option.empty[Long]).toDF("x")
        .select(ZOrder.key(Seq(col("x")), 10)).collect()
    }
  }

  test("z-order envelopes beat a single-column sort on the trailing dim") {
    // uniform 64x64 grid; 16 buckets. Sorting by x alone gives each
    // bucket the FULL y range (envelope 63); z-order gives sqrt-ish
    // envelopes on both dims.
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = grid.toDF("x", "y")
    val z = ZOrder.bucketStats(df, Seq("x", "y"), bits = 6, bucketBits = 4)
      .agg(avg(col("max_y") - col("min_y"))).as[Double].head()
    // single-column layout: bucket = top 4 bits of x → y spans 0..63
    val linear = df.withColumn("b", shiftright(col("x"), 2))
      .groupBy("b").agg((max("y") - min("y")).as("span"))
      .agg(avg("span")).as[Double].head()
    assert(linear == 63.0)
    assert(z <= 32.0, s"z-order avg y-envelope $z should be tight")
  }

  test("write produces files with tight envelopes on BOTH dims") {
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    // shuffled input: clustering must come from the writer, not the input
    val df = new scala.util.Random(11).shuffle(grid).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.write(df, Seq("x", "y"), bits = 6, dir, numFiles = 16)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .agg(count(lit(1)), avg("sx"), avg("sy"))
      .head()
    val (nFiles, avgSx, avgSy) =
      (perFile.getLong(0), perFile.getDouble(1), perFile.getDouble(2))
    assert(nFiles == 16L)
    // 16 z-range files over a 64x64 grid: ideal envelopes are 15/31 per
    // dim (4x4 or 2x8 z-cells); range-boundary sampling can split cells,
    // so allow slack — but both dims must be FAR below the 63 a
    // single-column sort leaves on its trailing dim
    assert(avgSx <= 40.0 && avgSy <= 40.0, s"envelopes $avgSx x $avgSy")
    assert(avgSx + avgSy <= 70.0, s"combined envelope $avgSx + $avgSy")
  }

  test("bucketStats covers all rows exactly once") {
    val df = (0L until 1000L).map(i => (i % 97, (i * 31) % 89)).toDF("a", "b")
    val stats = ZOrder.bucketStats(df, Seq("a", "b"), bits = 7, bucketBits = 5)
    assert(stats.agg(sum("n_rows")).as[Long].head() == 1000L)
  }
}
