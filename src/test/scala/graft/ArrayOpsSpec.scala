package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** The native DotProduct expression must agree bit-for-bit with the
  * interpreted HOF fold (same summation order) and survive codegen.
  */
class ArrayOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot_native == zip_with+aggregate fold, bitwise") {
    ArrayOps.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = df.select(
      (ArrayOps.dot_native(col("embedding"), col("embedding")) - hof).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0)
  }

  test("dot_native on double arrays and known values") {
    ArrayOps.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(ArrayOps.dot_native(col("a"), col("b"))).head().getDouble(0) == 32.0)
  }

  test("null array yields null") {
    ArrayOps.register(spark)
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(ArrayOps.dot_native(col("a"), col("b"))).head().isNullAt(0))
  }
}
