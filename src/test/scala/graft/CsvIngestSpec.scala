package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.CsvIngest

class CsvIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("csv inference + day-number → DATE codec on *day columns") {
    val dir = Files.createTempDirectory("csv")
    val f = dir.resolve("tx.csv")
    Files.writeString(f,
      "household_key,day,sales_value,first_day\n1,1,9.5,10\n2,711,1.25,1\n")
    val df = CsvIngest.ingest(spark, f.toString)
    val rows = df.collect().map(r => r.getAs[Int]("household_key") -> r).toMap
    assert(df.schema("day").dataType == org.apache.spark.sql.types.DateType)
    assert(df.schema("first_day").dataType == org.apache.spark.sql.types.DateType)
    assert(df.schema("sales_value").dataType == org.apache.spark.sql.types.DoubleType)
    assert(rows(1).getAs[java.sql.Date]("day").toString == "2018-01-01")
    assert(rows(2).getAs[java.sql.Date]("day").toString == "2019-12-12") // day 711
    assert(rows(1).getAs[java.sql.Date]("first_day").toString == "2018-01-10")
  }

  test("explicit schema path skips inference") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("csv2")
    val f = dir.resolve("t.csv")
    Files.writeString(f, "id,day\n7,2\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("day", IntegerType)))
    val df = CsvIngest.convertDayColumns(
      CsvIngest.readCsv(spark, f.toString, Some(schema)))
    assert(df.schema("id").dataType == LongType)
    assert(df.head().getAs[java.sql.Date]("day").toString == "2018-01-02")
  }
}
