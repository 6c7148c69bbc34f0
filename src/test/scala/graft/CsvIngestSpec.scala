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

  test("bronze 8-table load: day codec on the right columns, others untouched") {
    val dir = Files.createTempDirectory("bronze")
    def w(name: String, content: String) =
      Files.writeString(dir.resolve(name), content)
    // Dunnhumby-shaped headers (one or two rows each is enough to pin
    // schema + codec behavior)
    w("transaction_data.csv",
      "household_key,basket_id,day,product_id,quantity,sales_value,store_id,retail_disc,trans_time,week_no,coupon_disc,coupon_match_disc\n" +
        "1,100,1,9,2,5.5,31,-0.5,1631,1,0.0,0.0\n" +
        "2,101,711,9,1,2.0,31,0.0,900,102,-0.3,-0.1\n")
    w("product.csv",
      "product_id,manufacturer,department,brand,commodity_desc,sub_commodity_desc,curr_size_of_product\n" +
        "9,5,GROCERY,Private,SOUP,CANNED SOUP,12 OZ\n")
    w("hh_demographic.csv",
      "age_desc,marital_status_code,income_desc,homeowner_desc,hh_comp_desc,household_size_desc,kid_category_desc,household_key\n" +
        "45-54,A,50-74K,Homeowner,2 Adults No Kids,2,None/Unknown,1\n")
    w("coupon.csv", "coupon_upc,product_id,campaign\n10000085364,9,8\n")
    w("campaign_desc.csv",
      "description,campaign,start_day,end_day\nTypeB,8,224,264\n")
    w("coupon_redempt.csv",
      "household_key,day,coupon_upc,campaign\n1,421,10000085364,8\n")
    w("campaign_table.csv",
      "description,household_key,campaign\nTypeB,1,8\n")
    w("causal_data.csv",
      "product_id,store_id,week_no,display,mailer\n9,31,10,6,A\n")

    val bronze = CsvIngest.ingestBronze(spark, dir.toString)
    assert(bronze.keySet == CsvIngest.bronzeTables.map(_._1).toSet)
    import org.apache.spark.sql.types.{DateType, IntegerType}

    // campaigns.start_day/end_day converted (01:66-72): 224 → 2018-08-12
    val camp = bronze("campaigns").head()
    assert(bronze("campaigns").schema("start_day").dataType == DateType)
    assert(camp.getAs[java.sql.Date]("start_day").toString == "2018-08-12")
    assert(camp.getAs[java.sql.Date]("end_day").toString == "2018-09-21")

    // transactions.day + coupon_redemptions.day converted
    assert(bronze("transactions").schema("day").dataType == DateType)
    assert(bronze("coupon_redemptions").head()
      .getAs[java.sql.Date]("day").toString == "2019-02-25") // day 421
    // non-day integers untouched
    assert(bronze("transactions").schema("week_no").dataType == IntegerType)
    assert(bronze("causal_data").schema("week_no").dataType == IntegerType)
    // no day-suffixed columns → schema passes through inference unchanged
    assert(bronze("products").schema.fields.forall(_.dataType != DateType))
    assert(bronze("transactions").count() == 2)
    assert(CsvIngest.bronzeTables.size == 8)
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
