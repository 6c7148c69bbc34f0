package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Bronze CSV ingest (SURVEY.md S1 + F1, `01_Data_Prep.py:56-82`): read
  * with header + schema inference, then convert every integer column whose
  * name ends in `day` from a 1-based day-number to a real DATE anchored at
  * an epoch (`date_add(anchor, c - 1)`, `01:66-72` — the reference anchors
  * Dunnhumby's day 1..711 at 2018-01-01).
  *
  * Scale note: inference costs one extra full pass over the file
  * (exactly as in the reference); production tables should pin explicit
  * StructTypes and skip inference — `readCsv` accepts an optional schema
  * for that path.
  */
object CsvIngest {

  val defaultAnchor = "2018-01-01"

  def readCsv(spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
  }

  /** int day-number → DATE for every `*day` column (DayCodec). */
  def convertDayColumns(df: DataFrame, anchor: String = defaultAnchor): DataFrame = {
    val dayCols = df.schema.fields.collect {
      case f if f.name.toLowerCase.endsWith("day") &&
        (f.dataType == IntegerType || f.dataType == LongType) => f.name
    }
    dayCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, date_add(lit(anchor).cast("date"), col(c).cast("int") - 1))
    }
  }

  def ingest(spark: SparkSession, path: String): DataFrame =
    convertDayColumns(readCsv(spark, path))

  /** The reference's eight bronze tables (`01_Data_Prep.py:93-100`):
    * managed table name → source CSV file name.
    */
  val bronzeTables: Seq[(String, String)] = Seq(
    "transactions" -> "transaction_data.csv",
    "products" -> "product.csv",
    "households" -> "hh_demographic.csv",
    "coupons" -> "coupon.csv",
    "campaigns" -> "campaign_desc.csv",
    "coupon_redemptions" -> "coupon_redempt.csv",
    "campaigns_households" -> "campaign_table.csv",
    "causal_data" -> "causal_data.csv")

  /** Full bronze load (`create_table` parity, `01:51-100`): every table
    * read with header + inference and the `*day` codec applied — which
    * converts `transactions.day`, `coupon_redemptions.day` and
    * `campaigns.start_day`/`end_day` (`01:66-72`) and leaves non-day
    * integers (week_no, ids) untouched.
    */
  def ingestBronze(spark: SparkSession, dir: String): Map[String, DataFrame] =
    bronzeTables.map { case (t, f) => t -> ingest(spark, s"$dir/$f") }.toMap
}
