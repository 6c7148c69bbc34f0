package graft
import org.apache.spark.sql.SparkSession
/** Local t1-equivalent smoke: runs SparkEntry.entry and prints its row
  * count (driver checks rows>0 on sf0.001). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // subset-key co-partitioning: joins whose inputs are both
      // Hash(household_key)-partitioned (the 32-bucket silver lineage) may
      // reuse that partitioning even when joining on (household_key,
      // commodity_desc) — the conservative default would re-shuffle both
      // sides on the full key set. Safe here: the subset key is the
      // well-distributed bucket key.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()} COLS=${df.columns.mkString(",")}")
    spark.stop()
  }
}
