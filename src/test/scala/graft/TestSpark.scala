package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spun up once per JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // subset-key co-partitioning: joins whose inputs are both
      // Hash(household_key)-partitioned (the 32-bucket silver lineage) may
      // reuse that partitioning even when joining on (household_key,
      // commodity_desc) — the conservative default would re-shuffle both
      // sides on the full key set. Safe here: the subset key is the
      // well-distributed bucket key.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
