package graft.core

import org.apache.spark.sql.SparkSession

/** The ONE place the engine's session configuration lives — every harness
  * main (Bench/Verify/Smoke) and the shared test session build from this,
  * so their plans cannot silently drift (a conf added to three of four
  * builders would make bench and verify measure different physical plans).
  *
  * Confs:
  *  - UTC session timezone (oracle date/timestamp determinism),
  *  - AQE on (runtime re-planning, skew handling),
  *  - subset-key co-partitioning: joins whose inputs are both
  *    Hash(household_key)-partitioned (the 32-bucket silver lineage) may
  *    reuse that partitioning even when joining on (household_key,
  *    commodity_desc) — the conservative default would re-shuffle both
  *    sides on the full key set. Safe here: the subset key is the
  *    well-distributed bucket key.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // events.parquet carries TIMESTAMP_NANOS, which Spark's parquet
      // reader rejects outright unless surfaced as raw BIGINT nanos;
      // EventOps owns the ns→timestamp conversion. Must be set before
      // anything (incl. Catalog.registerAll) reads the events footer.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
