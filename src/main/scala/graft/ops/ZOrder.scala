package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * primitive: interleave the bits of several dimension columns so that
  * rows close in EVERY dimension land close in ONE sort order. Writing a
  * 100 TB fact sorted by the z-key (`repartitionByRange(zkey) +
  * sortWithinPartitions(zkey)`) gives every file a tight min/max envelope
  * in ALL the interleaved dimensions simultaneously, so per-file
  * statistics prune scans for predicates on ANY of them — where a plain
  * sort only prunes its leading column. (The reference writes its silver
  * fact unsorted, `01:121-166`; single-column layouts are SURVEY.md
  * §2.6's sorts. This is the layout operator a multi-predicate workload
  * needs at scale.)
  *
  * The key is pure per-row bit arithmetic — shift/mask/or, codegen'd, no
  * shuffle, no state — and the SAME formula renders to DuckDB SQL, so
  * z-keys (and the per-bucket envelope stats that demonstrate the
  * clustering) are oracle-verified engine-exact, not "some interleave".
  *
  * Columns must be non-negative and fit in `bits` bits (the caller maps
  * raw values into the grid first — ranks, day numbers, bucketed ids);
  * out-of-range inputs raise rather than silently fold distant rows into
  * the same cell.
  */
object ZOrder {

  /** Interleaved z-key of `cols`, each contributing its low `bits` bits.
    * Bit i of column j lands at output bit `i * cols.size + j` — column
    * 0 gets the least-significant lane. Total bits must fit a long.
    */
  def key(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "ZOrder.key: at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"ZOrder.key: $bits bits x ${cols.size} cols must fit in a long")
    val n = cols.size
    val max = (1L << bits) - 1
    val checked = cols.map { c =>
      val v = c.cast("long")
      when(v.isNull || v < 0 || v > max,
        raise_error(concat(lit(s"ZOrder.key: value out of [0, $max]: "),
          v.cast("string")))).otherwise(v)
    }
    val terms = for {
      i <- 0 until bits
      (c, j) <- checked.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(1L), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The same interleave in DuckDB SQL (for oracle rendering). */
  def keySql(colExprs: Seq[String], bits: Int): String = {
    val n = colExprs.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- colExprs.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }

  /** Per-bucket envelope statistics for a z-ordered layout: bucket =
    * the z-key's top `bucketBits` bits (a contiguous z-range ≈ one file
    * of the sorted layout), with each dimension's [min, max] inside the
    * bucket and the row count. Tight envelopes on EVERY dimension are
    * the file-skipping property z-ordering exists to buy; ZOrderSpec
    * quantifies the envelope shrink vs a single-column sort.
    */
  def bucketStats(df: DataFrame, dims: Seq[String], bits: Int,
      bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= bits * dims.size,
      s"ZOrder.bucketStats: bucketBits $bucketBits out of range")
    val z = key(dims.map(col), bits)
    val shift = bits * dims.size - bucketBits
    val statCols = dims.flatMap { d =>
      Seq(min(col(d)).cast("long").as(s"min_$d"),
        max(col(d)).cast("long").as(s"max_$d"))
    }
    df.withColumn("zbucket", shiftright(z, shift))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"), statCols: _*)
  }

  /** Write `df` as a z-ordered parquet layout: range-partition on the
    * z-key into `numFiles` contiguous z-ranges, sort each partition by
    * it, write. Every output file then covers one z-range, so its
    * parquet footer min/max are tight on EVERY interleaved dimension —
    * the file-skipping property (a predicate on any dim prunes most
    * files at planning time via partition/row-group stats).
    * ZOrderSpec audits the per-file envelopes from the written files.
    *
    * Scale shape: one range exchange (sampled boundaries) + local sort —
    * the same cost as any globally-sorted write; no extra pass for the
    * key (per-row bit arithmetic, codegen'd).
    */
  def write(df: DataFrame, dims: Seq[String], bits: Int, path: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"ZOrder.write: numFiles $numFiles must be >= 1")
    df.withColumn("__z", key(dims.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Matching per-bucket stats SQL over `table` (oracle rendering). */
  def bucketStatsSql(table: String, dims: Seq[String], bits: Int,
      bucketBits: Int): String = {
    val shift = bits * dims.size - bucketBits
    val stats = dims.map { d =>
      s"CAST(MIN($d) AS BIGINT) AS min_$d, CAST(MAX($d) AS BIGINT) AS max_$d"
    }.mkString(", ")
    s"""SELECT (${keySql(dims, bits)} >> $shift) AS zbucket,
       |  COUNT(*) AS n_rows, $stats
       |FROM $table
       |GROUP BY 1""".stripMargin
  }
}
