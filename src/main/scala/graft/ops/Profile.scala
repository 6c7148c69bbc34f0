package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the data-quality summary a pipeline runs
  * over every new table/partition before trusting it (the Deequ-style
  * staple): per column, row count, null count, and min/max, emitted in
  * long form (one row per column).
  *
  * Scale shape: ONE aggregation over the table computes every statistic
  * (count/min/max are all algebraic — map-side combinable, no shuffle of
  * data rows, just one 1-row partial per partition), and the long-form
  * pivot is a `stack` over that single row — driver-sized regardless of
  * table size. Exact distinct counts are deliberately NOT in the default
  * profile: 16 `count(DISTINCT c)` in one pass would Expand the input
  * 16×; `approxDistinct = true` appends an HLL `n_distinct` instead
  * (one pass, algebraic, ±2% — the 100 TB profile), which is
  * engine-specific and therefore excluded from the oracle entry.
  *
  * Values are typed by family so both engines render identically:
  * numerics as DOUBLE (`min_num`/`max_num`), everything else through an
  * ISO string cast (`min_str`/`max_str` — dates render `yyyy-MM-dd` in
  * both Spark and DuckDB; doubles are NOT routed through strings, where
  * scientific-notation thresholds differ).
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  def table(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    // names are embedded in a stack() expression: backticks/quotes would
    // splice into the parsed SQL, and backslashes are processed as string
    // escapes (silently renaming the output row) — fail loud instead
    cols.foreach { f =>
      require(!f.name.exists(c => c == '`' || c == '\'' || c == '\\'),
        s"Profile.table: column name ${f.name} contains a quote/backtick/backslash")
    }
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"__nn_${f.name}"),
        (if (isNumeric(f.dataType)) min(c).cast("double") else lit(null).cast("double"))
          .as(s"__mn_num_${f.name}"),
        (if (isNumeric(f.dataType)) max(c).cast("double") else lit(null).cast("double"))
          .as(s"__mx_num_${f.name}"),
        (if (isNumeric(f.dataType)) lit(null).cast("string") else min(c).cast("string"))
          .as(s"__mn_str_${f.name}"),
        (if (isNumeric(f.dataType)) lit(null).cast("string") else max(c).cast("string"))
          .as(s"__mx_str_${f.name}"))
      if (approxDistinct) base :+ approx_count_distinct(c).as(s"__nd_${f.name}")
      else base
    }.toSeq
    val one = df.agg(aggs.head, aggs.tail: _*)
    // long form: stack the single summary row into one row per column
    val stackArgs = cols.flatMap { f =>
      val perCol = Seq(s"'${f.name}'", s"`__nn_${f.name}`",
        s"`__mn_num_${f.name}`", s"`__mx_num_${f.name}`",
        s"`__mn_str_${f.name}`", s"`__mx_str_${f.name}`")
      if (approxDistinct) perCol :+ s"`__nd_${f.name}`" else perCol
    }.mkString(", ")
    val outCols = Seq("column", "n_nonnull", "min_num", "max_num",
      "min_str", "max_str") ++ (if (approxDistinct) Seq("n_distinct") else Nil)
    one.select(col("__n").as("n_rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS (${outCols.mkString(", ")})"))
      .select(
        (col("column") +: col("n_rows") +:
          (col("n_rows") - col("n_nonnull")).as("n_nulls") +:
          outCols.drop(2).map(col)): _*)
  }

  /** The matching DuckDB oracle (long form via per-column UNION ALL —
    * the oracle favors obviousness over elegance).
    */
  def oracleSql(table: String, cols: Seq[(String, Boolean)]): String =
    cols.map { case (name, numeric) =>
      val mnNum = if (numeric) s"CAST(min($name) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mxNum = if (numeric) s"CAST(max($name) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mnStr = if (numeric) "CAST(NULL AS VARCHAR)" else s"CAST(min($name) AS VARCHAR)"
      val mxStr = if (numeric) "CAST(NULL AS VARCHAR)" else s"CAST(max($name) AS VARCHAR)"
      s"""SELECT '$name' AS "column", count(*) AS n_rows,
         |  count(*) - count($name) AS n_nulls,
         |  $mnNum AS min_num, $mxNum AS max_num,
         |  $mnStr AS min_str, $mxStr AS max_str FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
