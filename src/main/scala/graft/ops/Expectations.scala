package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/Great-Expectations
  * staple [[Profile]] stops short of: each check is a named aggregate
  * observation with an optional inclusive [lo, hi] acceptance band, and the
  * report is one row per check with the observed value and a pass verdict.
  * A pipeline gates a new partition on `report(...).filter(!pass)` being
  * empty before publishing it.
  *
  * Scale shape: like [[Profile]], ALL observations evaluate in ONE
  * aggregation pass over the table (map-side-combinable partials, one
  * summary row), and the long form is a `stack` of that single row —
  * driver-sized output regardless of table size. Keep at most one
  * DISTINCT-based observation per report (each one Expands the input a
  * further time); at warehouse scale prefer `approx_count_distinct` for
  * uniqueness bands, which stays algebraic.
  */
object Expectations {

  /** A named check: `observed` is an aggregate expression (cast to DOUBLE
    * in the report); the check passes when the observed value is non-null
    * and inside the inclusive `lo`/`hi` bounds (absent bound = unbounded).
    */
  final case class Check(
      name: String,
      observed: Column,
      lo: Option[Double] = None,
      hi: Option[Double] = None)

  /** Common checks, Deequ-vocabulary. */
  def size(lo: Double): Check =
    Check("size", count(lit(1)), Some(lo), None)
  def completeness(c: String, lo: Double): Check =
    Check(s"completeness($c)",
      count(col(c)).cast("double") / count(lit(1)).cast("double"),
      Some(lo), Some(1.0))
  def uniqueness(cols: Seq[String], lo: Double): Check =
    Check(s"uniqueness(${cols.mkString(",")})",
      countDistinct(col(cols.head), cols.tail.map(col): _*).cast("double") /
        count(lit(1)).cast("double"),
      Some(lo), Some(1.0))
  def minOf(c: String, lo: Double): Check =
    Check(s"min($c)", min(col(c)).cast("double"), Some(lo), None)
  def maxOf(c: String, hi: Double): Check =
    Check(s"max($c)", max(col(c)).cast("double"), None, Some(hi))

  /** One row per check: (check, observed, lo, hi, pass). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Expectations.report: no checks")
    // names are embedded in a stack() expression (same constraint as
    // Profile.table): quotes/backticks/backslashes would splice into the
    // parsed SQL — fail loud instead
    checks.foreach { c =>
      require(!c.name.exists(ch => ch == '`' || ch == '\'' || ch == '\\'),
        s"Expectations: check name ${c.name} contains a quote/backtick/backslash")
    }
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.observed.cast("double").as(s"__c$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    def dlit(v: Option[Double]): String =
      v.map(d => s"CAST($d AS DOUBLE)").getOrElse("CAST(NULL AS DOUBLE)")
    val stackArgs = checks.zipWithIndex.map { case (c, i) =>
      s"'${c.name}', `__c$i`, ${dlit(c.lo)}, ${dlit(c.hi)}"
    }.mkString(", ")
    one.select(expr(
        s"stack(${checks.length}, $stackArgs) AS (check_name, observed, lo, hi)"))
      .withColumn("pass",
        col("observed").isNotNull &&
          (col("lo").isNull || col("observed") >= col("lo")) &&
          (col("hi").isNull || col("observed") <= col("hi")))
  }
}
