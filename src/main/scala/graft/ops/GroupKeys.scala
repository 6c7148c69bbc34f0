package graft.ops

import org.apache.spark.sql.DataFrame

/** The module's group-key join convention in one place: group keys match
  * null-safely (`<=>` / IS NOT DISTINCT FROM — a null group is a group,
  * not a row to silently drop), mirroring the quality-gate oracles.
  */
private[graft] object GroupKeys {

  /** Null-safe group-key join with the RIGHT side's keys renamed to fresh
    * attributes first, then dropped. When both frames derive from the
    * same lineage (stats joined back onto their own source), `left(c)`
    * and `right(c)` can resolve to the SAME attribute — Spark warns
    * "trivially true equals predicate" and silently self-disambiguates;
    * the rename makes the predicate unambiguous by construction, so that
    * warning can never mask a real cross-join regression.
    */
  def joinOn(left: DataFrame, right: DataFrame, cols: Seq[String],
      joinType: String = "inner"): DataFrame = {
    val renamed = right.select(
      cols.map(c => right(c).as(s"__gk_$c")) ++
        right.columns.filterNot(cols.contains).map(right(_)): _*)
    val cond = cols.map(c => left(c) <=> renamed(s"__gk_$c")).reduce(_ && _)
    left.join(renamed, cond, joinType).drop(cols.map(c => s"__gk_$c"): _*)
  }
}
