package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** The module's group-key join convention in one place: group keys match
  * null-safely (`<=>` / IS NOT DISTINCT FROM — a null group is a group,
  * not a row to silently drop), mirroring the quality-gate oracles.
  */
private[graft] object GroupKeys {

  def nullSafeCond(left: DataFrame, right: DataFrame,
      cols: Seq[String]): Column =
    cols.map(c => left(c) <=> right(c)).reduce(_ && _)
}
