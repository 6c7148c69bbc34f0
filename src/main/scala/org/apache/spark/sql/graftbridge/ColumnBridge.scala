package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}

/** Minimal classic-API bridge (Spark 4 split `Column` from Catalyst: a
  * Column wraps a lazy `ColumnNode`, so sort metadata must be read at the
  * NODE level — converting to a Catalyst expression yields an opaque
  * `ColumnNodeExpression` wrapper that defeats pattern matching). Lives
  * under `org.apache.spark.sql` because `Column.node` / `Column.apply`
  * are `private[sql]`. Used by [[graft.ops.RangePrefix]] to decompose
  * caller-supplied sort `Column`s (`col("s").desc` etc.) into
  * (child, descending?, nullsLast?) so the deterministic-bucketing path
  * can rebuild direction-aware comparisons against literal boundaries.
  */
object ColumnBridge {

  /** A sort column decomposed: the bare child column plus direction and
    * null-ordering flags. A non-SortOrder column decomposes to the Spark
    * default ascending-nulls-first.
    */
  final case class SortKey(child: Column, descending: Boolean,
      nullsLast: Boolean) {
    /** The same ordering re-assembled (for repartitionByRange/orderBy). */
    def asOrder: Column = (descending, nullsLast) match {
      case (false, false) => child.asc_nulls_first
      case (false, true)  => child.asc_nulls_last
      case (true, false)  => child.desc_nulls_first
      case (true, true)   => child.desc_nulls_last
    }
    /** The REVERSED ordering (direction and null position both flip), for
      * "last row per partition in sort order" via row_number()=1.
      */
    def flipped: Column = copy(descending = !descending,
      nullsLast = !nullsLast).asOrder
  }

  def sortKey(c: Column): SortKey = c.node match {
    case so: NodeSortOrder =>
      SortKey(Column(so.child),
        so.sortDirection == NodeSortOrder.Descending,
        so.nullOrdering == NodeSortOrder.NullsLast)
    case _ => SortKey(c, descending = false, nullsLast = false)
  }
}
