package graft

/** Shared plan pin for the RangePrefix decomposition. Since round 7 the
  * partitioned frame is materialized (localCheckpoint) BEFORE its two
  * consumers branch (RangePrefix.pinnedRangePartition scaladoc), so the
  * range exchange itself sits above the checkpoint and is not visible in
  * consumer plans — the observable distributed-prefix shape is the
  * __pid-PARTITIONED local window over the checkpoint scan (vs the naive
  * single-task global window, which would have an empty partition spec
  * and no __pid anywhere).
  */
object PlanPins {
  def assertRangePrefixed(plan: String, what: String): Unit = {
    assert(plan.contains("], [__pid#"),
      s"$what must run its cumulative pass as a __pid-partitioned window " +
        s"(the distributed prefix shape):\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"$what must consume the pinned (checkpointed) range partitioning:\n$plan")
  }
}
