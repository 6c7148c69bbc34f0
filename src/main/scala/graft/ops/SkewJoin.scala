package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted replicated equi-join — the join-side twin of [[SkewAgg]]
  * (SURVEY.md §4 "Shuffle/spill": salting for skewed keys).
  *
  * A plain shuffle join sends every probe row of a hot key to ONE
  * reducer; AQE's skew-join splitter rebalances only when the skew is
  * visible in map-output sizes AND the join is a sort-merge join — a
  * pre-partitioned (bucketed) layout, a hinted shuffle-hash join, or a
  * key whose heat emerges only after filtering all escape it. This
  * operator makes the rebalance deliberate: probe rows get a
  * content-hash salt in [0, salt); the build side is replicated salt×
  * (explode over a literal sequence — build rows each cross the wire
  * `salt` times, which is the explicit price of splitting the hot key's
  * probe stream `salt` ways). The join key becomes (key..., salt), so
  * each hot key's rows spread over `salt` reducers. Inner equi-join
  * semantics are untouched: every (probe, build) key match meets exactly
  * one replica — the one carrying the probe's salt — so the result
  * multiset is row-identical to the plain join (the `skew_salted_join`
  * oracle hash-proves it).
  *
  * Salt comes from the probe row's CONTENT (xxhash64 over its map-free
  * columns, [[SkewAgg]]'s policy), not from a partition-dependent id:
  * task retries re-derive the same salt, keeping lineage deterministic.
  * Identical duplicate probe rows share a salt; the join stays correct,
  * only their rebalance degrades (same caveat as SkewAgg).
  */
object SkewJoin {

  /** Inner equi-join of `probe` ⋈ `build` on `keys`, with the probe side
    * salted `salt` ways and the build side replicated to match. Output
    * columns: join keys, then the remaining probe columns, then the
    * remaining build columns (Spark's usingColumns layout).
    */
  def saltedInner(probe: DataFrame, build: DataFrame, keys: Seq[String],
      salt: Int = 8): DataFrame = {
    require(salt >= 1, s"SkewJoin.saltedInner: salt ($salt) must be >= 1")
    require(keys.nonEmpty, "SkewJoin.saltedInner: at least one join key")
    def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
    val hashable = probe.schema.fields.collect {
      case f if !containsMap(f.dataType) => col(f.name)
    }.toSeq
    val saltCol =
      if (hashable.isEmpty) lit(0) // nothing map-free to hash — no rebalance
      else pmod(xxhash64(hashable: _*), lit(salt)).cast("int")
    val salted = probe.withColumn("__salt", saltCol)
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
