package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter pruned semi join: filter a huge fact table down to the
  * keys of a (much smaller but not tiny) dimension WITHOUT shuffling the
  * fact's non-matching rows — the "runtime filter" of warehouse engines,
  * surfaced as an explicit operator. The reference's only key-membership
  * filter is a plain semi join against a collected control table
  * (SURVEY.md J2, `04c:70-75`), which stops working once the key set
  * outgrows a driver collect; at 100 TB the pattern below is how a
  * selective dim prunes a fact scan.
  *
  * Mechanics: one partial-aggregable pass over the key side builds a
  * Bloom sketch (Spark's own `BloomFilterAggregate` over `xxhash64(key)`
  * — the same machinery Catalyst's InjectRuntimeFilter uses, here made
  * deterministic and explicit); the sketch (a few hundred KB for millions
  * of keys) is baked into the fact-side scan as a `might_contain` filter
  * evaluated BEFORE the join's exchange, so false keys never shuffle. A
  * final exact left-semi join removes Bloom false positives — the result
  * is therefore EXACTLY the semi join (the oracle is the plain semi
  * join), the Bloom pass is pure shuffle-volume engineering.
  *
  * Scale shape: fact side scans once, shuffles only rows that pass the
  * sketch (expected survivors = matches + fpp·non-matches); key side is
  * read twice (sketch + join) but both passes are map-side-combinable.
  * The sketch travels to the driver once — it is sketch-sized (bounded by
  * `numBits`), independent of row count, the same footprint class as a
  * broadcast hash table but usable where the key SET fits in a sketch
  * while the key ROWS do not.
  */
object BloomPrune {

  private val aggName = "graft_bloom_agg"
  private val mightName = "graft_bloom_might_contain"

  /** Register the sketch aggregate + membership probe in the session
    * function registry (idempotent). `graft_bloom_agg(hash, items)`
    * builds a sketch of the long hashes sized for `items` distinct keys;
    * `graft_bloom_might_contain(sketch, hash)` probes it.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      aggName, { exprs =>
        require(exprs.length == 2, s"$aggName(hash, estimatedItems)")
        val items = exprs(1) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"$aggName: estimatedItems must be an integer literal, got $other")
        }
        new BloomFilterAggregate(exprs(0), items)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      mightName, { exprs =>
        require(exprs.length == 2, s"$mightName(sketch, hash)")
        BloomFilterMightContain(exprs(0), exprs(1))
      }, "built-in")
  }

  /** Build the Bloom sketch of `keys.select(keyCol)` as a binary blob.
    * One aggregate job (partial sketches merged); null keys are skipped
    * by the aggregate — the semi join can never match them anyway.
    */
  def sketch(keys: DataFrame, keyCol: String, expectedItems: Long): Array[Byte] = {
    register(keys.sparkSession)
    val row = keys
      .select(call_function(aggName,
        xxhash64(col(keyCol)), lit(expectedItems)).as("bf"))
      .head()
    // empty input → null sketch; surface as an impossible-to-match empty
    // filter is wrong (might_contain(null, x) is null → drops all rows,
    // which IS the exact semi-join result for an empty key side) — but
    // keep the contract explicit for callers.
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** `large` left-semi-joined to `small` on `largeKey = smallKey`, with a
    * Bloom pre-filter on the large side so non-candidate rows are dropped
    * at the scan, before the join exchange. Result is EXACT (false
    * positives removed by the final semi join). `expectedItems` sizes the
    * sketch (default 1M ⇒ ~0.8 MB, fpp ~3%).
    */
  def prunedSemiJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bf = sketch(small, smallKey, expectedItems)
    val pruned =
      if (bf.isEmpty) large.filter(lit(false))
      else large.filter(mightContain(lit(bf), xxhash64(col(largeKey))))
    pruned.join(small.select(col(smallKey)).distinct(),
      col(largeKey) === col(smallKey), "left_semi")
  }

  /** Membership probe column (requires [[register]] — called by all
    * entry points here). `sketchCol` must be foldable (a literal sketch).
    */
  def mightContain(sketchCol: Column, hashCol: Column): Column =
    call_function(mightName, sketchCol, hashCol)
}
