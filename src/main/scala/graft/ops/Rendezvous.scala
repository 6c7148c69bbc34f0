package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) routing — the consistent
  * assignment rule for elastic scale-out, absent from the reference
  * (its daily jobs re-read whole tables, `03_Define_Workflow.py:96-99`;
  * pinned state needs stable placement): each key goes to the worker
  * with the highest hash(key, worker), so adding a worker moves only
  * ~1/(n+1) of the keys (and only INTO the new worker), instead of the
  * near-total reshuffle a `hash(key) % n` routing causes. The shape a
  * 100 TB pipeline needs wherever data is pinned to workers — embedding
  * index shards, stateful stream partitions, cache fleets — and wants to
  * grow the fleet without re-homing the world.
  *
  * The weight is the md5-derived 32-bit integer of "key|worker"
  * ([[HashSplit]]'s arithmetic, so the same rule renders to DuckDB and
  * the `rendezvous_routing` entry hash-proves both assignments AND the
  * minimal-movement property), argmax via `array_max` over a
  * per-row literal array of (weight, worker) structs — pure per-row
  * codegen'd column algebra: no shuffle, no join, no state.
  */
object Rendezvous {

  /** The 32-bit weight of (key, worker) — first 8 md5 hex digits. */
  def weight(key: Column, worker: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit("|" + worker))),
      1, 8), 16, 10).cast("long")

  /** The assigned worker: argmax weight, ties to the later worker name
    * (struct max is lexicographic on (weight, worker)).
    */
  def assign(key: Column, workers: Seq[String]): Column = {
    require(workers.nonEmpty, "Rendezvous.assign: at least one worker")
    array_max(array(workers.map(w =>
      struct(weight(key, w).as("h"), lit(w).as("w"))): _*)).getField("w")
  }

  /** The matching DuckDB weight expression for oracle rendering (concat
    * form — safe to embed mid-line in stripMargin oracle builders).
    */
  def weightSql(keyExpr: String, worker: String): String =
    s"CAST(('0x' || substr(md5(concat(CAST($keyExpr AS VARCHAR), '|$worker')), 1, 8)) AS BIGINT)"
}
