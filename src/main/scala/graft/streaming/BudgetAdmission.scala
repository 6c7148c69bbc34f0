package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-budget admission control — the ingestion-time twin
  * of [[graft.ops.TokenBudget]], part of the engine's Structured
  * Streaming extension family (the reference has no streaming surface
  * at all — SURVEY.md §1 "Not present: streams"): a live document stream (crawl output,
  * vendor feed) is admitted per source until that source's TOKEN budget
  * fills, then the tap closes. Batch TokenBudget selects in content-hash
  * order from a corpus at rest; admission control decides in ARRIVAL
  * order while the corpus is still arriving — same boundary rule (a doc
  * is admitted iff the tokens BEFORE it are under budget, so the first
  * crossing doc is included), different order contract.
  *
  * State per source is ONE long — cumulative tokens seen (admitted or
  * not: rejected docs must still advance the counter, or a long tail of
  * over-budget arrivals would re-open the tap when a tiny doc slips
  * under the line; the batch twin's running sum counts every row the
  * same way). Because the state is a prefix sum, the admitted set is
  * invariant to micro-batch slicing for a fixed arrival order
  * (BudgetAdmissionSpec pins it with TestGroupState) — and sources
  * absent from the budget map are dropped without creating state.
  *
  * Scale shape: one long per source of state, no document retention;
  * the stream shuffles once on source (the groupByKey). A hot source is
  * one task per micro-batch — the same serialization every stateful
  * per-key operator has; shard the source key upstream (as batch
  * TokenBudget does) if a single source dominates arrivals.
  */
object BudgetAdmission {

  case class Doc(doc_id: Long, source: String, n_tokens: Long)
  case class Admitted(doc_id: Long, source: String, n_tokens: Long,
      tokens_before: Long)
  case class BState(tokens_seen: Long)

  /** One state step: rows of a source in one micro-batch, processed in
    * doc_id order (the within-batch arrival tiebreak). Public for
    * slicing-invariance tests via TestGroupState.
    */
  def step(budgets: Map[String, Long])(source: String, rows: Iterator[Doc],
      state: GroupState[BState]): Iterator[Admitted] = {
    budgets.get(source) match {
      case None => Iterator.empty // unbudgeted source: no state, no output
      case Some(budget) =>
        var seen = state.getOption.map(_.tokens_seen).getOrElse(0L)
        val out = Seq.newBuilder[Admitted]
        rows.toSeq.sortBy(_.doc_id).foreach { d =>
          if (seen < budget) out += Admitted(d.doc_id, source, d.n_tokens, seen)
          seen += d.n_tokens
        }
        state.update(BState(seen))
        out.result().iterator
    }
  }

  /** Streaming form: append-mode admissions via flatMapGroupsWithState.
    * `docs` needs (doc_id, source, n_tokens) columns (extra columns are
    * dropped; re-join admitted ids downstream for payloads — the
    * admission decision should not carry document text through state).
    */
  def admitStream(docs: DataFrame, budgets: Map[String, Long]):
      Dataset[Admitted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        col("n_tokens").cast("long")).as[Doc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step(budgets))
  }
}
