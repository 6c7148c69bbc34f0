package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passage-level exact duplication analysis — the "remove the navbar /
  * cookie banner / license header" pass of a training-data pipeline
  * (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
  * Better", arXiv:2107.06499: exact substring duplication is removed at
  * passage granularity, not document granularity). Document-level dedup
  * ([[graft.dedup.Dedup]]) misses text that repeats INSIDE otherwise
  * distinct documents; this operator finds it.
  *
  * A passage is a run of `p` consecutive words (non-overlapping chunks —
  * the document partitions into them, so removal is well-defined and the
  * corpus passage count is |words|/p, not |words| shingles). A passage is
  * boilerplate when it occurs in ≥ `minDocs` distinct documents.
  *
  * Scale shape (100 TB): passage extraction is per-row column algebra
  * (no shuffle); the global frequency table shuffles on md5(passage) — a
  * 16-byte fixed-width key, count partially aggregated map-side; the
  * flag-back join re-shuffles the passages on the same key. The
  * boilerplate SET itself (passages above threshold) is tiny relative to
  * the corpus — callers cleaning a 100 TB corpus should persist it once
  * and broadcast-join it per shard, which is exactly what [[clean]] does
  * with its `hint("broadcast")` when the caller passes a precomputed set.
  */
object Boilerplate {

  private def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** One row per (doc_id, passage_idx, passage): the document partitioned
    * into non-overlapping `p`-word chunks (last chunk may be shorter).
    * Empty/whitespace-only documents yield no rows.
    */
  def passages(docs: DataFrame, p: Int): DataFrame = {
    require(p >= 1, s"passage length must be >= 1, got $p")
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), (ceil(size(col("w")) / lit(p.toDouble)) - 1).cast("int")),
        i => array_join(slice(col("w"), i * p + 1, lit(p)), " "))))
      .toDF("doc_id", "passage_idx", "passage")
  }

  /** The corpus boilerplate set: passages occurring in ≥ `minDocs`
    * distinct documents, with their document frequency.
    */
  def boilerplateSet(docs: DataFrame, p: Int, minDocs: Int): DataFrame =
    passages(docs, p)
      .groupBy(md5(col("passage")).as("pk"))
      .agg(first(col("passage")).as("passage"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Per-document boilerplate exposure: passage counts and the share of
    * passages that are corpus boilerplate. The signal feeds quality
    * gating (a doc that is mostly boilerplate is droppable) and ranks
    * what [[clean]] would strip.
    */
  def stats(docs: DataFrame, p: Int = 3, minDocs: Int = 2): DataFrame = {
    val pass = passages(docs, p).select(col("doc_id"), md5(col("passage")).as("pk"))
    val freq = pass.groupBy("pk").agg(countDistinct(col("doc_id")).as("nd"))
    pass.join(freq, "pk")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        count(when(col("nd") >= minDocs, lit(1))).as("n_boilerplate"))
      .select(col("doc_id"), col("n_passages"), col("n_boilerplate"),
        round(col("n_boilerplate").cast("double") / col("n_passages").cast("double"), 9)
          .as("boilerplate_ratio"))
  }

  /** Rewrite each document with its boilerplate passages removed (word
    * order of the survivors preserved). `boilerplate` defaults to the
    * corpus-derived [[boilerplateSet]]; pass a precomputed/persisted set
    * when cleaning shards of a large corpus so the frequency pass runs
    * once, not per shard. The set side is broadcast — it is the small
    * side by construction.
    */
  def clean(docs: DataFrame, p: Int = 3, minDocs: Int = 2,
      boilerplate: Option[DataFrame] = None): DataFrame = {
    val bp = boilerplate.getOrElse(boilerplateSet(docs, p, minDocs))
      .select(col("pk"), lit(true).as("is_bp"))
    val kept = passages(docs, p)
      .withColumn("pk", md5(col("passage")))
      .join(broadcast(bp), Seq("pk"), "left_outer")
      .filter(col("is_bp").isNull)
    // Reassemble in passage order without a window sort: collect the
    // surviving (idx, passage) structs per doc and sort the small
    // per-doc array locally (array_sort orders by the leading idx field).
    val rebuilt = kept.groupBy("doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("passage_idx"), col("passage")))),
          s => s.getField("passage")),
        " ").as("text_clean"))
    docs.select("doc_id").join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
