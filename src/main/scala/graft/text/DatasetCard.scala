package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset "datasheet" report — the one-table summary a corpus release
  * ships with (Gebru et al., "Datasheets for Datasets", CACM 2021):
  * global corpus shape, per-source and per-language composition,
  * duplication and quality-gate rates, and tokenizer fertility
  * (BPE-proxy tokens per whitespace token — the cost multiplier a
  * tokenizer change implies).
  *
  * Long form `(section, metric, value)` so one artifact carries
  * heterogeneous facts; every value is a count or an exact-integer ratio
  * rounded to 9 dp.
  *
  * Scale shape: ONE pass over the corpus computes every per-row
  * ingredient (token counts, content hash, quality predicate — a single
  * codegen'd projection), then three hash aggregates (global / by source
  * / by lang) over that pass's output, unioned. The by-source and
  * by-lang aggregates reuse the same base projection; nothing scans the
  * corpus twice. Distinct-content counts are exact (md5 grouping rides
  * the same aggregate via count(DISTINCT hash) — at true corpus scale
  * swap for the engine's HLL sketch path, documented trade-off).
  */
object DatasetCard {

  def build(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nTokens = TextAnalysis.tokensWs(t)
    val nChars = length(t).cast("long")
    val nStop = TextAnalysis.wordHits(t, TextAnalysis.stopwords)
    val avgLen = when(nTokens > 0,
      nChars.cast("double") / nTokens.cast("double")).otherwise(0.0)
    val stopRatio = when(nTokens > 0,
      nStop.cast("double") / nTokens.cast("double")).otherwise(0.0)
    val base = docs.select(
      col("source"), col("lang"),
      nTokens.as("n_tokens"),
      TextAnalysis.tokensBpe(t).as("n_tokens_bpe"),
      md5(t).as("h"),
      (nTokens >= 20 && avgLen <= 12.0 && stopRatio >= 0.0)
        .cast("int").as("q_pass"))

    def ratio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      round(num.cast("double") / den.cast("double"), 9)

    // array() demands identical struct field NAMES across elements —
    // every card row goes through this one constructor
    def cardRow(section: org.apache.spark.sql.Column, metric: String,
        value: org.apache.spark.sql.Column) =
      struct(section.as("section"), lit(metric).as("metric"),
        value.cast("double").as("value"))

    val bySourceCard = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).cast("long").as("tokens"),
      countDistinct(col("h")).as("n_distinct"),
      sum(col("q_pass")).cast("long").as("n_quality"))
    val byLangCard = base.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).cast("long").as("tokens"),
      sum(col("n_tokens_bpe")).cast("long").as("bpe"))

    // three distincts in ONE agg would trigger the multi-distinct Expand
    // (row blowup × #distincts — the shape FeatureBuilder splits too);
    // instead: one plain agg + one single-distinct agg, and the source/
    // lang cardinalities read off the grouped frames below for free
    val globalPlain = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).cast("long").as("total_tokens"),
      sum(col("n_tokens_bpe")).cast("long").as("total_bpe"),
      sum(col("q_pass")).cast("long").as("n_quality"))
    val globalDistinct = base.agg(countDistinct(col("h")).as("n_distinct"))
    val global = globalPlain.crossJoin(globalDistinct)
      .crossJoin(bySourceCard.agg(count(lit(1)).as("n_sources")))
      .crossJoin(byLangCard.agg(count(lit(1)).as("n_langs")))
    val globalRows = global.select(explode(array(
      cardRow(lit("global"), "n_docs", col("n_docs")),
      cardRow(lit("global"), "n_sources", col("n_sources")),
      cardRow(lit("global"), "n_langs", col("n_langs")),
      cardRow(lit("global"), "total_tokens", col("total_tokens")),
      cardRow(lit("global"), "dup_rate",
        round(lit(1.0) - col("n_distinct").cast("double")
          / col("n_docs").cast("double"), 9)),
      cardRow(lit("global"), "quality_pass_rate",
        ratio(col("n_quality"), col("n_docs"))),
      cardRow(lit("global"), "bpe_fertility",
        ratio(col("total_bpe"), col("total_tokens"))))).as("r"))
      .select(col("r.*"))

    val srcSec = concat(lit("source:"), col("source"))
    val sourceRows = bySourceCard.select(explode(array(
      cardRow(srcSec, "n_docs", col("n_docs")),
      cardRow(srcSec, "tokens", col("tokens")),
      cardRow(srcSec, "dup_rate",
        round(lit(1.0) - col("n_distinct").cast("double")
          / col("n_docs").cast("double"), 9)),
      cardRow(srcSec, "quality_pass_rate",
        ratio(col("n_quality"), col("n_docs"))))).as("r"))
      .select(col("r.*"))

    val langSec = concat(lit("lang:"), col("lang"))
    val langRows = byLangCard.select(explode(array(
      cardRow(langSec, "n_docs", col("n_docs")),
      cardRow(langSec, "tokens", col("tokens")),
      cardRow(langSec, "bpe_fertility",
        ratio(col("bpe"), col("tokens"))))).as("r"))
      .select(col("r.*"))

    globalRows.unionByName(sourceRows).unionByName(langRows)
  }
}
