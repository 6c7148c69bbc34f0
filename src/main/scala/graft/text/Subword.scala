package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed subword-vocabulary induction: the counting step of one BPE
  * merge iteration (Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units", ACL 2016). Symbols start as characters;
  * each iteration counts adjacent symbol pairs across the corpus weighted
  * by word frequency and merges the most frequent pair.
  *
  * Scale shape — the classic two-stage trick that makes corpus-scale BPE
  * tractable: the corpus collapses FIRST to the word-frequency table
  * (vocabulary-sized: a hash aggregate with map-side combine over the
  * token stream), and pair counting then explodes characters over the
  * VOCAB, not the corpus — cost `O(|vocab| · avg_word_len)` regardless of
  * corpus token count. Pair weight = (occurrences of the pair inside the
  * word) × (word frequency); overlapping occurrences count ("aaa" has
  * "aa" twice), matching the standard pre-merge count formulation.
  */
object Subword {

  /** Top-`k` adjacent character pairs by corpus-weighted count — the
    * merge candidates of BPE iteration 1. Output: `pair`, `n_words`
    * (distinct words containing it), `weight` (frequency-weighted
    * occurrences), ordered (weight desc, pair) for a deterministic cut.
    */
  def bpePairCounts(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"bpePairCounts: k must be >= 1, got $k")
    val words = docs
      .select(explode(filter(split(col("text"), " "),
        t => length(t) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .filter(length(col("w")) >= 2)
    words
      .select(col("w"), col("n"),
        explode(expr(
          "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"
        )).as("pair"))
      .groupBy("pair")
      .agg(
        countDistinct(col("w")).as("n_words"),
        sum(col("n")).cast("long").as("weight"))
      .orderBy(col("weight").desc, col("pair"))
      .limit(k)
  }
}
