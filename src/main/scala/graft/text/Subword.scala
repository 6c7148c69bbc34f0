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

  /** The FULL BPE training loop (Sennrich et al. algorithm 1): `rounds`
    * merge iterations, each counting adjacent symbol pairs over the
    * current symbolization and merging the most frequent pair corpus-wide.
    * Returns the learned merge table `(round, sym_left, sym_right,
    * weight)` — the artifact a tokenizer ships.
    *
    * State is the word-frequency vocab with each word's symbol sequence
    * as a single-space-joined string. The merge application — greedy
    * left-to-right non-overlapping replacement of the winning pair — is
    * PURE string algebra via the doubled-separator trick: with two
    * spaces between symbols (and two-space sentinels), a replace-all of
    * `" l  r "` with `" lr "` consumes one boundary space on each side,
    * so consecutive occurrences ("a a a a" under merge (a,a)) each
    * match exactly as the sequential greedy scan would ([aa, aa], never
    * [aa, a, a]); collapsing the double spaces restores the state. Both
    * engines' `replace` scans left-to-right without rescanning
    * replacements, so the oracle replays the identical algebra.
    *
    * Scale shape: identical to [[bpePairCounts]] — every iteration runs
    * on the VOCAB table (one corpus-collapse up front, then
    * `O(|vocab| · avg_len)` per round), never the corpus. The only
    * driver action per round is the 1-row argmax (a control decision,
    * same class as PageRank's convergence probe); the vocab state is
    * checkpointed once and each round adds one projection.
    */
  /** Words longer than this many characters are excluded from training
    * (a standard BPE-trainer guard against URLs / token runs). Part of
    * the operator CONTRACT, not an optimization: the oracle's pair
    * enumeration joins a bounded `generate_series(1, maxWordChars - 1)`,
    * so the cap must bind identically on both engines.
    */
  val maxWordChars: Int = 64

  def bpeTrainMerges(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bpeTrainMerges: rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // corpus → word-frequency vocab, symbols = characters (spaced).
    // '[\s\S]' not '.': Java regex '.' skips \r/NEL/LS/PS while RE2
    // matches them — the character class is the dialect-neutral
    // match-anything both engines agree on (words can still contain
    // \t/\r/\n: the upstream split is on ' ' only).
    var state = docs
      .select(explode(filter(split(col("text"), " "),
        t => length(t) > 0)).as("w"))
      .filter(length(col("w")) <= maxWordChars)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("n"),
        expr("""trim(regexp_replace(w, '([\\s\\S])', '$1 '))""").as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = state
        .select(col("n"), split(col("s"), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS l,
            |              element_at(syms, i + 1) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).cast("long").as("weight"))
        .orderBy(col("weight").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, w) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((round, l, r, w))
        // literals are interpolated into the expression: l/r come from the
        // corpus alphabet (no spaces by construction); escape quotes for
        // safety against pathological vocab
        def q(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
        state = state.select(col("n"), expr(
          s"""trim(replace(replace(
             |  '  ' || replace(s, ' ', '  ') || '  ',
             |  ' ${q(l)}  ${q(r)} ', ' ${q(l)}${q(r)} '), '  ', ' '))"""
            .stripMargin).as("s"))
          .localCheckpoint(true)
        round += 1
      }
    }
    merges.toSeq.toDF("round", "sym_left", "sym_right", "weight")
  }

  /** Apply a TRAINED ordered merge list to the corpus — the tokenizer's
    * encode side, the pass that actually touches 100 TB (training runs
    * once on the vocab; encoding runs on every document forever). Per
    * doc: word count, BPE token count, long-word count, fertility
    * (tokens/word — the comparative metric tokenizer papers report).
    *
    * Scale shape: the corpus collapses to the DISTINCT-WORD vocab
    * first; the merge chain (one doubled-separator replace per merge,
    * [[bpeTrainMerges]]'s exact algebra, codegen'd) runs once per vocab
    * word, not per occurrence; per-doc stats come from joining the doc→
    * word stream to the encoded vocab (AQE broadcasts the vocab when it
    * fits). Words over [[maxWordChars]] are outside the BPE contract
    * and count as 1 token each, reported in `n_long_words`.
    */
  def bpeEncodeStats(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("doc_id"),
        explode(filter(split(col("text"), " "),
          t => length(t) > 0)).as("w"))
    def q(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    val vocab0 = words.select("w").distinct()
      .filter(length(col("w")) <= maxWordChars)
      .withColumn("s",
        expr("""trim(regexp_replace(w, '([\\s\\S])', '$1 '))"""))
    val encoded = merges.foldLeft(vocab0) { case (df, (l, r)) =>
      df.withColumn("s", expr(
        s"""trim(replace(replace(
           |  '  ' || replace(s, ' ', '  ') || '  ',
           |  ' ${q(l)}  ${q(r)} ', ' ${q(l)}${q(r)} '), '  ', ' '))"""
          .stripMargin))
    }.select(col("w"), size(split(col("s"), " ")).cast("long").as("n_toks"))
    words.join(encoded, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(coalesce(col("n_toks"), lit(1L))).as("n_bpe_tokens"),
        count(when(length(col("w")) > maxWordChars, lit(1)))
          .as("n_long_words"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double")
          / col("n_words").cast("double"), 9))
  }
}
