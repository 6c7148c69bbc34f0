package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.HashSplit

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between cleaning and training: eval-set decontamination, RAG-style
  * document chunking, and context-window sequence packing. Everything is
  * pure column algebra over the module's shared tokenization
  * ([[TextAnalysis.wordNgrams]]), with DuckDB-oracle twins — no UDFs, no
  * RNG, no driver-side state.
  */
object Curation {

  /** Train/eval decontamination: flag every training document that shares
    * at least one word `n`-gram with the eval corpus — the standard
    * benchmark-leakage gate (GPT-3 used 13-gram overlap; `n` is the
    * caller's contract, sized to the corpus).
    *
    * Scale shape: each side reduces to DISTINCT (doc, gram) pairs with
    * map-side partial aggregation before any join, so a gram repeated
    * through a 100 TB corpus crosses the wire once per doc, not once per
    * occurrence. The eval side collapses further to a bare gram set —
    * eval suites are MBs against a train corpus of TBs, so Catalyst/AQE
    * broadcasts it and the scan-side join runs with no train shuffle; a
    * pathological giant eval set degrades to a sort-merge join on gram,
    * still never all-pairs. The final left join keys on doc_id only
    * (contaminated docs carry their hit count, clean docs get 0).
    *
    * NOTE: `train` is referenced twice (the gram explode and the doc_id
    * spine of the left join). DataFrame lineage has no common-subplan
    * sharing, so a `train` with an expensive upstream recomputes it —
    * pass a materialized/checkpointed frame, or, when only the flag is
    * needed for a downstream filter, join the gram hits as a key set
    * instead (see the corpus_pipeline entry, which inlines exactly that).
    */
  def decontaminate(train: DataFrame, eval: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val trainGrams = TextAnalysis.wordNgrams(train, n).distinct()
    val evalGrams = TextAnalysis.wordNgrams(eval, n).select("gram").distinct()
    val hits = trainGrams.join(evalGrams, Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    train.select("doc_id").join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .withColumn("contaminated", col("n_shared_grams") > 0)
  }

  /** Fixed-size character chunking with overlap — the retrieval /
    * context-window preprocessing step. Chunk `i` of a document covers
    * `[i*(chunkSize-overlap) + 1, … + chunkSize]` (1-based, end-clamped);
    * a document of `n_chars ≤ chunkSize` yields exactly one chunk, and
    * consecutive chunks share `overlap` characters. All arithmetic is
    * small-integer (exact in any engine); chunking is a per-row explode —
    * no shuffle, embarrassingly parallel, output size a predictable
    * `≈ n_chars / (chunkSize - overlap)` multiple of the input.
    */
  def chunk(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap for chunkSize $chunkSize")
    val stride = (chunkSize - overlap).toLong
    val nChars = length(col("text")).cast("long")
    // 1 + ceil(max(n_chars - chunkSize, 0) / stride), as ONE division of
    // exact small integers: floor((a + stride - 1) / stride). A correctly
    // rounded single division of exact doubles can never round across an
    // integer boundary here (the true ratio is either an integer — then
    // representable and returned exactly — or at distance ≥ 1/stride from
    // one), so both engines floor identically.
    // null for null text (greatest() skips nulls, so the subtraction's
    // null would otherwise fold to 0 and emit one spurious chunk)
    val nChunks = when(col("text").isNotNull, lit(1L) + floor(
      (greatest(nChars - chunkSize, lit(0L)) + (stride - 1)).cast("double")
        / stride).cast("long"))
    // a null-text document has no chunks (explode of a null sequence emits
    // nothing) — the convention callers want from a chunker, vs the
    // single-empty-chunk a zero-length text yields
    docs
      .select(col("doc_id"), col("text"), nChunks.as("__nc"))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__nc") - 1)))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("chunk_start"),
        col("text").substr((col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
  }

  /** Share-based quality gate: keep the top `share` of documents per
    * group (language / domain) ranked by a quality score — the CCNet-style
    * relative gate ("keep the best X% per language"), the complement of
    * [[graft.ops.CapPerGroup]]'s absolute quota. The score here is the
    * stopword ratio (prose-likeness) from the module's shared counters,
    * rounded to 9 decimals BEFORE ranking so engine division ulps cannot
    * reorder; `doc_id` breaks ties, so the kept set is deterministic.
    * `percent_rank` = (rank−1)/(n−1) is a ratio of exact small integers —
    * engine-identical.
    *
    * Scale shape: one hash partition on the group key + one sort — a
    * relative gate needs the group's full order, so unlike the quota cap
    * there is no rank-limit pushdown. At corpus scale the standard
    * escape (what CCNet does) is a two-pass threshold: compute each
    * group's score cutoff once ([[graft.ops.ExactPercentiles]], or an
    * approx quantile sketch), broadcast it, and gate with a pure map-side
    * `score >= cutoff` filter — same semantics up to ties, no per-group
    * sort. This operator is the exact single-pass form.
    */
  def qualityTopShare(docs: DataFrame, share: Double,
      groupCols: Seq[String] = Seq("lang")): DataFrame = {
    require(share > 0.0 && share <= 1.0, s"share must be in (0, 1], got $share")
    val scored = scoreDocs(docs, groupCols)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("quality_score").desc, col("doc_id"))
    scored.withColumn("q_rank", percent_rank().over(w))
      .filter(col("q_rank") <= share)
  }

  /** The corpus-scale form of [[qualityTopShare]] — two passes, no
    * per-group sort of the data rows: pass 1 computes each group's score
    * cutoff (the `(1 − share)` quantile, [[graft.ops.ExactPercentiles]] —
    * sort of SCORES within a group, spill-graceful, or swap in an approx
    * sketch at 100 TB); pass 2 is a join against the group-cardinality-
    * sized cutoff table (broadcast by AQE for any real group count) plus
    * a pure map-side `score >= cutoff` filter. Interpolated cutoffs admit
    * ties, so the kept share is ≥ `share` rather than exactly it — the
    * usual contract of threshold-based gates (CCNet ships bucket
    * thresholds exactly like this).
    */
  def qualityAboveCutoff(docs: DataFrame, share: Double,
      groupCols: Seq[String] = Seq("lang")): DataFrame = {
    require(share > 0.0 && share <= 1.0, s"share must be in (0, 1], got $share")
    val scored = scoreDocs(docs, groupCols)
    val cutoffs = graft.ops.ExactPercentiles.perGroup(
      scored, groupCols, "quality_score", Seq("cutoff" -> (1.0 - share)))
    // null-SAFE group equality: the percentile pass groups null keys into
    // their own group (like the share gate's window partition), so the
    // join-back must match them too — a plain equi-join would silently
    // drop every null-keyed document
    val cond = groupCols.map(k => col(s"s.$k") <=> col(s"c.$k")).reduce(_ && _)
    scored.alias("s").join(cutoffs.alias("c"), cond)
      .filter(col("quality_score") >= col("cutoff"))
      .select((col("doc_id") +: groupCols.map(k => col(s"s.$k"))) ++
        Seq(col("quality_score"), col("cutoff")): _*)
  }

  /** Corpus n-gram commonness: for each document, how much of it is
    * boilerplate the REST of the corpus also contains — n_shingles
    * (distinct word-n-grams), n_shared (those appearing in ≥ 2 docs), and
    * shared_ratio. High ratio = template/mirror/quote-heavy content (the
    * memorization-risk signal used to downweight or drop near-boilerplate
    * docs); the per-doc complement of pair-producing near-dup detection,
    * and corpus-level where [[graft.text.TextAnalysis]] repetition is
    * within-doc.
    *
    * Scale shape: the SAME inverted-index shuffle as
    * [[graft.dedup.Dedup.ngramJaccardPairs]] minus its self-join — one
    * shingle explode whose distinct() Exchange is reused by both the
    * doc-frequency aggregate and the join back (co-partitioned on
    * shingle, so no second shuffle of the exploded set), then a doc_id
    * aggregate. Nothing is ever quadratic in docs sharing a shingle —
    * ultra-frequent shingles cost one counter row here, vs. the pair
    * join's fan-out (no stop-shingle cap needed).
    *
    * Documents too short to have an n-gram report 0 shingles and a null
    * ratio (not 0.0 — "no evidence" is not "fully novel").
    */
  def ngramCommonness(docs: DataFrame, n: Int = 5): DataFrame = {
    val sh = graft.dedup.Dedup.shingles(docs, n)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val perDoc = sh.join(dfreq, Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_shingles") > 0,
          round(col("n_shared").cast("double") /
            col("n_shingles").cast("double"), 9)).as("shared_ratio"))
  }

  /** URL authority (host[:port]) capture group — the URL pattern's prefix
    * with the first path/query/fragment delimiter as the stop set,
    * whitespace spelled out like [[TextAnalysis.urlPattern]] (no `\s`
    * shorthand: Java and RE2 disagree on `\x0B`).
    */
  val hostPattern: String = """https?://([^/?#\t\n\f\r \x0B]+)"""

  /** Per-host crawl statistics: for every host appearing in a document
    * URL — urls seen, documents touched, and the token mass of those
    * documents. This is the aggregate behind per-domain curation
    * decisions (C4/RefinedWeb-style host allow/block lists, per-domain
    * caps, "is this domain boilerplate or content" triage) — the
    * curation signal is per-HOST, not per-document, so it needs its own
    * grouping grain.
    *
    * Scale shape: URL extraction is per-row codegen'd regex (no
    * shuffle); the per-(host, doc) distinct and both host aggregates
    * combine map-side, so a host appearing a billion times crosses the
    * wire once per partition, not once per URL. Host keys are Zipfian
    * in a real crawl (one mega-host can dominate) — the groupBy tolerates
    * that via AQE skew handling, and a caller capping domains applies
    * [[graft.ops.CapPerGroup]] downstream of this table, which is tiny
    * (|hosts|, not |urls|).
    *
    * `tokens_per_doc` is rounded to 9 decimals (module convention) so
    * engine division ulps cannot flip a downstream threshold.
    */
  def hostStats(docs: DataFrame): DataFrame = {
    val urls = docs
      .select(col("doc_id"), TextAnalysis.tokensWs(col("text")).as("n_tokens"),
        explode(regexp_extract_all(col("text"),
          lit(TextAnalysis.urlPattern), lit(0))).as("url"))
      .withColumn("host", regexp_extract(col("url"), hostPattern, 1))
    val perHostUrls = urls.groupBy("host")
      .agg(count(lit(1)).as("n_urls"))
    val perHostDocs = urls.select("host", "doc_id", "n_tokens").distinct()
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_doc_tokens"))
    perHostUrls.join(perHostDocs, Seq("host"))
      .select(col("host"), col("n_urls"), col("n_docs"), col("sum_doc_tokens"),
        round(col("sum_doc_tokens").cast("double") /
          col("n_docs").cast("double"), 9).as("tokens_per_doc"))
  }

  /** Shared quality score: stopword ratio (prose-likeness), rounded to
    * 9 decimals before any ranking/thresholding so engine division ulps
    * cannot reorder or flip a comparison.
    */
  private def scoreDocs(docs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val t = col("text")
    val nTokens = TextAnalysis.tokensWs(t)
    val nStop = TextAnalysis.wordHits(t, TextAnalysis.stopwords)
    docs.select(
      (col("doc_id") +: groupCols.map(col)) :+
        round(when(nTokens > 0, nStop.cast("double") / nTokens.cast("double"))
          .otherwise(0.0), 9).as("quality_score"): _*)
  }

  /** Sequence packing: assign documents to fixed-budget context windows
    * by concatenate-and-split — documents are laid out in a deterministic
    * stream order (`orderCol` within each stream) and a document starts in
    * pack `floor(tokens_before / ctxTokens)` at offset
    * `tokens_before % ctxTokens`. This is the packing shape GPT-style
    * pipelines use (concatenate, then cut at the context boundary);
    * a document longer than the remaining budget spans into the next
    * pack, which downstream splits using `pack_offset`.
    *
    * Scale shape: the running sum is a partitioned window — one shuffle
    * on the stream key. A stream key with 100 TB behind it would
    * concentrate into one task, so `shards` sub-divides each stream by
    * the document's content-hash bucket ([[HashSplit.bucket]] — pure,
    * engine-exact): pack identity becomes (stream, shard, pack_id) and
    * each shard's window sorts only its slice. Shards trade packing
    * fragmentation (≤ one partial pack per shard) for parallelism.
    */
  def packSequences(docs: DataFrame, ctxTokens: Long,
      streamCols: Seq[String] = Seq("source"), orderCol: String = "doc_id",
      shards: Int = 1): DataFrame = {
    require(ctxTokens > 0, s"ctxTokens must be positive, got $ctxTokens")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // null text = zero tokens: without the coalesce a null-text doc would
    // emit a null n_tokens (the window sum skips nulls, so its pack/offset
    // would be right but downstream splitting on n_tokens would NPE)
    val base = docs.select(
      (col(orderCol) +: streamCols.map(col)) :+
        coalesce(TextAnalysis.tokensWs(col("text")), lit(0L)).as("n_tokens") :+
        HashSplit.bucket(col(orderCol), shards).as("shard"): _*)
    val w = Window
      .partitionBy((streamCols :+ "shard").map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        (col(orderCol) +: streamCols.map(col)) ++ Seq(
          col("shard"), col("n_tokens"),
          floor(col("tokens_before").cast("double") / ctxTokens).cast("long")
            .as("pack_id"),
          (col("tokens_before") % ctxTokens).as("pack_offset")): _*)
  }

  /** Length-bucketed batch assembly ("sortish" batching): documents are
    * grouped into token-length buckets of `bucketWidth`, ordered by
    * (length, id) within each bucket, and cut into fixed-size batches of
    * `docsPerBatch`; per batch, the padding waste a dense [batch × max
    * len] tensor would pay. This is the dynamic-batching layout every
    * sequence-model trainer uses — batching similar lengths together is
    * what keeps padding (and wasted FLOPs) low, and the emitted
    * `padding_tokens / capacity_tokens` ratio is the metric that
    * validates a bucketing policy before a training run.
    *
    * Scale shape: same as [[packSequences]] — the only shuffle is the
    * window partitioned by (bucket, shard), where `shards` content-hash
    * sub-shards bound each window partition at 1/shards of a bucket (a
    * 100 TB corpus concentrates mass in few length buckets; the shard key
    * is the skew escape, and batches never need to cross shards). The
    * batch summary is then one hash aggregate on the window's own
    * partitioning.
    */
  def lengthBatches(docs: DataFrame, bucketWidth: Int = 64,
      docsPerBatch: Int = 16, shards: Int = 4): DataFrame = {
    require(bucketWidth > 0 && docsPerBatch > 0 && shards >= 1,
      s"bad args: $bucketWidth, $docsPerBatch, $shards")
    val base = docs.select(col("doc_id"),
      coalesce(TextAnalysis.tokensWs(col("text")), lit(0L)).as("n_tokens"),
      HashSplit.bucket(col("doc_id"), shards).as("shard"))
      .withColumn("bucket", (col("n_tokens") / bucketWidth).cast("long"))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("n_tokens"), col("doc_id"))
    base
      .withColumn("batch_id",
        ((row_number().over(w) - 1) / docsPerBatch).cast("long"))
      .groupBy("bucket", "shard", "batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_tokens"))
      .select(col("bucket"), col("shard"), col("batch_id"),
        col("n_docs"), col("max_len"), col("sum_tokens"),
        (col("n_docs") * col("max_len") - col("sum_tokens"))
          .as("padding_tokens"),
        // all-empty batch (bucket 0 can hold 0-token docs): capacity 0
        // would divide 0/0 → NaN; such a batch wastes nothing
        when(col("max_len") > 0,
          round((col("n_docs") * col("max_len") - col("sum_tokens"))
              .cast("double") /
            (col("n_docs") * col("max_len")).cast("double"), 9))
          .otherwise(lit(0.0)).as("padding_ratio"))
  }

  /** URL canonicalization — the key a crawl frontier and a URL-level
    * dedup both group by. Two syntactically different URLs that name the
    * same resource ("HTTP://WWW.Example.com:80/a/?utm_source=x#top" vs
    * "http://example.com/a") must collapse to one canonical form, or the
    * frontier re-crawls and the corpus double-counts.
    *
    * Normalizations, in order: fragment stripped; scheme stripped (http
    * vs https never distinguishes a document); host lowercased with any
    * default :80/:443 port removed; leading `www.` dropped; tracking
    * query parameters (`utm_*`, `fbclid`, `gclid`) removed wherever they
    * sit in the query string; empty `?` and trailing `/` dropped. Path
    * case is preserved (paths are case-sensitive per RFC 3986).
    *
    * Every step is a regex both Java regex (Spark codegen) and RE2
    * (DuckDB) evaluate identically — no backreferences or lookaround
    * (RE2 has neither), so the whole chain renders to an oracle twin.
    * Pure per-row column algebra: no shuffle, codegen'd.
    */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFragment = regexp_replace(url, "#.*$", "")
    val noScheme = regexp_replace(noFragment, "^[hH][tT][tT][pP][sS]?://", "")
    // host (everything before the first /?#) lowercased, default port off
    val host = regexp_replace(
      lower(regexp_extract(noScheme, "^([^/?#]*)", 1)), ":(80|443)$", "")
    val rest = regexp_extract(noScheme, "^[^/?#]*(.*)$", 1)
    val noWww = regexp_replace(host, "^www\\.", "")
    // tracking params: mid-query (&k=v), leading-with-more (?k=v& → ?),
    // then sole (?k=v → "") — three passes, no backreferences
    val track = "(utm_[^=&#]*|fbclid|gclid)"
    val q1 = regexp_replace(rest, s"&$track=[^&]*", "")
    val q2 = regexp_replace(q1, s"\\?$track=[^&]*&", "?")
    val q3 = regexp_replace(q2, s"\\?$track=[^&]*$$", "")
    val noEmptyQ = regexp_replace(q3, "\\?$", "")
    // trailing path slash: before the query string and at URL end
    val noSlashQ = regexp_replace(noEmptyQ, "/+\\?", "?")
    concat(noWww, regexp_replace(noSlashQ, "/+$", ""))
  }

  /** The same canonicalization as DuckDB SQL over a column expression
    * (RE2 `regexp_replace` needs the explicit 'g' flag Spark defaults
    * to; only the mid-query tracking-param pass relies on it).
    */
  def canonicalUrlSql(c: String): String = {
    val track = "(utm_[^=&#]*|fbclid|gclid)"
    val noScheme =
      s"regexp_replace(regexp_replace($c, '#.*$$', ''), '^[hH][tT][tT][pP][sS]?://', '')"
    val host = s"regexp_replace(lower(regexp_extract($noScheme, '^([^/?#]*)', 1)), ':(80|443)$$', '')"
    val noWww = s"regexp_replace($host, '^www\\.', '')"
    val rest = s"regexp_extract($noScheme, '^[^/?#]*(.*)$$', 1)"
    val q = s"regexp_replace(regexp_replace(regexp_replace($rest, " +
      s"'&$track=[^&]*', '', 'g'), '\\?$track=[^&]*&', '?'), " +
      s"'\\?$track=[^&]*$$', '')"
    s"concat($noWww, regexp_replace(regexp_replace(" +
      s"regexp_replace($q, '\\?$$', ''), '/+\\?', '?'), '/+$$', ''))"
  }

  /** URL-frontier aggregation: every URL mentioned in the corpus, grouped
    * by canonical form — mention count, distinct raw variants, distinct
    * citing documents. The grain a crawler schedules on and a URL-level
    * dedup keys on.
    *
    * Extraction reuses [[TextAnalysis.urlPattern]], which (like the
    * corpus-wide URL counters sharing it) only matches lowercase
    * `http(s)://` mentions; [[canonicalUrl]] itself normalizes any scheme
    * case when fed URLs from a structured column.
    *
    * Scale shape: extraction is a per-row explode (output ∝ URL mentions,
    * not docs²); the aggregate combines map-side on the canonical key.
    * The variant/doc distincts are exact — bounded per key by crawl
    * reality (a URL's spelling variants), not corpus size.
    */
  def urlFrontier(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(regexp_extract_all(col("text"),
        lit(TextAnalysis.urlPattern), lit(0))).as("url"))
      .withColumn("canonical_url", canonicalUrl(col("url")))
      .groupBy("canonical_url")
      .agg(
        count(lit(1)).as("n_mentions"),
        countDistinct(col("url")).as("n_variants"),
        countDistinct(col("doc_id")).as("n_docs"))
}
