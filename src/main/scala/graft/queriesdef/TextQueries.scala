package graft.queriesdef

import org.apache.spark.sql.functions._
import graft.QueryRegistry.Entry
import graft.core.Catalog
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Text-analysis + deduplication queries over `documents` (training-data
  * pipeline operators; BASELINE.json north-star).
  */
object TextQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Catalog.table(s, dir, "documents")

  /** DuckDB regexp count (RE2): matches Spark's regexp_count for the
    * character-class patterns used here.
    */
  private def reCount(expr: String, pat: String): String =
    s"CAST(length(regexp_extract_all($expr, '$pat')) AS BIGINT)"

  /** SQL twin of TextAnalysis.langId's argmax (greatest + first-match
    * CASE — linear in #languages; first-listed wins ties, max must be >0).
    */
  private def langArgmaxSql: String = {
    val scores = TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" }
    val best = s"greatest(${scores.mkString(", ")})"
    val firstAtMax = TextAnalysis.langMarkers
      .map { case (l, _) => s"WHEN score_$l = $best THEN '$l'" }
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"CASE WHEN $best > 0 THEN $firstAtMax ELSE 'und' END"
  }

  /** Distinct word-5-gram CTEs (defines relation `sh(doc_id, shingle)`)
    * — the shared inverted-index input for the Jaccard pair and corpus
    * commonness oracles.
    */
  private val shingleCtes: String =
    """ws AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id,
      |      list_filter(string_split(text, ' '), x -> x <> '') AS w
      |    FROM documents) t
      |  WHERE len(w) >= 5),
      |sh0 AS (
      |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS shingle
      |  FROM (SELECT doc_id, w,
      |          unnest(generate_series(1, len(w) - 4)) AS i
      |        FROM ws) t),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)""".stripMargin

  /** Word-5-gram Jaccard pair CTEs (defines relation `jpairs` with
    * doc_a, doc_b, n_common, size_a, size_b, jaccard at threshold 0.5).
    */
  private val jaccardCtes: String =
    s"""$shingleCtes,
      |sz AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
      |co AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |  FROM sh a JOIN sh b
      |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |jpairs AS (
      |  SELECT doc_a, doc_b, n_common,
      |    sa.n_shingles AS size_a, sb.n_shingles AS size_b,
      |    CAST(n_common AS DOUBLE)
      |      / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) AS jaccard
      |  FROM co
      |  JOIN sz sa ON sa.doc_id = doc_a
      |  JOIN sz sb ON sb.doc_id = doc_b
      |  WHERE CAST(n_common AS DOUBLE)
      |      / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.5)""".stripMargin

  /** MinHash signature CTEs (word-3-gram shingles → md5-31-bit base hash
    * → 16 affine mins per doc) — constants render from the SAME
    * [[Dedup.affineA]]/[[Dedup.affineB]]/[[Dedup.minhashP]] definitions
    * the Spark operator uses, so the two sides cannot drift. Defines
    * relation `sig(doc_id, h0..h15)`.
    */
  private def minhashSigCtes: String = {
    val p = Dedup.minhashP
    val mins = (0 until 16).map { i =>
      s"  min((x * ${Dedup.affineA(i)} + ${Dedup.affineB(i)}) % $p) AS h$i"
    }.mkString(",\n")
    s"""mws AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents),
       |msh0 AS (
       |  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
       |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
       |        FROM mws WHERE len(w) >= 3) t),
       |msh AS (SELECT DISTINCT doc_id, shingle FROM msh0),
       |mxs AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % $p AS x
       |  FROM msh),
       |sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM mxs GROUP BY doc_id)""".stripMargin
  }

  def entries: Seq[Entry] = Seq(

    // Token counting + quality stats (length/punct/stopword ratios).
    Entry(
      "text_stats",
      (s, dir) => TextAnalysis.stats(docs(s, dir)),
      Some(s"""WITH st AS (
        |  SELECT doc_id, lang, source,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${reCount("text", TextAnalysis.bpePattern)} AS n_tokens_bpe,
        |    ${reCount("text", """\b(the|a)\b""")} AS n_stopwords,
        |    ${reCount("text", """[^a-z0-9\s]""")} AS n_punct
        |  FROM documents)
        |SELECT doc_id, lang, source, n_chars, n_tokens, n_tokens_bpe,
        |  n_stopwords, n_punct,
        |  CASE WHEN n_tokens > 0
        |    THEN CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    ELSE 0.0 END AS avg_token_len,
        |  CASE WHEN n_tokens > 0
        |    THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    ELSE 0.0 END AS stopword_ratio,
        |  CASE WHEN n_chars > 0
        |    THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
        |    ELSE 0.0 END AS punct_ratio
        |FROM st""".stripMargin)),

    // Quality gate over the stats.
    Entry(
      "quality_filter",
      (s, dir) => TextAnalysis.qualityFiltered(docs(s, dir))
        .select("doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "quality_pass"),
      Some(s"""WITH st AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${reCount("text", """\b(the|a)\b""")} AS n_stopwords
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens > 0
        |      THEN CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      ELSE 0.0 END AS avg_token_len,
        |    CASE WHEN n_tokens > 0
        |      THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      ELSE 0.0 END AS stopword_ratio
        |  FROM st)
        |SELECT doc_id, n_tokens, avg_token_len, stopword_ratio,
        |  (n_tokens >= 20 AND avg_token_len <= 12.0 AND stopword_ratio >= 0.0)
        |    AS quality_pass
        |FROM m""".stripMargin)),

    // Language-ID by marker-word voting.
    Entry(
      "lang_id",
      (s, dir) => TextAnalysis.langId(docs(s, dir)),
      Some {
        val scores = TextAnalysis.langMarkers.map { case (l, ws) =>
          s"    ${reCount("text", s"""\\b(${ws.mkString("|")})\\b""")} AS score_$l"
        }.mkString(",\n")
        s"""WITH scored AS (
           |  SELECT doc_id, lang AS lang_true,
           |$scores
           |  FROM documents)
           |SELECT *, $langArgmaxSql AS lang_pred FROM scored""".stripMargin
      }),

    // Document fingerprinting (md5 content hash).
    Entry(
      "text_fingerprint",
      (s, dir) => TextAnalysis.fingerprints(docs(s, dir)),
      Some("""SELECT doc_id, md5(text) AS content_md5,
        |  substr(md5(text), 1, 8) AS fingerprint_prefix
        |FROM documents""".stripMargin)),

    // Exact dedup: hash-groupBy canonicalization.
    Entry(
      "dedup_exact",
      (s, dir) => Dedup.exact(docs(s, dir)),
      Some("""SELECT md5(text) AS content_md5,
        |  min(doc_id) AS canonical_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin)),

    // Exact word-5-gram Jaccard near-dup pairs via shingle inverted index.
    Entry(
      "dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(docs(s, dir), n = 5, threshold = 0.5),
      Some(s"""WITH $jaccardCtes
        |SELECT doc_a, doc_b, n_common, size_a, size_b, jaccard
        |FROM jpairs""".stripMargin)),

    // Cross-document repeated-span exposure (Dedup.repeatedSpans): the
    // k-gram core of exact substring dedup — per doc, the fraction of its
    // 8-gram positions occurring in ≥2 distinct documents. Linear plan:
    // explode → two gram-keyed aggregations → co-partitioned join; no
    // pair space anywhere. Docs under 8 words carry no grams and emit no
    // row (both engines).
    Entry(
      "dedup_repeated_spans",
      (s, dir) => Dedup.repeatedSpans(docs(s, dir), n = 8, minDocs = 2),
      Some(s"""WITH rw AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |rg AS (
        |  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        |        FROM rw WHERE len(w) >= 8) t),
        |pd AS (
        |  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS occ
        |  FROM rg GROUP BY doc_id, gram),
        |rep AS (
        |  SELECT gram FROM pd GROUP BY gram HAVING COUNT(*) >= 2),
        |docrep AS (
        |  SELECT pd.doc_id, CAST(SUM(pd.occ) AS BIGINT) AS n_repeated
        |  FROM pd JOIN rep ON pd.gram = rep.gram GROUP BY pd.doc_id),
        |tot AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        |  FROM rg GROUP BY doc_id)
        |SELECT t.doc_id, t.n_grams,
        |  COALESCE(d.n_repeated, 0) AS n_repeated,
        |  ROUND(CAST(COALESCE(d.n_repeated, 0) AS DOUBLE)
        |    / CAST(t.n_grams AS DOUBLE), 9) AS repeated_ratio
        |FROM tot t LEFT JOIN docrep d ON t.doc_id = d.doc_id""".stripMargin)),

    // Incremental twin: the second half of the corpus audited against the
    // first half's stored gram index (Dedup.repeatedSpansIncremental) —
    // cost ∝ batch grams, corpus never rescanned. The oracle recomputes
    // the FULL corpus-wide audit and restricts to batch docs: equality
    // hash-proves that stored-count + batch-count composition is exact.
    Entry(
      "dedup_repeated_spans_incremental",
      (s, dir) => {
        val d = docs(s, dir)
        val index = Dedup.repeatedSpanIndex(d.filter(col("doc_id") < 250), n = 8)
        Dedup.repeatedSpansIncremental(index,
          d.filter(col("doc_id") >= 250), n = 8, minDocs = 2)
      },
      Some(s"""WITH rw AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |rg AS (
        |  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
        |        FROM rw WHERE len(w) >= 8) t),
        |pd AS (
        |  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS occ
        |  FROM rg GROUP BY doc_id, gram),
        |rep AS (
        |  SELECT gram FROM pd GROUP BY gram HAVING COUNT(*) >= 2),
        |docrep AS (
        |  SELECT pd.doc_id, CAST(SUM(pd.occ) AS BIGINT) AS n_repeated
        |  FROM pd JOIN rep ON pd.gram = rep.gram GROUP BY pd.doc_id),
        |tot AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        |  FROM rg GROUP BY doc_id)
        |SELECT t.doc_id, t.n_grams,
        |  COALESCE(d.n_repeated, 0) AS n_repeated,
        |  ROUND(CAST(COALESCE(d.n_repeated, 0) AS DOUBLE)
        |    / CAST(t.n_grams AS DOUBLE), 9) AS repeated_ratio
        |FROM tot t LEFT JOIN docrep d ON t.doc_id = d.doc_id
        |WHERE t.doc_id >= 250""".stripMargin)),

    // Duplicate-cluster resolution: Jaccard pairs → connected components →
    // canonical doc per cluster. Oracle = recursive-CTE transitive closure.
    Entry(
      "dedup_clusters",
      (s, dir) => graft.dedup.Clusters.resolve(docs(s, dir), threshold = 0.5, n = 5),
      Some(s"""WITH RECURSIVE $jaccardCtes,
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM jpairs),
        |reach(a, b) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
        |SELECT d.doc_id,
        |  COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
        |  (COALESCE(cc.cluster_id, d.doc_id) = d.doc_id) AS is_canonical
        |FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id""".stripMargin)),

    // Keep-best survivor per duplicate cluster — the row set a dedup
    // pipeline ships: longest member survives (ties → min doc_id), the
    // rest are dropped. Engine runs a partial-aggregable
    // max(struct(score, -doc_id)) per cluster (no window, no per-cluster
    // sort); the oracle is the ROW_NUMBER definition — hash equality
    // proves the argmax decomposition.
    Entry(
      "dedup_survivors",
      (s, dir) => graft.dedup.Clusters.survivors(docs(s, dir), "n_chars"),
      Some(s"""WITH RECURSIVE $jaccardCtes,
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM jpairs),
        |reach(a, b) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
        |assigned AS (
        |  SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
        |    d.n_chars
        |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
        |best AS (
        |  SELECT cluster_id, doc_id AS survivor_id FROM (
        |    SELECT cluster_id, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY cluster_id
        |        ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM assigned) WHERE rn = 1)
        |SELECT a.doc_id, a.cluster_id, b.survivor_id,
        |  (a.doc_id = b.survivor_id) AS kept
        |FROM assigned a JOIN best b USING (cluster_id)""".stripMargin)),

    // Leakage-safe train/val/test split: membership hashed on the
    // duplicate CLUSTER, not the document, so near-copies never straddle
    // the train/test boundary (Clusters.leakageSafeSplit scaladoc).
    Entry(
      "split_by_cluster",
      (s, dir) => graft.dedup.Clusters.leakageSafeSplit(docs(s, dir)),
      Some(s"""WITH RECURSIVE $jaccardCtes,
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM jpairs),
        |reach(a, b) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |cc AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
        |assigned AS (
        |  SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
        |b AS (
        |  SELECT doc_id, cluster_id,
        |    ${graft.ops.HashSplit.bucketSql("cluster_id", 1000)} AS bucket
        |  FROM assigned)
        |SELECT doc_id, cluster_id, bucket,
        |  ${graft.ops.HashSplit.splitSql()} AS split
        |FROM b""".stripMargin)),

    // MinHash signatures (the sketch operator). The md5-derived base hash
    // and shared affine constants render to DuckDB, so the signatures are
    // hash-verified — not just rows-counted.
    Entry(
      "dedup_minhash_signatures",
      (s, dir) => Dedup.minhashSignatures(docs(s, dir)),
      Some(s"""WITH $minhashSigCtes
        |SELECT * FROM sig""".stripMargin)),

    // MinHash+LSH candidate pairs (the banded scale path), hash-verified
    // end-to-end: base hash, affine mins, and band buckets all render to
    // the same values in DuckDB.
    Entry(
      "dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLshCandidates(docs(s, dir)),
      Some {
        val perBand = 16 / 4
        val bandSelects = (0 until 4).map { bd =>
          val hs = (bd * perBand until (bd + 1) * perBand)
            .map(i => s"h$i").mkString(", ")
          s"SELECT doc_id, $bd AS band, substr(md5(concat_ws('|', $hs)), 1, 16) AS bucket FROM sig"
        }.mkString("\n    UNION ALL ")
        s"""WITH $minhashSigCtes,
           |banded AS (
           |    $bandSelects)
           |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
           |FROM banded l JOIN banded r
           |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id""".stripMargin
      }),

    // Incremental near-dup: the src0 batch probed against the band INDEX
    // of the already-accepted corpus (everything else) plus within-batch
    // pairs — dedup_incremental lifted to NEAR duplicates. The corpus
    // side is its persisted bandTable (bands × ~20 bytes/doc, no text):
    // corpus text is never re-shingled at ingest time
    // (Dedup.incrementalLshCandidates scaladoc).
    Entry(
      "dedup_incremental_lsh",
      (s, dir) => {
        val d = docs(s, dir)
        val corpusIdx = Dedup.bandTable(d.filter(col("source") =!= "src0"))
        Dedup.incrementalLshCandidates(corpusIdx,
          d.filter(col("source") === "src0"))
      },
      Some {
        val perBand = 16 / 4
        val bandSelects = (0 until 4).map { bd =>
          val hs = (bd * perBand until (bd + 1) * perBand)
            .map(i => s"h$i").mkString(", ")
          s"SELECT doc_id, $bd AS band, substr(md5(concat_ws('|', $hs)), 1, 16) AS bucket FROM sig"
        }.mkString("\n    UNION ALL ")
        s"""WITH $minhashSigCtes,
           |banded AS (
           |    $bandSelects),
           |bb AS (
           |  SELECT b.* FROM banded b JOIN documents d ON b.doc_id = d.doc_id
           |  WHERE d.source = 'src0'),
           |cb AS (
           |  SELECT b.* FROM banded b JOIN documents d ON b.doc_id = d.doc_id
           |  WHERE d.source <> 'src0')
           |SELECT DISTINCT doc_a, doc_b, vs FROM (
           |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, 'corpus' AS vs
           |  FROM bb l JOIN cb r ON l.band = r.band AND l.bucket = r.bucket
           |  UNION ALL
           |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b, 'batch' AS vs
           |  FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket
           |   AND l.doc_id < r.doc_id) t""".stripMargin
      }),

    // SimHash near-dup pairs under Hamming radius, hash-verified: the
    // md5-derived 60-bit sketch, bit votes, prefix blocks, and Hamming
    // filter all render identically in DuckDB.
    Entry(
      "dedup_simhash",
      (s, dir) => Dedup.simhashPairs(docs(s, dir)),
      Some {
        val bits = Dedup.simhashBits
        val votes = (0 until bits).map(i =>
          s"  SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
          .mkString(",\n")
        val sketch = (0 until bits).map(i =>
          s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
        val blockSelects = (0 until 4).map { c =>
          s"SELECT doc_id, simhash, $c AS chunk, (simhash >> ${c * 15}) & 32767 AS block FROM sk"
        }.mkString("\n    UNION ALL ")
        s"""WITH toks AS (
           |  SELECT doc_id,
           |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
           |  FROM (SELECT doc_id,
           |          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
           |        FROM documents) t),
           |votes AS (
           |  SELECT doc_id,
           |$votes
           |  FROM toks GROUP BY doc_id),
           |sk AS (SELECT doc_id, CAST($sketch AS BIGINT) AS simhash FROM votes),
           |blocked AS (
           |    $blockSelects)
           |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
           |  CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
           |FROM blocked l JOIN blocked r
           |  ON l.chunk = r.chunk AND l.block = r.block AND l.doc_id < r.doc_id
           |WHERE bit_count(xor(l.simhash, r.simhash)) <= 12""".stripMargin
      }),

    // Intra-document repetition ratio (boilerplate/spam signal): share of
    // word bigrams taken by the most frequent bigram.
    Entry(
      "text_repetition",
      (s, dir) => TextAnalysis.repetition(docs(s, dir)),
      Some("""WITH ws AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM ws WHERE len(w) >= 2),
        |grams AS (
        |  SELECT doc_id, (w[i] || ' ' || w[i + 1]) AS gram FROM idx),
        |counts AS (
        |  SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram)
        |SELECT doc_id,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS repetition_ratio,
        |  CAST(SUM(c) AS BIGINT) AS n_grams
        |FROM counts GROUP BY doc_id""".stripMargin)),

    // Reproducible content-hash train/val/test assignment — split
    // membership is a pure function of the key, verified engine-exact
    // (the md5-bucket arithmetic renders to both engines).
    Entry(
      "hash_split",
      (s, dir) => graft.ops.HashSplit.split(
        docs(s, dir).select("doc_id"), "doc_id"),
      Some(s"""SELECT doc_id, bucket, ${graft.ops.HashSplit.splitSql()} AS split
        |FROM (SELECT doc_id, ${graft.ops.HashSplit.bucketSql("doc_id", 1000)} AS bucket
        |      FROM documents) t""".stripMargin)),

    // Deterministic class-rebalancing: cap the majority language at 300
    // per-mille, keep the rest — reproducible stratified sampling as a
    // pure function of (doc_id, lang).
    Entry(
      "stratified_sample",
      (s, dir) => graft.ops.HashSplit.stratified(
        docs(s, dir).select("doc_id", "lang"), "doc_id", "lang",
        Map("en" -> 300)),
      Some(s"""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ${graft.ops.HashSplit.bucketSql("doc_id", 1000)} AS bucket,
        |    ${graft.ops.HashSplit.stratifiedRateSql("lang", Map("en" -> 300))} AS rate
        |  FROM documents) t
        |WHERE bucket < rate""".stripMargin)),

    // Per-group quota cap: at most 20 documents per language, membership
    // a pure function of (lang, md5(doc_id)) — the curation primitive
    // that bounds any one group's share of a corpus. Rank-limit pushdown
    // (WindowGroupLimit) keeps hot groups map-side-bounded; pinned by
    // CapAndTfidfSpec.
    Entry(
      "cap_per_group",
      (s, dir) => graft.ops.CapPerGroup.cap(
        docs(s, dir).select("doc_id", "lang"), Seq("lang"), "doc_id", 20),
      Some(s"""SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ${graft.ops.CapPerGroup.rankSql(Seq("lang"), "doc_id")} AS rn
        |  FROM documents) t
        |WHERE rn <= 20""".stripMargin)),

    // Keyword extraction: per-document top-3 terms by smoothed tf-idf,
    // scores rounded to 9 decimals before ranking (the cosine convention)
    // so engine ln() ulp differences can neither reorder nor leak into
    // values.
    Entry(
      "tfidf_top_terms",
      (s, dir) => TextAnalysis.tfidfTopTerms(docs(s, dir), k = 3),
      Some("""WITH words AS (
        |  SELECT doc_id, w AS term FROM (
        |    SELECT doc_id,
        |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |    FROM documents) t),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM words GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf,
        |    round(CAST(t.tf AS DOUBLE) *
        |      ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE)), 9)
        |      AS tfidf
        |  FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, tfidf, rank
        |FROM ranked WHERE rank <= 3""".stripMargin)),

    // CCNet-style relative quality gate: keep the top half per language
    // by stopword-ratio score (percent_rank — exact integer ratio,
    // engine-identical; score rounded to 9 decimals before ranking).
    Entry(
      "quality_top_share",
      (s, dir) => graft.text.Curation.qualityTopShare(docs(s, dir), share = 0.5),
      Some(s"""WITH st AS (
        |  SELECT doc_id, lang,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${reCount("text", """\b(the|a)\b""")} AS n_stop
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    round(CASE WHEN n_tokens > 0
        |      THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      ELSE 0.0 END, 9) AS quality_score
        |  FROM st),
        |ranked AS (
        |  SELECT *, PERCENT_RANK() OVER (
        |    PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS q_rank
        |  FROM scored)
        |SELECT doc_id, lang, quality_score, q_rank
        |FROM ranked WHERE q_rank <= 0.5""".stripMargin)),

    // The corpus-scale twin of quality_top_share: per-group quantile
    // cutoff (one score sort per group) + map-side gate — no per-group
    // sort of the data rows. DuckDB's quantile_cont matches
    // ExactPercentiles' interpolation exactly (as spend_percentiles pins).
    Entry(
      "quality_cutoff_gate",
      (s, dir) => graft.text.Curation.qualityAboveCutoff(docs(s, dir), share = 0.5),
      Some(s"""WITH st AS (
        |  SELECT doc_id, lang,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${reCount("text", """\b(the|a)\b""")} AS n_stop
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, lang,
        |    round(CASE WHEN n_tokens > 0
        |      THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      ELSE 0.0 END, 9) AS quality_score
        |  FROM st),
        |cut AS (
        |  SELECT lang, quantile_cont(quality_score, 0.5) AS cutoff
        |  FROM scored GROUP BY lang)
        |SELECT s.doc_id, s.lang, s.quality_score, c.cutoff
        |FROM scored s JOIN cut c ON s.lang IS NOT DISTINCT FROM c.lang
        |WHERE s.quality_score >= c.cutoff""".stripMargin)),

    // Eval-set decontamination: flag train-split documents sharing any
    // word 5-gram with the eval split (the GPT-3 13-gram rule, n sized to
    // the fixture's short synthetic docs). Eval side collapses to a bare
    // gram set — broadcastable against a 100 TB train corpus.
    Entry(
      "decontaminate",
      (s, dir) => {
        val d = docs(s, dir)
        graft.text.Curation.decontaminate(
          d.filter(!col("source").isin("src0", "src1")),
          d.filter(col("source").isin("src0", "src1")), n = 5)
      },
      Some("""WITH words AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, array_to_string(w[i:i+4], ' ') AS gram
        |  FROM (SELECT doc_id, source, w,
        |          unnest(generate_series(1, len(w) - 4)) AS i
        |        FROM words WHERE len(w) >= 5) t),
        |tr AS (SELECT DISTINCT doc_id, gram FROM grams
        |       WHERE source NOT IN ('src0', 'src1')),
        |ev AS (SELECT DISTINCT gram FROM grams
        |       WHERE source IN ('src0', 'src1')),
        |hit AS (SELECT tr.doc_id, count(*) AS c
        |        FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(hit.c, 0) AS BIGINT) AS n_shared_grams,
        |  COALESCE(hit.c, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hit ON d.doc_id = hit.doc_id
        |WHERE d.source NOT IN ('src0', 'src1')""".stripMargin)),

    // Corpus n-gram commonness: per doc, the share of its distinct word
    // 5-grams that appear in >= 2 documents — the boilerplate /
    // memorization-risk score. One inverted-index shuffle, no self-join;
    // too-short docs report 0 shingles and a null ratio.
    Entry(
      "ngram_commonness",
      (s, dir) => graft.text.Curation.ngramCommonness(docs(s, dir), n = 5),
      Some(s"""WITH $shingleCtes,
        |dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |perdoc AS (
        |  SELECT sh.doc_id, count(*) AS n_shingles,
        |    sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_shared
        |  FROM sh JOIN dfreq USING (shingle) GROUP BY sh.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(p.n_shared, 0) AS BIGINT) AS n_shared,
        |  CASE WHEN p.n_shingles > 0 THEN
        |    round(CAST(p.n_shared AS DOUBLE) / CAST(p.n_shingles AS DOUBLE), 9)
        |  END AS shared_ratio
        |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id""".stripMargin)),

    // RAG-style chunking: 200-char chunks, 50-char overlap (stride 150);
    // per-row explode, no shuffle.
    Entry(
      "doc_chunks",
      (s, dir) => graft.text.Curation.chunk(docs(s, dir),
        chunkSize = 200, overlap = 50),
      Some("""WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(1 + floor((greatest(length(text) - 200, 0) + 149) / 150.0)
        |      AS BIGINT) AS nc
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0, nc - 1)) AS chunk_id
        |  FROM t)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(chunk_id * 150 + 1 AS BIGINT) AS chunk_start,
        |  substr(text, CAST(chunk_id * 150 + 1 AS INTEGER), 200) AS chunk_text,
        |  CAST(length(substr(text, CAST(chunk_id * 150 + 1 AS INTEGER), 200))
        |    AS BIGINT) AS chunk_len
        |FROM e""".stripMargin)),

    // Context-window sequence packing: concatenate-and-split at 256
    // tokens per pack, streams keyed by source and sub-sharded 4 ways by
    // content hash (the skew escape for a 100 TB stream key).
    Entry(
      "pack_sequences",
      (s, dir) => graft.text.Curation.packSequences(docs(s, dir),
        ctxTokens = 256, streamCols = Seq("source"), shards = 4),
      Some(s"""WITH t AS (
        |  SELECT doc_id, source,
        |    COALESCE(${reCount("trim(text)", """\S+""")}, 0) AS n_tokens,
        |    ${graft.ops.HashSplit.bucketSql("doc_id", 4)} AS shard
        |  FROM documents),
        |c AS (
        |  SELECT *, COALESCE(SUM(n_tokens) OVER (
        |      PARTITION BY source, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS tokens_before
        |  FROM t)
        |SELECT doc_id, source, shard, n_tokens,
        |  CAST(floor(tokens_before / 256.0) AS BIGINT) AS pack_id,
        |  CAST(tokens_before % 256 AS BIGINT) AS pack_offset
        |FROM c""".stripMargin)),

    // Length-bucketed batch assembly with per-batch padding waste — the
    // "sortish" dynamic-batching layout (Curation.lengthBatches scaladoc:
    // 64-token buckets × 4 content-hash shards, 16 docs per batch).
    Entry(
      "length_batching",
      (s, dir) => graft.text.Curation.lengthBatches(docs(s, dir)),
      Some(s"""WITH t AS (
        |  SELECT doc_id,
        |    COALESCE(${reCount("trim(text)", """\S+""")}, 0) AS n_tokens,
        |    ${graft.ops.HashSplit.bucketSql("doc_id", 4)} AS shard
        |  FROM documents),
        |b AS (
        |  SELECT *, n_tokens // 64 AS bucket,
        |    ROW_NUMBER() OVER (PARTITION BY n_tokens // 64, shard
        |      ORDER BY n_tokens, doc_id) AS rn
        |  FROM t)
        |SELECT bucket, shard, CAST((rn - 1) // 16 AS BIGINT) AS batch_id,
        |  COUNT(*) AS n_docs,
        |  CAST(MAX(n_tokens) AS BIGINT) AS max_len,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
        |    AS padding_tokens,
        |  CASE WHEN MAX(n_tokens) > 0 THEN
        |    ROUND(CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS DOUBLE)
        |      / CAST(COUNT(*) * MAX(n_tokens) AS DOUBLE), 9)
        |  ELSE 0.0 END AS padding_ratio
        |FROM b GROUP BY bucket, shard, (rn - 1) // 16""".stripMargin)),

    // Corpus vocabulary: global top-50 terms by corpus frequency with
    // document frequency — tf and df from ONE pass over the (term, doc)
    // pre-aggregate; top-k via TakeOrderedAndProject, ties on the term.
    Entry(
      "vocab_topk",
      (s, dir) => TextAnalysis.vocabulary(docs(s, dir), k = 50),
      Some("""WITH words AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |pd AS (SELECT term, doc_id, COUNT(*) AS c FROM words GROUP BY 1, 2),
        |agg AS (
        |  SELECT term, CAST(SUM(c) AS BIGINT) AS tf, COUNT(*) AS df
        |  FROM pd GROUP BY term),
        |ranked AS (
        |  SELECT term, tf, df,
        |    ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rank
        |  FROM agg)
        |SELECT term, tf, df, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 50""".stripMargin)),

    // Sampled-candidates top-k: candidate terms from a 30% content-hash
    // DOCUMENT sample, exact tf/df re-count of candidates only (broadcast
    // semi-prune before the shuffle) — the scale path where the exact
    // vocabulary shuffle is too wide. Same definition in both engines, so
    // the sampling + re-verify decomposition is hash-verified.
    Entry(
      "vocab_topk_sampled",
      (s, dir) => TextAnalysis.vocabularySampled(docs(s, dir), k = 50),
      Some(s"""WITH words AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |smp AS (
        |  SELECT term FROM words
        |  WHERE ${graft.ops.HashSplit.bucketSql("doc_id", 1000)} < 300),
        |cand AS (
        |  SELECT term FROM (
        |    SELECT term, COUNT(*) AS stf FROM smp GROUP BY term)
        |  ORDER BY stf DESC, term LIMIT 200),
        |pd AS (
        |  SELECT w.term, w.doc_id, COUNT(*) AS c
        |  FROM words w JOIN cand USING (term) GROUP BY 1, 2),
        |agg AS (
        |  SELECT term, CAST(SUM(c) AS BIGINT) AS tf, COUNT(*) AS df
        |  FROM pd GROUP BY term),
        |ranked AS (
        |  SELECT term, tf, df,
        |    ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rank
        |  FROM agg)
        |SELECT term, tf, df, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 50""".stripMargin)),

    // PII scrubbing: the fixture corpus carries no PII, so the entry
    // deterministically injects synthetic emails/URLs/phones into a
    // doc_id-keyed subset first (pure string concat, identical in both
    // dialects) — the regex redaction paths then do real work and the
    // oracle verifies them engine-exact, counts and rewritten text both.
    Entry(
      "pii_redact",
      (s, dir) => {
        val injected = docs(s, dir).select(col("doc_id"), concat(
          col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now"))).otherwise(""),
          when(col("doc_id") % 7 === 0,
            concat(lit(" see https://example.org/d/"),
              col("doc_id").cast("string"), lit("?x=1 ok"))).otherwise(""),
          when(col("doc_id") % 11 === 0,
            lit(" call 555-867-5309 today")).otherwise("")).as("text"))
        TextAnalysis.redactPii(injected)
      },
      Some(s"""WITH inj AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' contact user' ||
        |      CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' see https://example.org/d/' ||
        |      CAST(doc_id AS VARCHAR) || '?x=1 ok' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309 today'
        |      ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, '${TextAnalysis.urlPattern}', '<URL>', 'g')
        |      AS t1
        |  FROM inj),
        |e AS (
        |  SELECT *, regexp_replace(t1, '${TextAnalysis.emailPattern}', '<EMAIL>', 'g')
        |      AS t2
        |  FROM u)
        |SELECT doc_id,
        |  ${reCount("t1", TextAnalysis.emailPattern)} AS n_emails,
        |  ${reCount("text", TextAnalysis.urlPattern)} AS n_urls,
        |  ${reCount("t2", TextAnalysis.phonePattern)} AS n_phones,
        |  regexp_replace(t2, '${TextAnalysis.phonePattern}', '<PHONE>', 'g')
        |    AS text_clean
        |FROM e""".stripMargin)),

    // Per-host crawl statistics: the fixture corpus carries no URLs, so
    // the entry injects deterministic doc_id-keyed URLs first (13 .org
    // hosts via doc_id%3, 4 CDN hosts via doc_id%5 — some docs carry two
    // URLs, hosts collide across docs); the host extraction + twin host
    // aggregates then do real work, oracle-verified engine-exact.
    Entry(
      "host_stats",
      (s, dir) => {
        val injected = docs(s, dir).select(col("doc_id"), concat(
          col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" see https://h"), (col("doc_id") % 13).cast("string"),
              lit(".example.org/d/"), col("doc_id").cast("string"),
              lit(" ok"))).otherwise(""),
          when(col("doc_id") % 5 === 0,
            concat(lit(" mirror http://cdn"), (col("doc_id") % 4).cast("string"),
              lit(".example-cdn.net/x?y="), col("doc_id").cast("string")))
            .otherwise("")).as("text"))
        graft.text.Curation.hostStats(injected)
      },
      Some(s"""WITH inj AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' see https://h' ||
        |      CAST(doc_id % 13 AS VARCHAR) || '.example.org/d/' ||
        |      CAST(doc_id AS VARCHAR) || ' ok' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' mirror http://cdn' ||
        |      CAST(doc_id % 4 AS VARCHAR) || '.example-cdn.net/x?y=' ||
        |      CAST(doc_id AS VARCHAR) ELSE '' END AS text
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, text,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens
        |  FROM inj),
        |u AS (
        |  SELECT doc_id, n_tokens,
        |    unnest(regexp_extract_all(text, '${TextAnalysis.urlPattern}'))
        |      AS url
        |  FROM t),
        |h AS (
        |  SELECT doc_id, n_tokens,
        |    regexp_extract(url, '${graft.text.Curation.hostPattern}', 1) AS host
        |  FROM u),
        |hu AS (SELECT host, COUNT(*) AS n_urls FROM h GROUP BY host),
        |hd AS (
        |  SELECT host, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS sum_doc_tokens
        |  FROM (SELECT DISTINCT host, doc_id, n_tokens FROM h)
        |  GROUP BY host)
        |SELECT hu.host, hu.n_urls, hd.n_docs, hd.sum_doc_tokens,
        |  round(CAST(hd.sum_doc_tokens AS DOUBLE) /
        |    CAST(hd.n_docs AS DOUBLE), 9) AS tokens_per_doc
        |FROM hu JOIN hd USING (host)""".stripMargin)),

    // URL-frontier canonicalization: inject two spelling variants of the
    // same logical URL (scheme/www/port/case/trailing-slash/utm noise vs
    // the clean form — they MUST collapse to one canonical key) plus a
    // per-doc unique URL; group mentions by canonical form. The oracle
    // replays the full regex normalization chain in DuckDB/RE2.
    Entry(
      "url_frontier",
      (s, dir) => {
        val injected = docs(s, dir).select(col("doc_id"), concat(
          col("text"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" ref http://WWW.Example.org:80/p/"),
              (col("doc_id") % 7).cast("string"), lit("/?utm_source=x&ref="),
              (col("doc_id") % 3).cast("string"), lit("#frag")))
            .otherwise(concat(lit(" ref https://example.org/p/"),
              (col("doc_id") % 7).cast("string"), lit("?ref="),
              (col("doc_id") % 3).cast("string"))),
          when(col("doc_id") % 11 === 0,
            concat(lit(" also https://u"), col("doc_id").cast("string"),
              lit(".example.net/d/"), col("doc_id").cast("string")))
            .otherwise("")).as("text"))
        graft.text.Curation.urlFrontier(injected)
      },
      Some(s"""WITH inj AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' ref http://WWW.Example.org:80/p/' ||
        |      CAST(doc_id % 7 AS VARCHAR) || '/?utm_source=x&ref=' ||
        |      CAST(doc_id % 3 AS VARCHAR) || '#frag'
        |    ELSE ' ref https://example.org/p/' ||
        |      CAST(doc_id % 7 AS VARCHAR) || '?ref=' ||
        |      CAST(doc_id % 3 AS VARCHAR) END ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' also https://u' ||
        |      CAST(doc_id AS VARCHAR) || '.example.net/d/' ||
        |      CAST(doc_id AS VARCHAR) ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(text, '${TextAnalysis.urlPattern}'))
        |      AS url
        |  FROM inj),
        |c AS (
        |  SELECT doc_id, url,
        |    ${graft.text.Curation.canonicalUrlSql("url")} AS canonical_url
        |  FROM u)
        |SELECT canonical_url, COUNT(*) AS n_mentions,
        |  COUNT(DISTINCT url) AS n_variants,
        |  COUNT(DISTINCT doc_id) AS n_docs
        |FROM c GROUP BY canonical_url""".stripMargin)),

    // Deterministic corpus mixing: keep src0:src1:src2:src3 in a 5:3:2:1
    // ratio (other sources dropped), membership a pure function of
    // md5(doc_id) — exact integer boundary arithmetic, verified
    // engine-exact against the same counts-and-units SQL in DuckDB.
    Entry(
      "mix_sources",
      (s, dir) => graft.ops.MixSources.mix(
        docs(s, dir).select("doc_id", "source"), "doc_id", "source",
        Map("src0" -> 5, "src1" -> 3, "src2" -> 2, "src3" -> 1)),
      Some(graft.ops.MixSources.mixSql(
        "documents", "doc_id", "source", Seq("doc_id", "source"),
        Map("src0" -> 5, "src1" -> 3, "src2" -> 2, "src3" -> 1)))),

    // Token-budgeted mixture selection: docs per source in content-hash
    // order until each source's TOKEN budget is reached (how mixtures
    // are really specified), src3 unbudgeted → dropped. The engine runs
    // the sharded two-phase running sum (no one-task-per-source window);
    // the oracle is the single-window definition — hash equality proves
    // the decomposition.
    Entry(
      "token_budget_mix",
      (s, dir) => graft.ops.TokenBudget.select(
        TextAnalysis.stats(docs(s, dir)).select("doc_id", "source", "n_tokens"),
        "doc_id", "source", "n_tokens",
        Map("src0" -> 6000L, "src1" -> 3000L, "src2" -> 1500L)),
      Some(s"""WITH t AS (
        |  SELECT doc_id, source,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${graft.ops.HashSplit.bucketSql("doc_id", 1000)} AS bucket
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY bucket, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS tokens_before,
        |    CASE source WHEN 'src0' THEN 6000 WHEN 'src1' THEN 3000
        |      WHEN 'src2' THEN 1500 END AS budget
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(tokens_before AS BIGINT) AS tokens_before
        |FROM c WHERE budget IS NOT NULL AND tokens_before < budget""".stripMargin)),

    // Bigram-LM fluency score: avg negative log-prob of each document's
    // bigrams under an add-1 model trained on the same corpus. Counts
    // are engine-identical integers; ln values go through DECIMAL(18,9)
    // (order-independent sums) and the average is rounded to 6 dp.
    Entry(
      "lm_score",
      (s, dir) => TextAnalysis.lmScore(docs(s, dir)),
      Some("""WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
        |  FROM documents),
        |pairs AS (
        |  SELECT doc_id, w[g.i] AS w1, w[g.i + 1] AS w2
        |  FROM tok JOIN generate_series(1, 511) AS g(i) ON g.i <= len(w) - 1),
        |c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |        FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |u AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
        |      FROM (SELECT unnest(w) AS t FROM tok)),
        |lp AS (
        |  SELECT p.doc_id,
        |    CAST(ln(CAST(c.c12 + 1 AS DOUBLE) / CAST(c1.c1 + u.v AS DOUBLE))
        |      AS DECIMAL(18,9)) AS lp
        |  FROM pairs p
        |  JOIN c12 c ON p.w1 = c.w1 AND p.w2 = c.w2
        |  JOIN c1 ON p.w1 = c1.w1
        |  CROSS JOIN u)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_nll
        |FROM lp GROUP BY doc_id""".stripMargin)),

    // Deterministic repeat-factor resampling (UP-sampling included):
    // src0 ×2.5, src1 ×1, src2 ×0.4, src3 ×1.75 — multiplicity a pure
    // function of md5(doc_id), exact ppm integer arithmetic on both
    // engines (temperature reweighting materialized into an epoch).
    Entry(
      "resample_sources",
      (s, dir) => graft.ops.Resample.byFactors(
        docs(s, dir).select("doc_id", "source"), "source", "doc_id",
        Map("src0" -> 2500000L, "src1" -> 1000000L,
          "src2" -> 400000L, "src3" -> 1750000L)),
      Some(graft.ops.Resample.byFactorsSql(
        "documents", "doc_id", "source", Seq("doc_id", "source"),
        Map("src0" -> 2500000L, "src1" -> 1000000L,
          "src2" -> 400000L, "src3" -> 1750000L)))),

    // Incremental ingestion dedup: the src0 batch probed against the
    // hash index of the already-accepted corpus (everything else) —
    // corpus text is never re-read, only its persisted 16-byte index.
    Entry(
      "dedup_incremental",
      (s, dir) => {
        val d = docs(s, dir)
        Dedup.incrementalExact(
          d.filter(col("source") === "src0"),
          Dedup.exactIndex(d.filter(col("source") =!= "src0")))
      },
      Some("""WITH batch AS (
        |  SELECT doc_id, md5(text) AS content_md5
        |  FROM documents WHERE source = 'src0'),
        |corpus AS (
        |  SELECT DISTINCT md5(text) AS content_md5
        |  FROM documents WHERE source <> 'src0'),
        |canon AS (
        |  SELECT content_md5, min(doc_id) AS canonical
        |  FROM batch GROUP BY content_md5)
        |SELECT b.doc_id, b.content_md5,
        |  CASE WHEN c.content_md5 IS NOT NULL THEN 'dup_corpus'
        |       WHEN b.doc_id <> canon.canonical THEN 'dup_batch'
        |       ELSE 'new' END AS status
        |FROM batch b
        |JOIN canon ON b.content_md5 = canon.content_md5
        |LEFT JOIN corpus c ON b.content_md5 = c.content_md5""".stripMargin)),

    // Passage-level exact-duplication exposure (Lee et al. 2021: strip
    // repeated passages, not just repeated documents): non-overlapping
    // 3-word chunks, boilerplate = chunk in ≥2 distinct docs, per-doc
    // share. Boilerplate.clean (unit-tested) does the actual removal.
    Entry(
      "boilerplate_ratio",
      (s, dir) => graft.text.Boilerplate.stats(docs(s, dir), p = 3, minDocs = 2),
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, array_to_string(ws[(i*3+1):((i+1)*3)], ' ') AS passage
        |  FROM (SELECT doc_id, ws,
        |          unnest(generate_series(0,
        |            CAST(ceil(len(ws) / 3.0) AS BIGINT) - 1)) AS i
        |        FROM d WHERE len(ws) > 0) t),
        |f AS (SELECT passage, count(DISTINCT doc_id) AS nd
        |      FROM p GROUP BY passage),
        |s AS (
        |  SELECT p.doc_id, count(*) AS n_passages,
        |    SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS n_boilerplate
        |  FROM p JOIN f USING (passage) GROUP BY p.doc_id)
        |SELECT doc_id, CAST(n_passages AS BIGINT) AS n_passages,
        |  CAST(n_boilerplate AS BIGINT) AS n_boilerplate,
        |  round(CAST(n_boilerplate AS DOUBLE) / CAST(n_passages AS DOUBLE), 9)
        |    AS boilerplate_ratio
        |FROM s""".stripMargin)),

    // Boilerplate removal with document reconstruction: strip every
    // corpus-repeated passage and reassemble the survivors in passage
    // order (array_sort over per-doc structs — no window sort). The
    // rewritten TEXT itself is hash-verified, not just the counts.
    Entry(
      "boilerplate_clean",
      (s, dir) => graft.text.Boilerplate.clean(docs(s, dir), p = 3, minDocs = 2),
      Some("""WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, i AS passage_idx,
        |    array_to_string(ws[(i*3+1):((i+1)*3)], ' ') AS passage
        |  FROM (SELECT doc_id, ws,
        |          unnest(generate_series(0,
        |            CAST(ceil(len(ws) / 3.0) AS BIGINT) - 1)) AS i
        |        FROM d WHERE len(ws) > 0) t),
        |f AS (SELECT passage, count(DISTINCT doc_id) AS nd
        |      FROM p GROUP BY passage),
        |k AS (SELECT p.doc_id, p.passage_idx, p.passage
        |      FROM p JOIN f USING (passage) WHERE f.nd < 2)
        |SELECT d0.doc_id,
        |  COALESCE(string_agg(k.passage, ' ' ORDER BY k.passage_idx), '')
        |    AS text_clean
        |FROM (SELECT doc_id FROM documents) d0
        |LEFT JOIN k ON d0.doc_id = k.doc_id
        |GROUP BY d0.doc_id""".stripMargin)),

    // Multimodal plumbing: batched stub feature extraction (rows-only).
    Entry(
      "multimodal_features",
      (s, dir) => {
        val out = graft.multimodal.Multimodal.extractFeatures(
          s, graft.multimodal.Multimodal.syntheticAssets(s, dir))
        out.toDF().select(col("asset_id"), col("media_type"),
          col("n_bytes"), col("n_frames_sampled"))
      },
      None),

    // Frame-sampling plan for the video assets: the exact integer
    // schedule (uniform stride over duration×fps frames, capped at 8,
    // first-frame anchored) the decode fleet consumes — one row per
    // frame to extract. Unlike the stubbed codec, the PLAN is fully
    // hash-verified: retries and re-runs must schedule identical frames
    // or downstream features drift (Multimodal.frameSamplePlan).
    Entry(
      "multimodal_frame_plan",
      (s, dir) => graft.multimodal.Multimodal.frameSamplePlan(
        graft.multimodal.Multimodal.syntheticAssets(s, dir).toDF()
          .filter(col("media_type") === "video")),
      Some("""WITH a AS (
        |  SELECT doc_id AS asset_id, 'video' AS media_type,
        |    CAST(n_chars * 100 AS BIGINT) AS duration_ms
        |  FROM documents WHERE doc_id % 3 = 2),
        |b AS (
        |  SELECT *, GREATEST(1, (duration_ms * 30) // 1000)
        |    AS total_frames
        |  FROM a),
        |c AS (
        |  SELECT *, LEAST(8, total_frames) AS n_samples,
        |    total_frames // LEAST(8, total_frames) AS stride
        |  FROM b)
        |SELECT asset_id, media_type, duration_ms,
        |  CAST(total_frames AS BIGINT) AS total_frames,
        |  CAST(n_samples AS BIGINT) AS n_samples,
        |  CAST(k.k AS BIGINT) AS sample_seq,
        |  CAST(k.k * stride AS BIGINT) AS frame_index
        |FROM c
        |JOIN generate_series(0, 7) AS k(k) ON k.k <= n_samples - 1"""
        .stripMargin)),

    // REAL image decode audit (r10): image assets carry genuine 8×8 gray
    // PNG bytes (pixel(x,y) = (id·31 + x·7 + y·13) mod 256, encoded on
    // executors via javax.imageio), and this query DECODES them back —
    // width, height, exact pixel checksum, channel mean. PNG is lossless,
    // so the oracle recomputes the decoded raster from (asset_id, x, y)
    // alone: hash equality proves the encode→decode roundtrip bit-exact
    // without DuckDB touching a byte. The one multimodal media type whose
    // codec does its real job end-to-end; audio/video stay stubbed
    // (honestly — no codecs in this container).
    Entry(
      "multimodal_image_decode",
      (s, dir) => graft.multimodal.Multimodal.decodeImageMetadata(
        s, graft.multimodal.Multimodal.syntheticAssets(s, dir)),
      Some("""WITH a AS (
        |  SELECT doc_id AS asset_id FROM documents WHERE doc_id % 3 = 0),
        |g AS (SELECT x.range AS x, y.range AS y FROM range(8) x, range(8) y),
        |px AS (
        |  SELECT a.asset_id,
        |    ((a.asset_id % 256) * 31 + g.x * 7 + g.y * 13) % 256 AS v
        |  FROM a CROSS JOIN g)
        |SELECT asset_id, CAST(8 AS BIGINT) AS width,
        |  CAST(8 AS BIGINT) AS height,
        |  CAST(SUM(v) AS BIGINT) AS px_sum,
        |  CAST(COUNT(*) AS BIGINT) AS n_px,
        |  ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
        |    AS mean_px
        |FROM px GROUP BY asset_id""".stripMargin)),

    // Token-weighted sampling without replacement: 10 docs per source,
    // inclusion ∝ n_tokens, membership a pure function of md5(doc_id)
    // (Efraimidis-Spirakis priorities; see ops.WeightedSample). The rank
    // filter pushes into WindowGroupLimit, so map tasks keep local
    // top-10s before the exchange.
    Entry(
      "weighted_sample",
      (s, dir) => graft.ops.WeightedSample.topKPerGroup(
        TextAnalysis.stats(docs(s, dir))
          .select("doc_id", "source", "n_tokens"),
        Seq("source"), "doc_id", "n_tokens", k = 10),
      Some(s"""WITH t AS (
        |  SELECT doc_id, source,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, n_tokens,
        |    ${graft.ops.WeightedSample.prioritySql("doc_id", "n_tokens")}
        |      AS priority
        |  FROM t WHERE n_tokens > 0),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY source ORDER BY priority DESC, doc_id)
        |    AS sample_rank
        |  FROM p)
        |SELECT doc_id, source, n_tokens, priority,
        |  CAST(sample_rank AS BIGINT) AS sample_rank
        |FROM r WHERE sample_rank <= 10""".stripMargin)),

    // The full curation chain as ONE lineage — quality gate → exact-dedup
    // survivors → eval-set decontamination (src3 held out) → per-source
    // token budgets — the end-to-end shape a pre-training data pipeline
    // actually runs, hash-verified against the same chain in DuckDB.
    //
    // Structured for SINGLE-EXPANSION references: DataFrame lineage has
    // no common-subexpression sharing, so the textbook composition
    // (each stage semi-joining the previous stage's frame) re-expands
    // the whole upstream chain at every reference — measured 26
    // document scans / 25 joins for this 4-stage chain. Instead, every
    // stage derives from ONE per-row base projection (quality flags are
    // per-row; canonical and contaminated doc_id KEY SETS are computed
    // once each) and the final pass filters base against the two key
    // sets. Plan: 4 scans of `documents` (base ×3 consumers + the
    // held-out gram side), one content-hash aggregate, one gram-index
    // join, two key-set joins, the budget window — the same exchanges
    // the stages inherently need, nothing re-derived.
    Entry(
      "corpus_pipeline",
      (s, dir) => {
        val d = docs(s, dir)
        // per-row base retaining text (downstream stages need it for the
        // content hash and the gram explode): quality formulas inlined
        // from TextAnalysis.qualityFiltered's defaults, so each reference
        // is exactly one scan + one codegen'd projection
        val t = col("text")
        val nTokens = TextAnalysis.tokensWs(t)
        val nChars = length(t).cast("long")
        val nStop = TextAnalysis.wordHits(t, TextAnalysis.stopwords)
        val avgLen = when(nTokens > 0,
          nChars.cast("double") / nTokens.cast("double")).otherwise(0.0)
        val stopRatio = when(nTokens > 0,
          nStop.cast("double") / nTokens.cast("double")).otherwise(0.0)
        val qd = d
          .select(col("doc_id"), col("source"), t, nTokens.as("n_tokens"),
            (nTokens >= 20 && avgLen <= 12.0 && stopRatio >= 0.0)
              .as("quality_pass"))
          .filter(col("quality_pass"))
        // key set 1: canonical (first doc per content hash, within the
        // quality-passing set)
        val canonIds = Dedup.exact(qd)
          .select(col("canonical_doc_id").as("doc_id"))
        // key set 2: contaminated (per-doc property — computed over the
        // quality set; only canonical members consume the flag). Inlined
        // Curation.decontaminate's gram join, keeping qd referenced ONCE
        // (decontaminate's train-side left join would re-expand it).
        val trainGrams = TextAnalysis
          .wordNgrams(qd.filter(col("source") =!= "src3"), n = 5).distinct()
        val evalGrams = TextAnalysis
          .wordNgrams(d.filter(col("source") === "src3"), n = 5)
          .select("gram").distinct()
        val contamIds = trainGrams.join(evalGrams, Seq("gram"))
          .select("doc_id").distinct()
        val clean = qd.filter(col("source") =!= "src3")
          .select("doc_id", "source", "n_tokens")
          .join(canonIds, Seq("doc_id"), "left_semi")
          .join(contamIds, Seq("doc_id"), "left_anti")
        // Materialize the curated set ONCE before packing (lazy local
        // checkpoint: both of TokenBudget's references — the rows and the
        // per-shard offset frame — share the same computed RDD, so the
        // dedup aggregate and the gram join run once, not twice). The
        // production analogue writes the curated corpus durably here
        // anyway; the packing stage then reads a stable input.
        graft.ops.TokenBudget.select(clean.localCheckpoint(eager = false),
          "doc_id", "source", "n_tokens",
          Map("src0" -> 4000L, "src1" -> 2500L, "src2" -> 1200L))
      },
      Some(s"""WITH st AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${reCount("text", """\b(the|a)\b""")} AS n_stopwords
        |  FROM documents),
        |q AS (
        |  SELECT doc_id FROM st
        |  WHERE n_tokens >= 20
        |    AND CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 12.0
        |    AND CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.0),
        |qd AS (SELECT d.* FROM documents d JOIN q USING (doc_id)),
        |canon AS (
        |  SELECT min(doc_id) AS doc_id FROM qd GROUP BY md5(text)),
        |dd AS (SELECT qd.* FROM qd JOIN canon USING (doc_id)),
        |trw AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM dd WHERE source <> 'src3'),
        |trg AS (
        |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
        |        FROM trw WHERE len(w) >= 5) t),
        |evw AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents WHERE source = 'src3'),
        |evg AS (
        |  SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS gram
        |  FROM (SELECT w, unnest(generate_series(1, len(w) - 4)) AS i
        |        FROM evw WHERE len(w) >= 5) t),
        |contam AS (SELECT DISTINCT trg.doc_id FROM trg JOIN evg USING (gram)),
        |clean AS (
        |  SELECT dd.* FROM dd WHERE source <> 'src3'
        |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |t AS (
        |  SELECT doc_id, source,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${graft.ops.HashSplit.bucketSql("doc_id", 1000)} AS bucket
        |  FROM clean),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY bucket, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |      AS tokens_before,
        |    CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 2500
        |      WHEN 'src2' THEN 1200 END AS budget
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(tokens_before AS BIGINT) AS tokens_before
        |FROM c WHERE budget IS NOT NULL AND tokens_before < budget""".stripMargin)),

    // Shingle-containment near-dup pairs — flags subset duplicates the
    // symmetric Jaccard misses (Dedup.containmentPairs scaladoc); same
    // inverted-index lineage, normalized by the smaller shingle set.
    Entry(
      "dedup_containment",
      (s, dir) => Dedup.containmentPairs(docs(s, dir), n = 5, threshold = 0.8),
      Some(s"""WITH $shingleCtes,
        |sz AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
        |co AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, n_common,
        |  sa.n_shingles AS size_a, sb.n_shingles AS size_b,
        |  CAST(n_common AS DOUBLE)
        |    / CAST(LEAST(sa.n_shingles, sb.n_shingles) AS DOUBLE)
        |    AS containment
        |FROM co
        |JOIN sz sa ON sa.doc_id = doc_a
        |JOIN sz sb ON sb.doc_id = doc_b
        |WHERE CAST(n_common AS DOUBLE)
        |    / CAST(LEAST(sa.n_shingles, sb.n_shingles) AS DOUBLE) >= 0.8
        |""".stripMargin)),

    // BPE merge-candidate counting over the word-frequency table (corpus
    // collapses to the vocab first — Subword scaladoc): top adjacent
    // char pairs by frequency-weighted occurrence count.
    Entry(
      "bpe_pair_merge",
      (s, dir) => graft.text.Subword.bpePairCounts(docs(s, dir), k = 30),
      Some("""WITH wv AS (
        |  SELECT w, count(*) AS n FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w
        |    FROM documents) t
        |  GROUP BY w),
        |wv2 AS (SELECT w, n FROM wv WHERE length(w) >= 2),
        |pairs AS (
        |  SELECT substr(w, i, 2) AS pair, w, n
        |  FROM (SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i
        |        FROM wv2) t)
        |SELECT pair, COUNT(DISTINCT w) AS n_words,
        |  CAST(SUM(n) AS BIGINT) AS weight
        |FROM pairs GROUP BY pair
        |ORDER BY weight DESC, pair LIMIT 30""".stripMargin)),

    // The FULL BPE training loop — 4 merge rounds, each re-counting
    // pairs over the merged symbolization (Subword.bpeTrainMerges:
    // vocab-collapsed state, doubled-separator greedy merge as pure
    // string algebra). The oracle unrolls the identical 4 rounds; hash
    // equality proves count → argmax → merge-application end to end.
    Entry(
      "bpe_train_merges",
      (s, dir) => graft.text.Subword.bpeTrainMerges(docs(s, dir), rounds = 4),
      Some {
        def roundCtes(k: Int): String =
          s"""p$k AS (
             |  SELECT l, r, CAST(SUM(n) AS BIGINT) AS weight
             |  FROM (
             |    SELECT v.n, v.syms[g.i] AS l, v.syms[g.i + 1] AS r
             |    FROM (SELECT n, string_split(s, ' ') AS syms
             |          FROM v${k - 1}) v
             |    JOIN generate_series(1,
             |        ${graft.text.Subword.maxWordChars - 1}) AS g(i)
             |      ON g.i <= len(v.syms) - 1) t
             |  GROUP BY l, r),
             |t$k AS (SELECT l, r, weight FROM p$k
             |        ORDER BY weight DESC, l, r LIMIT 1),
             |v$k AS (
             |  SELECT v.n,
             |    trim(replace(replace(
             |      '  ' || replace(v.s, ' ', '  ') || '  ',
             |      ' ' || t.l || '  ' || t.r || ' ',
             |      ' ' || t.l || t.r || ' '), '  ', ' ')) AS s
             |  FROM v${k - 1} v CROSS JOIN t$k t)""".stripMargin
        s"""WITH words AS (
           |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           |    AS w
           |  FROM documents),
           |v0 AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    trim(regexp_replace(w, '([\\s\\S])', '\\1 ', 'g')) AS s
           |  FROM words
           |  WHERE length(w) <= ${graft.text.Subword.maxWordChars}
           |  GROUP BY w),
           |${roundCtes(1)},
           |${roundCtes(2)},
           |${roundCtes(3)},
           |${roundCtes(4)}
           |SELECT 1 AS round, l AS sym_left, r AS sym_right, weight FROM t1
           |UNION ALL
           |SELECT 2, l, r, weight FROM t2
           |UNION ALL
           |SELECT 3, l, r, weight FROM t3
           |UNION ALL
           |SELECT 4, l, r, weight FROM t4""".stripMargin
      }),

    // BPE encode — apply the 4 merges trained on this corpus to every
    // document (the tokenizer pass that actually touches 100 TB): the
    // corpus collapses to the distinct-word vocab, the merge chain runs
    // per vocab word, per-doc stats come from the doc→word join
    // (Subword.bpeEncodeStats scaladoc). The oracle re-trains the same
    // 4 rounds in SQL with the word carried through the state chain,
    // then encodes from the final state — trainer AND encoder
    // hash-proven in one entry.
    Entry(
      "bpe_encode",
      (s, dir) => {
        val d = docs(s, dir)
        val merges = graft.text.Subword.bpeTrainMerges(d, rounds = 4)
          .orderBy("round").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        graft.text.Subword.bpeEncodeStats(d, merges)
      },
      Some {
        val maxW = graft.text.Subword.maxWordChars
        // trainer rounds with `w` carried through the vocab state
        def roundCtes(k: Int): String =
          s"""p$k AS (
             |  SELECT l, r, CAST(SUM(n) AS BIGINT) AS weight
             |  FROM (
             |    SELECT v.n, v.syms[g.i] AS l, v.syms[g.i + 1] AS r
             |    FROM (SELECT n, string_split(s, ' ') AS syms
             |          FROM v${k - 1}) v
             |    JOIN generate_series(1, ${maxW - 1}) AS g(i)
             |      ON g.i <= len(v.syms) - 1) t
             |  GROUP BY l, r),
             |t$k AS (SELECT l, r, weight FROM p$k
             |        ORDER BY weight DESC, l, r LIMIT 1),
             |v$k AS (
             |  SELECT v.w, v.n,
             |    trim(replace(replace(
             |      '  ' || replace(v.s, ' ', '  ') || '  ',
             |      ' ' || t.l || '  ' || t.r || ' ',
             |      ' ' || t.l || t.r || ' '), '  ', ' ')) AS s
             |  FROM v${k - 1} v CROSS JOIN t$k t)""".stripMargin
        s"""WITH dw AS (
           |  SELECT doc_id,
           |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           |    AS w
           |  FROM documents),
           |v0 AS (
           |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
           |    trim(regexp_replace(w, '([\\s\\S])', '\\1 ', 'g')) AS s
           |  FROM dw
           |  WHERE length(w) <= $maxW
           |  GROUP BY w),
           |${roundCtes(1)},
           |${roundCtes(2)},
           |${roundCtes(3)},
           |${roundCtes(4)},
           |enc AS (
           |  SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_toks
           |  FROM v4)
           |SELECT d.doc_id,
           |  COUNT(*) AS n_words,
           |  CAST(SUM(COALESCE(e.n_toks, 1)) AS BIGINT) AS n_bpe_tokens,
           |  COUNT(CASE WHEN length(d.w) > $maxW THEN 1 END)
           |    AS n_long_words,
           |  ROUND(CAST(SUM(COALESCE(e.n_toks, 1)) AS DOUBLE)
           |    / CAST(COUNT(*) AS DOUBLE), 9) AS fertility
           |FROM dw d LEFT JOIN enc e ON d.w = e.w
           |GROUP BY d.doc_id""".stripMargin
      }),

    // Temperature-balanced multilingual token budgets (alpha = 0.5 →
    // sqrt, the exactly-rounded IEEE op): sampling share ∝ sqrt(p_lang),
    // the standard up-weighting of low-resource languages. sqrt weights
    // quantize to DECIMAL(20,12) before the cross-language sum, so the
    // denominator is combine-order independent; the per-language frame is
    // dimension-sized, so its unpartitioned window sum is free.
    Entry(
      "lang_token_budget",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val st = docs(s, dir).select(col("lang"),
          TextAnalysis.tokensWs(col("text")).as("nt"))
        val langs = st.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("nt")).cast("long").as("tokens"))
        val tot = langs.agg(sum(col("tokens")).cast("long").as("total"))
        langs.crossJoin(broadcast(tot))
          .withColumn("p",
            col("tokens").cast("double") / col("total").cast("double"))
          .withColumn("w", round(sqrt(col("p")), 12).cast("decimal(20,12)"))
          .withColumn("wsum", sum(col("w")).over(
            Window.partitionBy()))
          .select(col("lang"), col("n_docs"), col("tokens"),
            round(col("p"), 9).as("token_share"),
            round(col("w").cast("double") / col("wsum").cast("double"), 9)
              .as("sample_share"),
            floor((col("w").cast("double") / col("wsum").cast("double"))
              * lit(1000000.0)).cast("long").as("budget_tokens"))
      },
      Some(s"""WITH st AS (
        |  SELECT lang, ${reCount("trim(text)", """\S+""")} AS nt
        |  FROM documents),
        |langs AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(nt) AS BIGINT) AS tokens
        |  FROM st GROUP BY lang),
        |tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM langs),
        |p AS (
        |  SELECT lang, n_docs, tokens,
        |    CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE) AS p,
        |    CAST(ROUND(SQRT(CAST(tokens AS DOUBLE) / CAST(total AS DOUBLE)),
        |      12) AS DECIMAL(20,12)) AS w
        |  FROM langs CROSS JOIN tot),
        |ws AS (SELECT *, SUM(w) OVER () AS wsum FROM p)
        |SELECT lang, n_docs, tokens,
        |  ROUND(p, 9) AS token_share,
        |  ROUND(CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE), 9) AS sample_share,
        |  CAST(FLOOR((CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE)) * 1000000.0)
        |    AS BIGINT) AS budget_tokens
        |FROM ws""".stripMargin)),

    // Curriculum staging: global equi-depth quartiles by document length
    // (shortest-first curriculum), per-stage doc and token mass — the
    // total order comes from Ntile.global's range-partitioned rank, not a
    // single-partition window.
    Entry(
      "curriculum_stages",
      (s, dir) => {
        val st = docs(s, dir).select(col("doc_id"),
          TextAnalysis.tokensWs(col("text")).as("n_tokens"))
        graft.ops.Ntile.global(st,
          Seq(col("n_tokens").asc, col("doc_id").asc), 4, "stage")
          .groupBy("stage")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("stage_tokens"),
            min(col("n_tokens")).as("min_tokens"),
            max(col("n_tokens")).as("max_tokens"))
      },
      Some(s"""WITH st AS (
        |  SELECT doc_id, ${reCount("trim(text)", """\S+""")} AS n_tokens
        |  FROM documents),
        |staged AS (
        |  SELECT n_tokens,
        |    CAST(ntile(4) OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
        |      AS stage
        |  FROM st)
        |SELECT stage, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS stage_tokens,
        |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
        |FROM staged GROUP BY stage""".stripMargin)),

    // Dataset datasheet: one long-form artifact with global shape,
    // per-source / per-language composition, dup + quality rates, and
    // tokenizer fertility — one corpus pass, three hash aggregates
    // (DatasetCard scaladoc; the multi-distinct Expand split applies).
    Entry(
      "dataset_card",
      (s, dir) => graft.text.DatasetCard.build(docs(s, dir)),
      Some(s"""WITH st0 AS (
        |  SELECT source, lang,
        |    ${reCount("trim(text)", """\S+""")} AS n_tokens,
        |    ${reCount("text", TextAnalysis.bpePattern)} AS n_bpe,
        |    md5(text) AS h,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    ${reCount("text", """\b(the|a)\b""")} AS n_stop
        |  FROM documents),
        |st AS (
        |  SELECT source, lang, n_tokens, n_bpe, h,
        |    CASE WHEN n_tokens >= 20
        |      AND (CASE WHEN n_tokens > 0
        |        THEN CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |        ELSE 0.0 END) <= 12.0
        |      AND (CASE WHEN n_tokens > 0
        |        THEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |        ELSE 0.0 END) >= 0.0
        |    THEN 1 ELSE 0 END AS q
        |  FROM st0),
        |g1 AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |    CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
        |    CAST(SUM(q) AS BIGINT) AS n_quality,
        |    COUNT(DISTINCT h) AS n_distinct,
        |    COUNT(DISTINCT source) AS n_sources,
        |    COUNT(DISTINCT lang) AS n_langs
        |  FROM st),
        |bs AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        |    COUNT(DISTINCT h) AS nd, CAST(SUM(q) AS BIGINT) AS nq
        |  FROM st GROUP BY source),
        |bl AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        |    CAST(SUM(n_bpe) AS BIGINT) AS bpe
        |  FROM st GROUP BY lang)
        |SELECT 'global' AS section, 'n_docs' AS metric,
        |  CAST(n_docs AS DOUBLE) AS value FROM g1
        |UNION ALL SELECT 'global', 'n_sources', CAST(n_sources AS DOUBLE)
        |  FROM g1
        |UNION ALL SELECT 'global', 'n_langs', CAST(n_langs AS DOUBLE) FROM g1
        |UNION ALL SELECT 'global', 'total_tokens',
        |  CAST(total_tokens AS DOUBLE) FROM g1
        |UNION ALL SELECT 'global', 'dup_rate',
        |  ROUND(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
        |  FROM g1
        |UNION ALL SELECT 'global', 'quality_pass_rate',
        |  ROUND(CAST(n_quality AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
        |  FROM g1
        |UNION ALL SELECT 'global', 'bpe_fertility',
        |  ROUND(CAST(total_bpe AS DOUBLE) / CAST(total_tokens AS DOUBLE), 9)
        |  FROM g1
        |UNION ALL SELECT 'source:' || source, 'n_docs',
        |  CAST(n_docs AS DOUBLE) FROM bs
        |UNION ALL SELECT 'source:' || source, 'tokens',
        |  CAST(tokens AS DOUBLE) FROM bs
        |UNION ALL SELECT 'source:' || source, 'dup_rate',
        |  ROUND(1.0 - CAST(nd AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
        |  FROM bs
        |UNION ALL SELECT 'source:' || source, 'quality_pass_rate',
        |  ROUND(CAST(nq AS DOUBLE) / CAST(n_docs AS DOUBLE), 9) FROM bs
        |UNION ALL SELECT 'lang:' || lang, 'n_docs', CAST(n_docs AS DOUBLE)
        |  FROM bl
        |UNION ALL SELECT 'lang:' || lang, 'tokens', CAST(tokens AS DOUBLE)
        |  FROM bl
        |UNION ALL SELECT 'lang:' || lang, 'bpe_fertility',
        |  ROUND(CAST(bpe AS DOUBLE) / CAST(tokens AS DOUBLE), 9)
        |  FROM bl""".stripMargin)),

    // Rendezvous (highest-random-weight) routing: docs assigned to the
    // 4-worker fleet and to the fleet grown to 5 — per (before, after)
    // cell counts hash-prove both assignments AND the minimal-movement
    // property (keys move only INTO the new worker, ~1/5 of them;
    // Rendezvous scaladoc). Pure per-row column algebra, no shuffle
    // before the tiny report aggregate.
    Entry(
      "rendezvous_routing",
      (s, dir) => {
        val before = Seq("w0", "w1", "w2", "w3")
        val after = before :+ "w4"
        docs(s, dir).select(col("doc_id"),
            graft.ops.Rendezvous.assign(col("doc_id"), before)
              .as("worker_before"),
            graft.ops.Rendezvous.assign(col("doc_id"), after)
              .as("worker_after"))
          .groupBy(col("worker_before"), col("worker_after"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("moved", col("worker_before") =!= col("worker_after"))
      },
      Some {
        // per-worker selects through Rendezvous.weightSql — the oracle
        // renders the SAME weight derivation as the engine column
        def pick(workers: Seq[String], as: String) = {
          val perWorker = workers.map { w =>
            s"""SELECT doc_id, '$w' AS worker,
               |      ${graft.ops.Rendezvous.weightSql("doc_id", w)} AS h
               |    FROM documents""".stripMargin
          }.mkString("\n    UNION ALL ")
          s"""(SELECT doc_id, worker AS $as FROM (
             |  SELECT doc_id, worker,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id
             |      ORDER BY h DESC, worker DESC) AS rn
             |  FROM (
             |    $perWorker) u) t
             | WHERE rn = 1)""".stripMargin
        }
        s"""WITH b AS ${pick(Seq("w0", "w1", "w2", "w3"), "worker_before")},
           |a AS ${pick(Seq("w0", "w1", "w2", "w3", "w4"), "worker_after")}
           |SELECT b.worker_before, a.worker_after, COUNT(*) AS n_docs,
           |  b.worker_before <> a.worker_after AS moved
           |FROM b JOIN a ON b.doc_id = a.doc_id
           |GROUP BY 1, 2""".stripMargin
      }))
}
