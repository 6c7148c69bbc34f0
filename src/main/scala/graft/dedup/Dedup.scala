package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (BASELINE.json
  * north-star): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
  * cosine. Each has a different exactness/scale trade-off; the exact
  * shingle-join path is the oracle-checked baseline, the sketch paths are
  * the 100 TB scale paths (candidate generation without the quadratic
  * pair space).
  */
object Dedup {

  /** Exact dedup: canonical doc per identical content (hash-groupBy).
    * At scale this groups by md5(text) — a single shuffle on a 16-byte
    * key instead of the full text.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"))
      .groupBy("content_md5")
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Incremental dedup of a NEW batch against an accepted-corpus index —
    * the shape a continuously-fed 100 TB pipeline actually runs: the
    * corpus is never re-scanned, only its persisted hash index
    * ([[exactIndex]]) is probed. Every batch doc is labeled
    * `dup_corpus` (content already accepted), `dup_batch` (an earlier
    * doc in this batch has it; the min-doc_id copy is canonical), or
    * `new`. After accepting a batch, the next run's index is
    * `index ∪ exactIndex(accepted)`.
    *
    * Scale: both joins are equi-joins on the 16-byte md5. The index side
    * is the big one — store it bucketed by `content_md5` so the probe
    * shuffles only the batch; the in-batch canonicalization is a
    * map-side-combinable min over the same key.
    */
  def incrementalExact(batch: DataFrame, index: DataFrame): DataFrame = {
    val b = batch.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content_md5"))
    val canon = b.groupBy("content_md5").agg(min(col("doc_id")).as("__canonical"))
    val seen = index.select(col("content_md5")).distinct()
      .withColumn("__in_corpus", lit(true))
    b.join(canon, Seq("content_md5"))
      .join(seen, Seq("content_md5"), "left_outer")
      .select(col("doc_id"), col("content_md5"),
        when(col("__in_corpus"), "dup_corpus")
          .when(col("doc_id") =!= col("__canonical"), "dup_batch")
          .otherwise("new").as("status"))
  }

  /** The persisted corpus-index relation [[incrementalExact]] probes:
    * one row per distinct content hash.
    */
  def exactIndex(docs: DataFrame): DataFrame =
    docs.select(md5(col("text").cast("binary")).as("content_md5")).distinct()

  /** Streaming twin of [[exact]] for ingestion pipelines: first-seen doc
    * per content hash survives, later duplicates are dropped as they
    * arrive. `dropDuplicatesWithinWatermark` bounds the dedup state to
    * the watermark horizon — the standard streaming-ingestion trade
    * (bounded state vs. dedup-forever; re-ingested corpora beyond the
    * horizon fall back to the batch [[exact]] pass). Keyed on the 16-byte
    * md5, so state stores a hash per distinct doc, never the text.
    */
  def exactStream(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_md5", md5(col("text").cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_md5")

  /** Word n-gram shingle set, exploded to (doc_id, shingle) rows — pure
    * column algebra (split + transform + slice, all codegen-friendly).
    * Word shingles carry ~wordLen× fewer rows than character shingles for
    * the same coverage, which directly shrinks the inverted-index join.
    */
  def shingles(docs: DataFrame, n: Int): DataFrame =
    graft.text.TextAnalysis.wordNgrams(docs, n, gramAs = "shingle").distinct()

  /** Exact word-n-gram Jaccard near-dup pairs via a shingle inverted index:
    * explode → self-join on shingle → count common → Jaccard =
    * |∩| / (|A| + |B| − |∩|). This IS the scalable exact algorithm — the
    * join fans out only over docs sharing a shingle (never the full n²
    * pair space), shuffles on the shingle key, and the skew mitigation at
    * 100 TB is dropping ultra-frequent shingles (stop-shingles) before the
    * join, exactly like stopword removal.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 5,
      threshold: Double = 0.5, maxShingleFreq: Option[Int] = None): DataFrame = {
    // No cache: `sh` ends in a distinct() whose Exchange is IDENTICAL in
    // all three consumers (both self-join sides + the size agg), so Spark's
    // exchange reuse computes the shingle shuffle once and the consumers
    // re-read shuffle files. Caching here would pin the exploded shingle
    // set — larger than the corpus itself — behind the caller's back.
    val sh = shingles(docs, n)
    val filtered = maxShingleFreq match {
      case Some(maxF) =>
        val freq = sh.groupBy("shingle").agg(count(lit(1)).as("f"))
          .filter(col("f") <= maxF).select("shingle")
        sh.join(freq, Seq("shingle"), "left_semi")
      case None => sh
    }
    // sizes MUST come from the same (filtered) set the intersection is
    // counted over — sizing from the unfiltered set would deflate the
    // Jaccard whenever stop-shingles are dropped
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val a = filtered.as("a")
    val b = filtered.as("b")
    val common = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "size_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard")
  }

  /** Shingle-containment near-dup pairs: containment
    * `C = |A∩B| / min(|A|, |B|)` flags SUBSET duplicates — a document
    * quoted or embedded whole inside a larger one — which symmetric
    * Jaccard structurally misses (a 100-shingle doc inside a 10,000-
    * shingle doc has J ≈ 0.01 but C = 1.0). The standard complement to
    * [[ngramJaccardPairs]] in a curation stack (Broder's containment,
    * "On the resemblance and containment of documents", 1997).
    *
    * Same single-lineage inverted-index shape as the Jaccard operator —
    * the join fans out only over shared shingles; `maxShingleFreq` is the
    * stop-shingle skew valve. Normalizing by the smaller set keeps the
    * pair canonical (pa < pb) rather than directional.
    */
  def containmentPairs(docs: DataFrame, n: Int = 5,
      threshold: Double = 0.8, maxShingleFreq: Option[Int] = None): DataFrame = {
    val sh = shingles(docs, n)
    val filtered = maxShingleFreq match {
      case Some(maxF) =>
        val freq = sh.groupBy("shingle").agg(count(lit(1)).as("f"))
          .filter(col("f") <= maxF).select("shingle")
        sh.join(freq, Seq("shingle"), "left_semi")
      case None => sh
    }
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val a = filtered.as("a")
    val b = filtered.as("b")
    val common = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "size_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "size_b"), Seq("doc_b"))
      .withColumn("containment",
        col("n_common").cast("double") /
          least(col("size_a"), col("size_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "n_common", "size_a", "size_b", "containment")
  }

  /** MinHash signatures: h_i(doc) = min over shingles of
    * ((a_i * x + b_i) mod p), where x is the shingle's 31-bit base hash.
    * The per-band scale path buckets docs by banded signature so candidate
    * pairs come from bucket joins, not the pair space. The default base
    * hash is md5-derived ([[md5Hash31]]) so signatures AND candidate
    * pairs hash-verify against the DuckDB oracle; [[xxHash31]] is the
    * cheaper Spark-native swap at corpus scale (same structure, engine-
    * specific values).
    */
  /** 31-bit domain keeps a*x+b far below Long.MaxValue (ANSI-safe). */
  val minhashP: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  /** Affine permutation constants — ONE definition shared by the Spark
    * operator and the SQL-oracle renderer, so they cannot drift.
    */
  def affineA(i: Int): Long = (2 * i + 1).toLong
  def affineB(i: Int): Long = 40503L * (i + 1)

  /** Shingle → 31-bit base hash from the md5 prefix (the [[graft.ops
    * .HashSplit]] convention) — engine-reproducible, so the signatures
    * hash-verify against the DuckDB oracle.
    */
  def md5Hash31(c: Column): Column =
    pmod(conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(minhashP))

  /** Spark-native base hash (codegen'd long path, no hex round-trip) —
    * the cheaper swap-in at corpus scale when oracle verification isn't
    * required; same signature/banding structure either way.
    */
  def xxHash31(c: Column): Column = pmod(xxhash64(c), lit(minhashP))

  def minhashSignatures(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
      hasher: Column => Column = md5Hash31): DataFrame = {
    val sh = shingles(docs, n)
      .select(col("doc_id"), hasher(col("shingle")).as("x"))
    val mins = (0 until numHashes).map { i =>
      min(pmod(col("x") * lit(affineA(i)) + lit(affineB(i)), lit(minhashP)))
        .as(s"h$i")
    }
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** The LSH band table — (doc_id, band, bucket), one row per (doc,
    * band) via explode (a union of `bands` selects would re-read and
    * re-aggregate the signature input once per band). Band bucket = md5
    * prefix of the joined band values: fixed-width, engine-reproducible
    * (a native 64-bit hash is the corpus-scale swap, one hash per
    * doc-band — marginal either way). This table IS the persistable
    * near-dup index: `bands` × ~20 bytes per doc, no text.
    */
  def bandTable(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
      bands: Int = 4, hasher: Column => Column = md5Hash31): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes): a remainder would" +
        " silently drop trailing hash functions from every band")
    val sig = minhashSignatures(docs, n, numHashes, hasher)
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { bd =>
      val cols = (bd * rowsPerBand until (bd + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(bd).as("band"),
        substring(md5(concat_ws("|", cols: _*).cast("binary")), 1, 16)
          .as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  /** Incremental near-dup candidates: a NEW batch probed against the
    * accumulated corpus's band index, plus within-batch pairs — the
    * daily-crawl shape of [[incrementalExact]] lifted to NEAR
    * duplicates. The corpus side is its [[bandTable]] — the persisted
    * index in production (bands × ~20 bytes per doc): corpus TEXT is
    * never re-shingled, and the join shuffles the batch's bands against
    * bucket-matched index rows only. Candidates then go to the exact
    * verify of the caller's choice (ngram Jaccard on the candidate doc
    * set), as with [[minhashLshCandidates]].
    */
  def incrementalLshCandidates(corpusIndex: DataFrame, batch: DataFrame,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      hasher: Column => Column = md5Hash31): DataFrame = {
    // the batch's band table feeds THREE join sides (corpus probe +
    // both sides of the within-batch self-join) — checkpoint it so the
    // shingle+minhash lineage runs once, not 3×
    val bb = bandTable(batch, n, numHashes, bands, hasher)
      .localCheckpoint(true)
    // doc_id inequality: a re-crawled doc whose id is ALREADY in the
    // corpus index matches itself on every band — a self-pair the exact
    // verify would score 1.0 and "dedup" the document against itself
    val vsCorpus = bb.as("l")
      .join(corpusIndex.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") =!= col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        lit("corpus").as("vs"))
    val within = bb.as("l")
      .join(bb.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        lit("batch").as("vs"))
    vsCorpus.unionByName(within).distinct()
  }

  /** LSH banding over minhash signatures: docs sharing any band bucket are
    * candidate near-dups; candidates are then verified with exact Jaccard.
    */
  def minhashLshCandidates(docs: DataFrame, n: Int = 3,
      numHashes: Int = 16, bands: Int = 4,
      hasher: Column => Column = md5Hash31): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes): a remainder would" +
        " silently drop trailing hash functions from every band")
    val banded = bandTable(docs, n, numHashes, bands, hasher)
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash sketch width: 60 bits — 15 md5 hex digits, the widest prefix
    * that fits a SIGNED 64-bit integer in both engines (16 digits can
    * overflow a BIGINT cast in the oracle).
    */
  val simhashBits: Int = 60

  /** SimHash: 60-bit sketch — per token hash, each bit position votes
    * +1/−1, sketch bit = sign of the vote sum. Near-dups have small
    * Hamming distance. The md5-derived token hash renders to DuckDB, so
    * sketches AND blocked pairs are hash-verified against the oracle
    * (xxhash64 is the cheaper engine-specific swap at corpus scale).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"),
        conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val bitVotes = (0 until simhashBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val votes = toks.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sketch = (0 until simhashBits).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    votes.select(col("doc_id"), sketch.as("simhash"))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs under a Hamming radius. The full self-join is
    * quadratic; the scale path blocks on sketch prefixes (pigeonhole: one
    * of (radius+1) chunks must match exactly).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    // no cache: the sketch agg's Exchange is identical on both join sides
    // (exchange reuse); the explode emits one row per (doc, chunk) from a
    // single read instead of a 4-way self-union
    val s = simhash(docs)
    val chunks = 4
    val chunkBits = simhashBits / chunks // 15-bit blocks over the 60-bit sketch
    val chunkMask = (1L << chunkBits) - 1L
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * chunkBits).bitwiseAND(chunkMask).as("block"))
    }
    val blocked = s
      .select(col("doc_id"), col("simhash"), explode(array(chunkCols: _*)).as("cb"))
      .select(col("doc_id"), col("simhash"),
        col("cb.chunk").as("chunk"), col("cb.block").as("block"))
    val l = blocked.as("l"); val r = blocked.as("r")
    l.join(r,
        col("l.chunk") === col("r.chunk") && col("l.block") === col("r.block") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        hamming(col("l.simhash"), col("r.simhash")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document repeated-span exposure — the k-gram core of exact
    * substring deduplication (the published training-corpus hygiene
    * pass: long passages recurring across documents are memorization
    * and eval-contamination vectors; reference practice removes or
    * down-weights them). A k-word gram occurring in ≥ `minDocs`
    * DISTINCT documents is a repeated span; a document's exposure is
    * the fraction of its gram POSITIONS (occurrences, not distinct
    * grams) that lie inside repeated spans. Output: doc_id, n_grams,
    * n_repeated, repeated_ratio (9-dp).
    *
    * Scale shape: linear by construction — one explode (positions ∝
    * corpus tokens), two hash aggregations keyed on the gram, one
    * co-partitioned join back. The gram "inverted index" is reduced to
    * (gram, n_docs) immediately — never materialized as postings and
    * never pair-joined, so ultra-frequent boilerplate grams cost one
    * combiner row each instead of a quadratic fan-out (the stop-shingle
    * problem does not arise).
    */
  def repeatedSpans(docs: DataFrame, n: Int = 8,
      minDocs: Int = 2): DataFrame = {
    require(n >= 2 && minDocs >= 2,
      s"repeatedSpans: need n >= 2 and minDocs >= 2, got $n/$minDocs")
    val grams = graft.text.TextAnalysis.wordNgrams(docs, n)
    // per-(doc, gram) occurrence counts; distinct-doc counts derive from
    // them (one row per (doc, gram)) without a second pass over positions
    val perDoc = grams.groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("occ"))
    val repeatedGrams = perDoc.groupBy("gram")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("gram")
    val repeated = perDoc.join(repeatedGrams, Seq("gram"))
      .groupBy("doc_id").agg(sum(col("occ")).as("n_repeated"))
    grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(repeated, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        round(coalesce(col("n_repeated"), lit(0L)).cast("double")
          / col("n_grams").cast("double"), 9).as("repeated_ratio"))
  }

  /** The stored index for [[repeatedSpansIncremental]]: per k-gram, the
    * number of DISTINCT corpus documents containing it. KB-to-GB-sized
    * (one row per distinct gram), gram-keyed — at 100 TB it lives as a
    * gram-bucketed table so the incremental probe co-partitions.
    */
  def repeatedSpanIndex(docs: DataFrame, n: Int = 8): DataFrame =
    graft.text.TextAnalysis.wordNgrams(docs, n)
      .select("doc_id", "gram").distinct()
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))

  /** Incremental twin of [[repeatedSpans]] (the
    * [[incrementalExact]] / [[incrementalLshCandidates]] lifecycle): audit
    * ONLY a new batch against a stored [[repeatedSpanIndex]], never
    * rescanning the corpus. Batch doc ids must be disjoint from the
    * corpus (ingest contract, same as the other incremental ops), so a
    * gram's corpus∪batch doc count is `stored + batch` distinct counts —
    * the result equals the FULL [[repeatedSpans]] over corpus∪batch
    * restricted to batch docs (hash-proven by
    * `dedup_repeated_spans_incremental`). Cost ∝ batch grams: one probe
    * join against the gram-keyed index.
    */
  def repeatedSpansIncremental(index: DataFrame, batch: DataFrame,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    val grams = graft.text.TextAnalysis.wordNgrams(batch, n)
    val perDoc = grams.groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("occ"))
    val repeatedGrams = perDoc.groupBy("gram")
      .agg(count(lit(1)).as("b_docs"))
      .join(index, Seq("gram"), "left_outer")
      .filter(col("b_docs") + coalesce(col("n_docs"), lit(0L)) >= minDocs)
      .select("gram")
    val repeated = perDoc.join(repeatedGrams, Seq("gram"))
      .groupBy("doc_id").agg(sum(col("occ")).as("n_repeated"))
    grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(repeated, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        round(coalesce(col("n_repeated"), lit(0L)).cast("double")
          / col("n_grams").cast("double"), 9).as("repeated_ratio"))
  }
}
