package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val nearDup = "the quick brown fox jumps over the lazy dog again and AGAIN"
  private val distinct1 = "completely different content that shares nothing at all here"
  private val docs = Seq(
    (0L, base), (1L, base), (2L, nearDup), (3L, distinct1)
  ).toDF("doc_id", "text")

  test("exact: identical docs collapse to the min doc_id") {
    val out = Dedup.exact(docs).collect()
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("canonical_doc_id") == 0L)
    assert(out.length == 3) // 4 docs, one pair identical
  }

  test("ngram jaccard: identical=1.0, near-dup high, distinct absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 5, threshold = 0.3)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("minhash signatures: identical docs get identical signatures") {
    val sig = Dedup.minhashSignatures(docs, n = 3, numHashes = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until 8).map(i => r.getAs[Long](s"h$i"))).toMap
    assert(sig(0L) == sig(1L))
    assert(sig(0L) != sig(3L))
    // near-dup shares most minhashes (probabilistic but deterministic here)
    val agree = sig(0L).zip(sig(2L)).count { case (a, b) => a == b }
    assert(agree >= 4, s"expected >=4/8 matching minhashes, got $agree")
  }

  test("minhash LSH candidates: finds the planted dup pair, skips distinct") {
    val cand = Dedup.minhashLshCandidates(docs, n = 3, numHashes = 16, bands = 4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(cand.contains((0L, 1L)))
    assert(!cand.contains((0L, 3L)) && !cand.contains((1L, 3L)))
  }

  test("simhash: identical docs → hamming 0; near dup close; distinct far") {
    val s = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(0L), s(1L)) == 0)
    assert(ham(s(0L), s(2L)) < ham(s(0L), s(3L)))
  }

  test("incremental: corpus dups, in-batch dups, and news labeled; accepted batch re-probes as dup_corpus") {
    import spark.implicits._
    val corpus = Seq((100L, "old text")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "old text"),   // already in corpus
      (2L, "fresh text"), // new, canonical in batch
      (3L, "fresh text"), // in-batch dup of 2
      (4L, "other")       // new
    ).toDF("doc_id", "text")
    val idx = Dedup.exactIndex(corpus)
    val got = Dedup.incrementalExact(batch, idx).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "dup_corpus", 2L -> "new",
      3L -> "dup_batch", 4L -> "new"))
    // accept the batch: union its hashes into the index → a re-run of the
    // same batch is all dup_corpus (idempotent ingestion)
    val idx2 = idx.unionByName(Dedup.exactIndex(batch)).distinct()
    val again = Dedup.incrementalExact(batch, idx2).collect()
      .map(_.getString(2)).toSet
    assert(again == Set("dup_corpus"))
  }

  test("incremental LSH: batch probes corpus index + within-batch pairs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again ok"
    val corpus = Seq((100L, base), (101L, "совершенно другой текст здесь"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),                 // near-identical to corpus 100
      (2L, "unrelated words entirely distinct payload nothing shared"),
      (3L, base + " tail")        // near-dup of both 100 and 1
    ).toDF("doc_id", "text")
    val idx = Dedup.bandTable(corpus)
    val got = Dedup.incrementalLshCandidates(idx, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got.contains((1L, 100L, "corpus")))
    assert(got.contains((1L, 3L, "batch")))
    assert(!got.exists { case (a, b, _) => a == 2L || b == 2L })
    // the index never carries text — only (doc_id, band, bucket)
    assert(idx.columns.toSeq == Seq("doc_id", "band", "bucket"))
  }

  test("repeatedSpans: cross-doc grams counted positionally, short docs dropped") {
    // doc 1 and 2 share the 3-gram "a b c" (doc 1 contains it TWICE —
    // positional exposure counts occurrences); doc 3 shares nothing;
    // doc 4 is under 3 words → no grams, no row
    val docs = Seq(
      (1L, "a b c x a b c"),     // grams: abc, bcx, cxa, xab, abc → 5
      (2L, "z a b c z"),         // grams: zab, abc, bcz → 3
      (3L, "p q r s"),           // grams: pqr, qrs → 2
      (4L, "t u")
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.repeatedSpans(docs, n = 3, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((5L, 2L, 0.4)))         // both "a b c" positions
    assert(got(2L) == ((3L, 1L, graft.ops.Round9.round9d(1.0 / 3).doubleValue())))
    assert(got(3L) == ((2L, 0L, 0.0)))
  }

  test("repeatedSpansIncremental equals full recompute restricted to batch") {
    val rng = new scala.util.Random(3)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val all = (0L until 40L).map(i =>
      (i, Seq.fill(12)(vocab(rng.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") < 25)
    val batch = all.filter(col("doc_id") >= 25)
    val idx = graft.dedup.Dedup.repeatedSpanIndex(corpus, n = 3)
    val inc = graft.dedup.Dedup
      .repeatedSpansIncremental(idx, batch, n = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val full = graft.dedup.Dedup.repeatedSpans(all, n = 3, minDocs = 2)
      .filter(col("doc_id") >= 25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc == full)
    assert(inc.nonEmpty)
  }
}
