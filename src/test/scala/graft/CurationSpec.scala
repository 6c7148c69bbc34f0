package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate: flags exactly the docs sharing an n-gram with eval") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training text here today"),
      (3L, "quick brown fox jumps again and again")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "watch the quick brown fox jumps high")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, n = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // doc 1 shares "the quick brown fox" and "quick brown fox jumps";
    // doc 3 shares only "quick brown fox jumps"; doc 2 shares nothing
    assert(out(1L) == ((2L, true)))
    assert(out(3L) == ((1L, true)))
    assert(out(2L) == ((0L, false)))
    assert(out.size == 3) // every train doc appears, clean ones included
  }

  test("decontaminate: duplicate grams count once per (doc, gram)") {
    val train = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val eval = Seq((9L, "x a b y")).toDF("doc_id", "text")
    val row = Curation.decontaminate(train, eval, n = 2).collect().head
    assert(row.getLong(1) == 1L) // "a b" appears 3x in train, counts once
  }

  test("ngramCommonness: shared grams counted, short doc gets null ratio") {
    val docs = Seq(
      (1L, "a b c d e f"),            // grams: "a b c d e", "b c d e f"
      (2L, "a b c d e zz"),           // shares "a b c d e" with doc 1
      (3L, "p q r s t u"),            // all unique
      (4L, "too short")               // < 5 words: no grams
    ).toDF("doc_id", "text")
    val out = Curation.ngramCommonness(docs, n = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(out(1L)._1 == 2L && out(1L)._2 == 1L &&
      out(1L)._3 == Some(0.5))
    assert(out(2L) == ((2L, 1L, Some(0.5))))
    assert(out(3L) == ((2L, 0L, Some(0.0))))
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("chunk: short doc yields one chunk; empty doc yields one empty chunk") {
    val docs = Seq((1L, "short"), (2L, "")).toDF("doc_id", "text")
    val out = Curation.chunk(docs, chunkSize = 10, overlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(out == Set((1L, 0L, "short"), (2L, 0L, "")))
  }

  test("chunk: strides, overlap, and end clamp reconstruct the document") {
    val text = ('a' to 'z').mkString // 26 chars
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Curation.chunk(docs, chunkSize = 10, overlap = 4)
      .orderBy("chunk_id").collect()
    // stride 6: starts 1,7,13,19,25 → nChunks = 1 + ceil(16/6) = 4? No:
    // 1 + ceil((26-10)/6) = 1 + ceil(16/6) = 1 + 3 = 4 chunks
    assert(rows.length == 4)
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 7L, 13L, 19L))
    assert(rows(0).getString(3) == "abcdefghij")
    assert(rows(1).getString(3) == "ghijklmnop")
    assert(rows(3).getString(3) == "stuvwxyz") // clamped to 8 chars
    assert(rows(3).getLong(4) == 8L)
    // overlap removal reconstructs the original text
    val rebuilt = rows(0).getString(3) +
      rows.drop(1).map(_.getString(3).drop(4)).mkString
    assert(rebuilt == text)
    // exact boundary: a doc of exactly chunkSize chars is one chunk
    val exact = Curation.chunk(Seq((2L, "0123456789")).toDF("doc_id", "text"),
      chunkSize = 10, overlap = 4).collect()
    assert(exact.length == 1)
  }

  test("null text: packed as zero tokens, chunked to nothing, decontaminated clean") {
    val docs = Seq((1L, "s", null: String), (2L, "s", "w w w"))
      .toDF("doc_id", "source", "text")
    val packed = Curation.packSequences(docs, 16, Seq("source"), shards = 1)
      .orderBy("doc_id").collect()
    assert(packed.map(_.getLong(3)).toSeq == Seq(0L, 3L)) // null → 0 tokens
    assert(Curation.chunk(docs, 10, 2).filter(col("doc_id") === 1L).count() == 0)
    val d = Curation.decontaminate(docs, docs.filter(lit(false)), n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 0L)) // null-text doc still reported
  }

  test("pack: sequential fill per stream, offsets and pack ids consistent") {
    // one stream, shards=1: docs of 100 tokens each into ctx=256
    val docs = (1L to 5L).map(i =>
      (i, "s", Seq.fill(100)("w").mkString(" "))).toDF("doc_id", "source", "text")
    val rows = Curation.packSequences(docs, ctxTokens = 256,
      streamCols = Seq("source"), shards = 1)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(3)).toSeq == Seq(100L, 100L, 100L, 100L, 100L))
    // cumulative starts: 0,100,200,300,400 → packs 0,0,0,1,1
    assert(rows.map(r => r.getLong(4)).toSeq == Seq(0L, 0L, 0L, 1L, 1L))
    assert(rows.map(r => r.getLong(5)).toSeq == Seq(0L, 100L, 200L, 44L, 144L))
  }

  test("hostStats: url counts per host, doc stats distinct per doc") {
    val docs = Seq(
      (1L, "intro https://a.example/x more http://b.example/y end"),
      (2L, "again https://a.example/z and https://a.example/w tail"),
      (3L, "no urls at all here"),
      (4L, "port https://a.example:8080/q kept distinct")
    ).toDF("doc_id", "text")
    val out = Curation.hostStats(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    // a.example: 3 urls across docs 1 and 2; whitespace tokens 5 + 5
    assert(out("a.example").getLong(1) == 3L)
    assert(out("a.example").getLong(2) == 2L)
    assert(out("a.example").getLong(3) == 10L)
    assert(out("a.example").getDouble(4) == 5.0)
    assert(out("b.example").getLong(1) == 1L)
    // authority keeps the port → a different host key
    assert(out.contains("a.example:8080"))
    assert(!out.contains(""))
  }

  test("pack: sharding keeps per-shard streams independent and deterministic") {
    val docs = (1L to 40L).map(i =>
      (i, s"src${i % 2}", s"tok$i word$i")).toDF("doc_id", "source", "text")
    val a = Curation.packSequences(docs, 16, Seq("source"), shards = 4)
    val b = Curation.packSequences(docs.repartition(7), 16, Seq("source"), shards = 4)
    assert(a.orderBy("doc_id").collect().toSeq ==
      b.orderBy("doc_id").collect().toSeq) // partitioning-independent
    // within every (source, shard) stream, offsets replay the running sum
    val byStream = a.collect()
      .groupBy(r => (r.getString(1), r.getLong(2)))
    byStream.values.foreach { rs =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(4) == cum / 16 && r.getLong(5) == cum % 16)
        cum += r.getLong(3)
      }
    }
  }

  test("canonicalUrl: normalizes scheme/www/port/case/slash/tracking/fragment") {
    val cases = Seq(
      // every kind of noise at once → clean form (ref= is NOT tracking)
      "HTTP://WWW.Example.org:80/p/3/?utm_source=x&ref=1#frag"
        -> "example.org/p/3?ref=1",
      "https://example.org/p/3?ref=1" -> "example.org/p/3?ref=1",
      "https://example.com/" -> "example.com",
      "http://example.com:443/a" -> "example.com/a",
      "https://Example.com/CaseSensitivePath" -> "example.com/CaseSensitivePath",
      "http://a.com/x?utm_a=1" -> "a.com/x",
      "http://a.com/x?utm_a=1&k=2&utm_b=3" -> "a.com/x?k=2",
      "http://a.com/x?k=2&fbclid=abc" -> "a.com/x?k=2",
      "http://a.com/x?gclid=9" -> "a.com/x",
      "http://a.com//deep//" -> "a.com//deep",
      "http://www.a.com" -> "a.com")
    val got = cases.map(_._1).toDF("url")
      .select(Curation.canonicalUrl(col("url"))).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonicalUrl($in) = $g, want $want")
    }
    // the noisy and clean spellings of the same resource collapse
    assert(got(0) == "example.org/p/3?ref=1" && got(1) == got(0))
  }

  test("urlFrontier groups mentions by canonical form") {
    val docs = Seq(
      (1L, "see http://WWW.A.org/x/?utm_source=s here"),
      (2L, "see https://a.org/x and http://b.net/y"),
      (3L, "see https://a.org/x?utm_b=2 again")).toDF("doc_id", "text")
    val out = Curation.urlFrontier(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("a.org/x") == ((3L, 3L, 3L))) // 3 mentions, 3 raw forms, 3 docs
    assert(out("b.net/y") == ((1L, 1L, 1L)))
    assert(out.size == 2)
  }
}
