package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat", "en", "s"),
    (1L, "el gato y el perro", "es", "s"),
    (2L, "", "en", "s"),
    (3L, "x1 y2, z3!", "en", "s")
  ).toDF("doc_id", "text", "lang", "source")

  test("token counts: whitespace and BPE-ish") {
    val out = TextAnalysis.stats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_tokens") == 6)
    assert(out(2L).getAs[Long]("n_tokens") == 0)
    // "x1 y2, z3!" → x,1,y,2,',',z,3,'!' = 8 BPE-ish tokens
    assert(out(3L).getAs[Long]("n_tokens_bpe") == 8)
    assert(out(3L).getAs[Long]("n_punct") == 2)
  }

  test("stopword ratio and quality gate") {
    val out = TextAnalysis.qualityFiltered(docs, minTokens = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_stopwords") == 2) // two "the"
    assert(out(0L).getAs[Boolean]("quality_pass"))
    assert(!out(2L).getAs[Boolean]("quality_pass")) // empty doc fails min tokens
  }

  test("langId: marker voting picks the right language") {
    val out = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out(0L) == "en")
    assert(out(1L) == "es")
    assert(out(2L) == "und") // no markers at all
  }

  test("repetition: most-frequent-bigram share, short docs excluded") {
    import spark.implicits._
    val d = Seq(
      (10L, "a b a b a"),   // bigrams: "a b","b a","a b","b a" → max 2 of 4
      (11L, "w x y z"),     // all distinct → 1/3
      (12L, "solo")         // < 2 words → excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("repetition_ratio"), r.getAs[Long]("n_grams"))).toMap
    assert(out(10L) == ((0.5, 4L)))
    assert(out(11L) == ((1.0 / 3.0, 3L)))
    assert(!out.contains(12L))
  }

  test("vocabulary: corpus tf/df with deterministic tie-break") {
    val d = Seq(
      (0L, "b a a"),
      (1L, "a b"),
      (2L, "c"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(d, k = 2).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Long]("rank")))
    // a: tf 3 df 2; b: tf 2 df 2; c cut at k=2
    assert(out.toSeq == Seq(("a", 3L, 2L, 1L), ("b", 2L, 2L, 2L)))
    // ties break on the term: equal tf orders alphabetically
    val tied = TextAnalysis.vocabulary(
      Seq((0L, "z y")).toDF("doc_id", "text"), k = 2).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("rank"))
    assert(tied.toSeq == Seq("y" -> 1L, "z" -> 2L))
  }

  test("redactPii: placeholders and counts, pass order respected") {
    val d = Seq(
      (0L, "mail bob.smith+x@corp.example.org or visit https://a.b/c?d=1 soon"),
      (1L, "call 555-123-4567 or 555 123 4567 now"),
      (2L, "digits in url https://x.y/555-123-4567 are not a phone"),
      (3L, "clean text"),
      (4L, null.asInstanceOf[String]),
      (5L, "see http://user@example.com now")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("text_clean") ==
      "mail <EMAIL> or visit <URL> soon")
    assert(out(0L).getAs[Long]("n_emails") == 1L &&
      out(0L).getAs[Long]("n_urls") == 1L)
    assert(out(1L).getAs[String]("text_clean") == "call <PHONE> or <PHONE> now")
    assert(out(1L).getAs[Long]("n_phones") == 2L)
    // the URL pass runs before the phone pass: digits inside a URL are
    // already gone, so they never count as a phone
    assert(out(2L).getAs[String]("text_clean") ==
      "digits in url <URL> are not a phone")
    assert(out(2L).getAs[Long]("n_phones") == 0L)
    assert(out(3L).getAs[String]("text_clean") == "clean text")
    assert(out(4L).isNullAt(out(4L).fieldIndex("text_clean")))
    // the URL pass runs first: userinfo URLs are ONE <URL>, not a torn
    // email — and the audit counts it once, not twice
    assert(out(5L).getAs[String]("text_clean") == "see <URL> now")
    assert(out(5L).getAs[Long]("n_urls") == 1L &&
      out(5L).getAs[Long]("n_emails") == 0L)
  }

  test("lmScore: hand-computed add-1 bigram NLL") {
    val d = Seq(
      (1L, "a b a b"),   // pairs: ab, ba, ab
      (2L, "a b"),       // pairs: ab
      (3L, "solo"),      // < 2 tokens: excluded
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // V = {a, b, solo} = 3 — vocabulary counts ALL token types, including
    // doc 3's unpaired one. c(ab)=3, c(ba)=1, c1(a)=3, c1(b)=1
    // P(b|a)=(3+1)/(3+3)=2/3  P(a|b)=(1+1)/(1+3)=1/2
    // lp rounded to 9dp: -0.405465108, -0.693147181
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == BigDecimal((0.405465108 * 2 + 0.693147181) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L) == ((1L, 0.405465))) // doc 2's only bigram is "a b"
  }

  test("fingerprints: md5 is content-determined") {
    val fp = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("content_md5")).toMap
    assert(fp(0L) != fp(1L))
    assert(fp(0L).length == 32)
    // fingerprint agrees with a reference md5
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("the cat sat on the mat".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp(0L) == expected)
  }

  test("vocabularySampled: exact counts, partitioning-invariant, and " +
      "recall of the exact top-k on the fixture corpus") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextAnalysis.vocabulary(corpus, k = 20).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Long]("rank")))
    val sampled = TextAnalysis.vocabularySampled(corpus, k = 20).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Long]("rank")))
    // tf/df are EXACT global counts (never sample-scaled), so any term in
    // both results must carry identical counts; on this corpus the 30%
    // sample's candidates cover the true top-20 entirely.
    assert(sampled.toSeq == exact.toSeq)
    // membership is a pure function of doc_id content hash → identical
    // result under a different physical partitioning
    val repart = TextAnalysis.vocabularySampled(corpus.repartition(7), k = 20)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Long]("rank")))
    assert(repart.toSeq == sampled.toSeq)
  }
}
