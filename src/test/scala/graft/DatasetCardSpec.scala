package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.DatasetCard

class DatasetCardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the a the quick brown fox jumps over the lazy dog again and again and again and again so the a", "en", "src0"),
    (2L, "the a the quick brown fox jumps over the lazy dog again and again and again and again so the a", "en", "src0"),
    (3L, "le chat et le chien", "fr", "src1"),
    (4L, "x", "en", "src1")
  ).toDF("doc_id", "text", "lang", "source")

  test("card: global counts, dup rate, and sections are coherent") {
    val card = DatasetCard.build(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(card(("global", "n_docs")) == 4.0)
    assert(card(("global", "n_sources")) == 2.0)
    assert(card(("global", "n_langs")) == 2.0)
    // docs 1 and 2 are byte-identical → 3 distinct of 4 → dup rate 0.25
    assert(card(("global", "dup_rate")) == 0.25)
    assert(card(("source:src0", "n_docs")) == 2.0)
    assert(card(("source:src0", "dup_rate")) == 0.5)
    assert(card(("source:src1", "dup_rate")) == 0.0)
    assert(card(("lang:fr", "n_docs")) == 1.0)
    // fertility ≥ 1: BPE-ish tokens at least one per whitespace token
    assert(card(("global", "bpe_fertility")) >= 1.0)
  }

  test("card: only doc 1/2 pass the 20-token quality gate") {
    val card = DatasetCard.build(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(card(("global", "quality_pass_rate")) == 0.5)
    assert(card(("source:src1", "quality_pass_rate")) == 0.0)
  }
}
