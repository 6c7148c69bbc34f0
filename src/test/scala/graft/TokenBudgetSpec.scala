package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{HashSplit, TokenBudget}

class TokenBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(11)
    (1 to 400).map { i =>
      (i.toLong, if (i % 3 == 0) "code" else "web", 10L + rnd.nextInt(90))
    }.toDF("doc_id", "source", "n_tokens")
  }

  test("selection matches the single-window running-sum definition") {
    val got = TokenBudget.select(corpus, "doc_id", "source", "n_tokens",
      Map("web" -> 5000L, "code" -> 1200L))
    val naive = corpus
      .withColumn("__bucket", HashSplit.bucket(col("doc_id"), 1000))
      .withColumn("tokens_before", coalesce(
        sum(col("n_tokens")).over(
          Window.partitionBy("source").orderBy(col("__bucket"), col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__budget",
        when(col("source") === "web", 5000L).otherwise(1200L))
      .filter(col("tokens_before") < col("__budget"))
      .select("doc_id", "source", "n_tokens", "tokens_before")
    assert(got.collect().map(_.toSeq).toSet == naive.collect().map(_.toSeq).toSet)
    // budget actually bites: something kept, something dropped, per source
    val kept = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("web") > 0 && kept("web") < 267)
    assert(kept("code") > 0 && kept("code") < 133)
  }

  test("shard-count invariance: 1, 4, 20 shards select the same set") {
    val budgets = Map("web" -> 3000L, "code" -> 800L)
    def run(sh: Int) = TokenBudget.select(
      corpus, "doc_id", "source", "n_tokens", budgets, shards = sh)
      .select("doc_id", "tokens_before").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(4) && run(4) == run(20))
  }

  test("boundary doc included; unbudgeted sources dropped; zero budget empty") {
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 100L), (3L, "a", 100L),
      (4L, "zzz", 5L)).toDF("doc_id", "source", "n_tokens")
    // budget 150: hash order of {1,2,3}; first doc's before=0 < 150,
    // second doc's before=100 < 150 (crosses the boundary, still kept),
    // third doc's before=200 >= 150 → out.
    val got = TokenBudget.select(df, "doc_id", "source", "n_tokens",
      Map("a" -> 150L))
    assert(got.count() == 2)
    assert(got.filter(col("source") === "zzz").count() == 0)
    assert(TokenBudget.select(df, "doc_id", "source", "n_tokens",
      Map("a" -> 0L)).count() == 0)
  }
}
