package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.TestGroupState
import graft.streaming.{BudgetAdmission, EventStreams}
import graft.streaming.BudgetAdmission.{Admitted, BState, Doc}

class BudgetAdmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val budgets = Map("web" -> 100L, "code" -> 30L)
  private val docs = Seq(
    Doc(1L, "web", 40L), Doc(2L, "web", 50L), Doc(3L, "web", 20L), // 3 crosses: admitted
    Doc(4L, "web", 10L),                      // over budget: dropped
    Doc(5L, "code", 30L),                     // exactly fills
    Doc(6L, "code", 1L),                      // at boundary: dropped
    Doc(7L, "junk", 5L))                      // unbudgeted source

  private def runSlices(slices: Seq[Seq[Doc]]): Seq[Admitted] = {
    val bySource = slices.flatten.groupBy(_.source).keys
    bySource.toSeq.flatMap { src =>
      var st: Option[BState] = None
      slices.flatMap { slice =>
        val rows = slice.filter(_.source == src)
        val gs = TestGroupState.create[BState](
          st match {
            case Some(s) => org.apache.spark.api.java.Optional.of(s)
            case None => org.apache.spark.api.java.Optional.empty[BState]()
          },
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
          0L, org.apache.spark.api.java.Optional.empty[Long](),
          hasTimedOut = false)
        val out = BudgetAdmission.step(budgets)(src, rows.iterator, gs).toSeq
        if (gs.exists) st = Some(gs.get)
        out
      }
    }
  }

  test("boundary rule: first crossing doc admitted, tap closed after") {
    val got = runSlices(Seq(docs)).map(a => a.doc_id -> a.tokens_before).toMap
    assert(got == Map(1L -> 0L, 2L -> 40L, 3L -> 90L, 5L -> 0L))
  }

  test("admission set is invariant to micro-batch slicing") {
    val oneShot = runSlices(Seq(docs)).toSet
    val sliced = runSlices(Seq(docs.take(2), docs.slice(2, 5), docs.drop(5))).toSet
    val singles = runSlices(docs.map(Seq(_))).toSet
    assert(sliced == oneShot && singles == oneShot)
  }

  test("rejected docs still advance the counter (tap never re-opens)") {
    val tail = Seq(Doc(10L, "code", 50L), Doc(11L, "code", 1L))
    // doc 10 rejected after code filled; doc 11 must NOT slip in
    val got = runSlices(Seq(docs, tail)).filter(_.source == "code")
      .map(_.doc_id).toSet
    assert(got == Set(5L))
  }

  test("streaming run over a file source matches the arrival-order fold") {
    val dir = Files.createTempDirectory("budget-admit").toString
    docs.toDF().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(docs.toDF().schema)
      .parquet(dir)
    EventStreams.runToMemory(
      BudgetAdmission.admitStream(stream, budgets).toDF(), "admitted")
    val got = spark.table("admitted")
      .as[Admitted].collect().map(a => a.doc_id -> a.tokens_before).toMap
    assert(got == Map(1L -> 0L, 2L -> 40L, 3L -> 90L, 5L -> 0L))
  }
}
