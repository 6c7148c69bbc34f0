package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Rendezvous

class RendezvousSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = (0L until 2000L).toDF("k")

  test("adding a worker moves keys only INTO it, roughly 1/(n+1)") {
    val before = Seq("w0", "w1", "w2", "w3")
    val after = before :+ "w4"
    val assigned = keys.select(col("k"),
      Rendezvous.assign(col("k"), before).as("b"),
      Rendezvous.assign(col("k"), after).as("a")).collect()
    val moved = assigned.filter(r => r.getString(1) != r.getString(2))
    assert(moved.forall(_.getString(2) == "w4"),
      "movement must only be into the new worker")
    val frac = moved.length.toDouble / assigned.length
    assert(frac > 0.1 && frac < 0.3, s"moved $frac, expected ~0.2")
  }

  test("removing a worker moves only ITS keys (others keep assignment)") {
    val full = Seq("w0", "w1", "w2", "w3")
    val without = Seq("w0", "w1", "w2")
    val assigned = keys.select(col("k"),
      Rendezvous.assign(col("k"), full).as("f"),
      Rendezvous.assign(col("k"), without).as("w")).collect()
    assigned.foreach { r =>
      if (r.getString(1) != "w3") assert(r.getString(1) == r.getString(2))
      else assert(without.contains(r.getString(2)))
    }
  }

  test("assignment is balanced within a loose band") {
    val counts = keys.select(
        Rendezvous.assign(col("k"), Seq("w0", "w1", "w2", "w3")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(counts.size == 4)
    counts.values.foreach(c => assert(c > 300 && c < 700))
  }
}
