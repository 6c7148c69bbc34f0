package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Survival

class SurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // classic textbook vector: events at 1, 2 (×2), censored at 2, event
  // at 4, censored at 5 — one group
  private def obs = Seq(
    ("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 1L), ("g", 2L, 0L),
    ("g", 4L, 1L), ("g", 5L, 0L)
  ).toDF("grp", "t", "e")

  test("curve: risk set shrinks by prior removals, censored counted") {
    val c = Survival.curve(obs, Seq("grp"), "t", "e").orderBy("t")
      .select("t", "n_risk", "d_events", "c_censored")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(c == Seq((1L, 6L, 1L, 0L), (2L, 5L, 2L, 1L),
      (4L, 2L, 1L, 0L), (5L, 1L, 0L, 1L)))
  }

  test("kaplanMeier: hand-computed quantized product") {
    val km = Survival.kaplanMeier(obs, Seq("grp"), "t", "e").orderBy("t")
      .select("t", "survival").as[(Long, Double)].collect().toMap
    // S(1) = 5/6 → 0.833333333; S(2) = S(1)·(3/5) = 0.5 (exactly
    // 0.4999999998 → 0.5? 0.833333333 × 0.6 = 0.4999999998 → 0.5 at 9dp)
    assert(km(1L) == 0.833333333)
    assert(km(2L) == 0.5)
    // S(4) = 0.5 × (1 − 1/2) = 0.25; S(5) unchanged (censor only)
    assert(km(4L) == 0.25)
    assert(km(5L) == 0.25)
  }

  test("absorbing step zeroes the tail without special-casing") {
    val o = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 2L, 1L))
      .toDF("grp", "t", "e") // at t=2, d=2=n → factor 0
    val km = Survival.kaplanMeier(o, Seq("grp"), "t", "e")
      .select("t", "survival").as[(Long, Double)].collect().toMap
    assert(km(2L) == 0.0)
  }

  test("curves are non-increasing within each group") {
    val multi = obs.unionAll(
      Seq(("h", 3L, 1L), ("h", 3L, 0L), ("h", 7L, 1L))
        .toDF("grp", "t", "e"))
    val rows = Survival.kaplanMeier(multi, Seq("grp"), "t", "e")
      .orderBy("grp", "t")
      .select("grp", "survival").as[(String, Double)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.map(_._2)
      assert(s.zip(s.tail).forall { case (a, b) => b <= a })
      assert(s.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("driver fold guard: data-sized curve fails loudly, bounded one runs") {
    // 30 distinct (group, time) curve points
    val wide = (0 until 30).map(i => (s"g$i", (i + 1).toLong, 1L))
      .toDF("grp", "t", "e")
    val ex = intercept[IllegalArgumentException] {
      Survival.kaplanMeier(wide, Seq("grp"), "t", "e", driverLimit = 10L)
    }
    assert(ex.getMessage.contains("curve-point-sized"), ex.getMessage)
    assert(Survival.kaplanMeier(wide, Seq("grp"), "t", "e",
      driverLimit = 30L).count() == 30L)
  }
}
