package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Drift

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical distributions: psi = 0, ks = 0") {
    // same values on both sides → pa = pb per bin, cdfs equal
    val rows = for (v <- 0 until 50; base <- Seq(true, false))
      yield ("g", v.toDouble, base)
    val out = Drift.perGroup(rows.toDF("g", "v", "is_base"), Seq("g"), "v",
      col("is_base"), binWidth = 10.0).head()
    assert(out.getAs[Long]("baseline_rows") == 50L)
    assert(out.getAs[Long]("current_rows") == 50L)
    assert(out.getAs[Double]("psi") == 0.0)
    assert(out.getAs[Double]("ks") == 0.0)
  }

  test("fully separated distributions: ks = 1, psi large") {
    val rows = (0 until 100).map(i => ("g", i.toDouble, i < 50))
    // baseline in bins 0-4, current in bins 5-9 (width 10)
    val out = Drift.perGroup(rows.toDF("g", "v", "is_base"), Seq("g"), "v",
      col("is_base"), binWidth = 10.0).head()
    assert(out.getAs[Double]("ks") == 1.0)
    assert(out.getAs[Double]("psi") > 0.25) // far past the alert threshold
  }

  test("matches a direct reimplementation on random grouped data") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 4000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val base = rnd.nextBoolean()
      // current side shifted so drift is non-trivial
      val v = rnd.nextGaussian() * 10 + (if (base) 20.0 else 26.0)
      (g, v, base)
    }
    val w = 4.0
    val got = Drift.perGroup(rows.toDF("g", "v", "is_base").repartition(6),
      Seq("g"), "v", col("is_base"), binWidth = w)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("psi"), r.getAs[Double]("ks"))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val bins = rs.groupBy(r => math.floor(r._2 / w).toLong)
      val sorted = bins.toSeq.sortBy(_._1)
      val na = rs.count(_._3).toDouble; val nb = rs.size - na
      val nbins = bins.size
      var psi = BigDecimal(0); var ks = 0.0
      var cumA = 0L; var cumB = 0L
      sorted.foreach { case (_, brs) =>
        val a = brs.count(_._3).toLong; val b = brs.size - a
        val pa = (a + 1).toDouble / (na + nbins)
        val pb = (b + 1).toDouble / (nb + nbins)
        psi += BigDecimal((pa - pb) * math.log(pa / pb))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        cumA += a; cumB += b
        ks = math.max(ks,
          BigDecimal(math.abs(cumA / na - cumB / nb))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val wantPsi = psi.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(g)._1 - wantPsi) < 1e-9, s"$g psi ${got(g)._1} vs $wantPsi")
      assert(got(g)._2 == ks, s"$g ks ${got(g)._2} vs $ks")
      assert(got(g)._1 > 0.05) // the injected shift is visible
    }
  }

  test("streaming monitor report == batch drift over the same data") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import graft.streaming.{DriftMonitor, EventStreams}
    import graft.features.FeatureTable
    val rnd = new scala.util.Random(31)
    def ev(id: Long, et: String, v: Double) =
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), id % 7, et, v, "")
    val baseline = (1 to 300).map(i =>
      ev(i, s"t${i % 2}", rnd.nextGaussian() * 3 + 10))
    val current = (1 to 400).map(i =>
      ev(i + 1000, s"t${i % 2}", rnd.nextGaussian() * 3 + 13))
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val baseDf = baseline.toDF(cols: _*)
    val curDf = current.toDF(cols: _*)

    val dir = Files.createTempDirectory("drift-stream").toString
    curDf.write.mode("overwrite").parquet(dir)
    val t = FeatureTable(
      Files.createTempDirectory("drift-bins").toString + "/t",
      Seq("event_type", "bin"))
    val cp = Files.createTempDirectory("drift-cp").toString
    DriftMonitor.run(spark, EventStreams.readEvents(spark, dir), t,
      Seq("event_type"), "value", binWidth = 2.0, checkpoint = cp)

    // bin-table state is bounded: ≤ groups × occupied bins, not |stream|
    assert(t.read(spark).count() <= 2L * 40L)
    val baseBins = DriftMonitor.bins(baseDf, Seq("event_type"), "value", 2.0)
    val got = DriftMonitor.report(spark, t, baseBins, Seq("event_type"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val want = graft.ops.Drift.perGroup(
      baseDf.withColumn("ib", lit(true))
        .unionByName(curDf.withColumn("ib", lit(false))),
      Seq("event_type"), "value", col("ib"), binWidth = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == want)
    assert(got.keySet == Set("t0", "t1"))
    assert(got.values.forall(_._3 > 0.05)) // the injected shift registers
  }
}
