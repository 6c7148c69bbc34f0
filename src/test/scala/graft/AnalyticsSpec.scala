package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{BasketPairs, Experiment, Jackknife, KAnon, ModelEval, TargetEncode}

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- BasketPairs.rules -------------------------------------------------

  test("rules: directional confidence from a hand-built basket set") {
    // baskets: {1,2} x3, {1,2,3} x1, {1} x1  → pair (1,2): n_pair=4,
    // n1=5, n2=4. conf(1→2)=4/5, conf(2→1)=1.
    val tx = Seq(
      (10L, 1), (10L, 2), (11L, 1), (11L, 2), (12L, 1), (12L, 2),
      (13L, 1), (13L, 2), (13L, 3), (14L, 1)
    ).toDF("basket_id", "product_id")
    val out = BasketPairs.rules(tx, minSupport = 1, minConf = 0.5, k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(out((1, 2)) == ((4L, 5L, 0.8)))
    assert(out((2, 1)) == ((4L, 4L, 1.0)))
    // (3,1) conf = 1/1 = 1.0 kept; (1,3) conf = 1/5 = 0.2 cut
    assert(out.contains((3, 1)) && !out.contains((1, 3)))
  }

  test("rules: minConf filters and k caps deterministically") {
    val tx = Seq((1L, 1), (1L, 2), (2L, 1), (2L, 3))
      .toDF("basket_id", "product_id")
    val all = BasketPairs.rules(tx, 1, 0.01, 100).collect()
    assert(all.length == 4) // two pairs, both orientations
    val top = BasketPairs.rules(tx, 1, 0.01, 2).collect()
    assert(top.length == 2)
    assert(top.forall(_.getDouble(5) == 1.0)) // the two conf-1 orientations
  }

  // ---- TargetEncode.loo --------------------------------------------------

  test("loo: unsmoothed encoding equals group mean of the other rows") {
    val df = Seq(("a", 1), ("a", 0), ("a", 1), ("b", 0), ("b", 1))
      .toDF("g", "y")
    val out = TargetEncode.loo(df, Seq("g"), "y", m = 0.0)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
    // group a: sum=2,n=3 → y=1: (2-1)/2 = 0.5 ; y=0: 2/2 = 1.0
    assert(out.toSet.contains(("a", 1) -> 0.5))
    assert(out.toSet.contains(("a", 0) -> 1.0))
    // group b: sum=1,n=2 → y=0 → 1/1 = 1 ; y=1 → 0/1 = 0
    assert(out.toSet.contains(("b", 0) -> 1.0))
    assert(out.toSet.contains(("b", 1) -> 0.0))
  }

  test("loo: smoothing pulls singleton groups to the global mean") {
    val df = Seq(("a", 1), ("b", 0), ("c", 1), ("d", 1)).toDF("g", "y")
    val mu = 3.0 / 4.0
    val out = TargetEncode.loo(df, Seq("g"), "y", m = 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // singleton: (sum - y + m*mu)/(0 + m) = mu exactly (sum == y)
    val exp = BigDecimal(mu).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(out.values.forall(_ == exp))
  }

  test("loo: m=0 singleton group yields null, not a silent fallback") {
    val df = Seq(("a", 1)).toDF("g", "y")
    val r = TargetEncode.loo(df, Seq("g"), "y", m = 0.0).head()
    assert(r.isNullAt(r.fieldIndex("te")))
  }

  // ---- Experiment.cuped --------------------------------------------------

  test("cuped: x uncorrelated with arm leaves the effect, cuts nothing wrongly") {
    // construct y = 2x + arm_effect + 0; theta should be ~2 and the
    // adjusted means should collapse the x-driven variance component
    val rows = (1 to 400).map { i =>
      val arm = if (i % 2 == 0) "treatment" else "control"
      // consecutive (control, treatment) pairs share x, so x ⟂ arm
      val x = ((i / 2) % 20).toDouble + 1.0
      val y = 2.0 * x + (if (arm == "treatment") 5.0 else 0.0)
      (arm, x, y)
    }
    val out = Experiment.cuped(rows.toDF("arm", "x", "y"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mean_y_cuped"), r.getAs[Double]("theta"))).toMap
    val (ctl, th) = out("control")
    val (trt, _) = out("treatment")
    // theta recovers the true slope on exactly-linear data
    assert(math.abs(th - 2.0) < 1e-6, s"theta=$th")
    // adjusted difference recovers the true effect
    assert(math.abs((trt - ctl) - 5.0) < 1e-6, s"diff=${trt - ctl}")
  }

  test("cuped: matches a driver-side computation on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 1000).map { i =>
      val arm = if (rnd.nextBoolean()) "treatment" else "control"
      val x = BigDecimal(rnd.nextDouble() * 100)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val y = BigDecimal(rnd.nextDouble() * 100 + x.toDouble * 0.5)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      (arm, x.toDouble, y.toDouble)
    }
    val out = Experiment.cuped(rows.toDF("arm", "x", "y").repartition(7))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("mean_y_cuped"))
      .toMap
    // driver-side referee with exact BigDecimal sums, same closing algebra
    def bd(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val xs = rows.map(r => bd(r._2)); val ys = rows.map(r => bd(r._3))
    val n = rows.size.toDouble
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxy = rows.map(r => bd(r._2) * bd(r._3)).sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val muX = sx / n
    val theta = ((sxy / n) - (sx / n) * (sy / n)) /
      ((sxx / n) - (sx / n) * (sx / n))
    rows.groupBy(_._1).foreach { case (arm, rs) =>
      val an = rs.size.toDouble
      val asx = rs.map(r => bd(r._2)).sum.toDouble
      val asy = rs.map(r => bd(r._3)).sum.toDouble
      val adj = (asy / an) - theta * ((asx / an) - muX)
      val exp = BigDecimal(adj).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(out(arm) == exp, s"$arm: ${out(arm)} != $exp")
    }
  }

  // ---- Jackknife.meanCi --------------------------------------------------

  test("jackknife: constant values give zero-width CI at the true mean") {
    val df = (1 to 200).map(i => (i.toLong, 7.5)).toDF("unit", "v")
    val r = Jackknife.meanCi(df, "unit", "v", g = 10).head()
    assert(r.getAs[Double]("mean") == 7.5)
    assert(r.getAs[Double]("se") == 0.0)
    assert(r.getAs[Double]("ci_lo") == 7.5 && r.getAs[Double]("ci_hi") == 7.5)
  }

  test("jackknife: CI brackets the mean and shrinks with more data") {
    val rnd = new scala.util.Random(5)
    def mk(n: Int) = (1 to n).map(i =>
      (i.toLong, 50.0 + rnd.nextInt(1000) / 100.0)).toDF("unit", "v")
    val small = Jackknife.meanCi(mk(100), "unit", "v").head()
    val big = Jackknife.meanCi(mk(10000), "unit", "v").head()
    Seq(small, big).foreach { r =>
      assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("mean"))
      assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("mean"))
    }
    assert(big.getAs[Double]("se") < small.getAs[Double]("se"))
  }

  test("jackknife: partitioning does not change the result") {
    val df = (1 to 500).map(i => (i.toLong, (i % 37).toDouble))
      .toDF("unit", "v")
    val a = Jackknife.meanCi(df.repartition(1), "unit", "v").head()
    val b = Jackknife.meanCi(df.repartition(13), "unit", "v").head()
    assert(a == b)
  }

  // ---- ModelEval.aucByGroup ----------------------------------------------

  test("aucByGroup: perfect, random, and inverted separators per group") {
    val rows =
      (1 to 50).map(i => ("perfect", i.toDouble, if (i > 25) 1 else 0)) ++
      (1 to 50).map(i => ("anti", i.toDouble, if (i <= 25) 1 else 0)) ++
      (1 to 50).map(i => ("flat", 1.0, i % 2))
    val out = ModelEval.aucByGroup(
      rows.toDF("feature", "value", "purchased").repartition(4),
      Seq("feature"), "value", "purchased")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    assert(out("perfect") == 1.0)
    assert(out("anti") == 0.0)
    assert(out("flat") == 0.5) // all tied → tie-corrected 0.5
  }

  test("aucByGroup matches global auc per group") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 400).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val s = rnd.nextInt(40) / 40.0
      (g, s, if (rnd.nextDouble() < s) 1 else 0)
    }
    val df = rows.toDF("g", "score", "purchased")
    val grouped = ModelEval.aucByGroup(df, Seq("g"), "score", "purchased")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    rows.groupBy(_._1).foreach { case (g, _) =>
      val single = ModelEval.auc(df.filter(col("g") === g), "score",
        "purchased").head().getAs[Double]("auc")
      assert(grouped(g) == single, s"group $g")
    }
  }

  // ---- Corr.pearsonByGroup -----------------------------------------------

  test("pearson: exact ±1 on linear groups, null on constant input") {
    val rows =
      (1 to 30).map(i => ("up", i.toDouble, 2.0 * i + 3)) ++
      (1 to 30).map(i => ("down", i.toDouble, -0.5 * i)) ++
      (1 to 30).map(i => ("const", 5.0, i.toDouble))
    val out = graft.ops.Corr.pearsonByGroup(
      rows.toDF("g", "x", "y").repartition(4), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getAs[Double]("r") == 1.0)
    assert(out("up").getAs[Double]("slope") == 2.0)
    assert(out("down").getAs[Double]("r") == -1.0)
    assert(out("down").getAs[Double]("slope") == -0.5)
    assert(out("const").isNullAt(out("const").fieldIndex("r")))
    assert(out("const").isNullAt(out("const").fieldIndex("slope")))
  }

  test("pearson: partitioning does not change the result") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 600).map { _ =>
      val x = rnd.nextInt(1000) / 10.0
      ("g", x, x * 0.3 + rnd.nextInt(100) / 10.0)
    }
    val df = rows.toDF("g", "x", "y")
    val a = graft.ops.Corr.pearsonByGroup(df.repartition(1), Seq("g"),
      "x", "y").head()
    val b = graft.ops.Corr.pearsonByGroup(df.repartition(11), Seq("g"),
      "x", "y").head()
    assert(a == b)
    val r = a.getAs[Double]("r")
    assert(r > 0.5 && r < 1.0) // positive but noisy by construction
  }

  // ---- KAnon.suppress ----------------------------------------------------

  test("suppress: rare groups roll into __OTHER__ with distinct support") {
    val df = Seq(
      // group (s1,na): units u1,u2,u3 → kept at k=3
      ("s1", "na", "u1", 10.0), ("s1", "na", "u2", 10.0),
      ("s1", "na", "u3", 10.0),
      // rare: (s1,nb) has u1; (s2,na) has u1,u4 — u1 spans both rares
      ("s1", "nb", "u1", 5.0), ("s2", "na", "u1", 5.0),
      ("s2", "na", "u4", 5.0)
    ).toDF("segment", "nation", "unit", "v")
    val out = KAnon.suppress(df, Seq("segment", "nation"), "unit", "v", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("s1", "na")) == ((3L, 30.0)))
    // __OTHER__: distinct units {u1, u4} = 2, NOT 1+2=3
    assert(out(("__OTHER__", "__OTHER__")) == ((2L, 15.0)))
    assert(out.size == 2)
  }

  test("suppress: no rare groups → no __OTHER__ row") {
    val df = Seq(("s", "n", "u1", 1.0), ("s", "n", "u2", 1.0))
      .toDF("segment", "nation", "unit", "v")
    val out = KAnon.suppress(df, Seq("segment", "nation"), "unit", "v", 2)
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "s")
  }

  test("suppress: totals are conserved across suppression") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 300).map { _ =>
      (s"s${rnd.nextInt(3)}", s"n${rnd.nextInt(12)}", s"u${rnd.nextInt(40)}",
        BigDecimal(rnd.nextDouble() * 50)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("segment", "nation", "unit", "v")
    val out = KAnon.suppress(df, Seq("segment", "nation"), "unit", "v", 5)
    val total = out.agg(sum(col("total").cast("decimal(18,4)"))).head()
      .getDecimal(0)
    val expTotal = df.agg(sum(col("v").cast("decimal(18,4)"))).head()
      .getDecimal(0)
    assert(total.compareTo(expTotal) == 0)
  }
}
