package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Causal, Drift, Screen, ShapleyAttribution}

class CausalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- ipwStratified -------------------------------------------------

  test("ipw: recovers a zero effect the naive pooled difference misses") {
    // stratum a: y = 10 for everyone; stratum b: y = 100 for everyone —
    // treatment has NO effect, but b is mostly treated and a mostly not,
    // so the pooled treated mean is pulled up by composition alone
    val rows =
      (1 to 8).map(i => ("a", if (i <= 2) 1 else 0, 10.0)) ++
      (1 to 8).map(i => ("b", if (i <= 6) 1 else 0, 100.0))
    val out = Causal.ipwStratified(rows.toDF("stratum", "treated", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("effect") == 0.0)
    assert(out("b").getAs[Double]("effect") == 0.0)
    assert(out("__all__").getAs[Double]("effect") == 0.0)
    // the confounding is real: pooled naive difference is way off zero
    val naive = (2 * 10.0 + 6 * 100.0) / 8 - (6 * 10.0 + 2 * 100.0) / 8
    assert(naive > 40.0)
    assert(out("__all__").getAs[Long]("n") == 16L)
    assert(out("__all__").getAs[Long]("n_treat") == 8L)
    assert(out("a").getAs[Double]("e_hat") == 0.25)
  }

  test("ipw: nonzero per-stratum effects aggregate size-weighted") {
    // stratum a (n=4): effect +2; stratum b (n=12): effect -1
    val rows =
      Seq(("a", 1, 12.0), ("a", 1, 12.0), ("a", 0, 10.0), ("a", 0, 10.0)) ++
      (1 to 6).map(_ => ("b", 1, 9.0)) ++ (1 to 6).map(_ => ("b", 0, 10.0))
    val out = Causal.ipwStratified(rows.toDF("stratum", "treated", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("effect") == 2.0)
    assert(out("b").getAs[Double]("effect") == -1.0)
    // ATE = (4/16)*2 + (12/16)*(-1) = 0.5 - 0.75 = -0.25
    assert(out("__all__").getAs[Double]("effect") == -0.25)
  }

  test("ipw: one-armed stratum gets null means and is excluded from ATE") {
    val rows = Seq(("a", 1, 5.0), ("a", 0, 5.0), ("only_t", 1, 99.0))
    val out = Causal.ipwStratified(rows.toDF("stratum", "treated", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("only_t").isNullAt(out("only_t").fieldIndex("mean_ctrl")))
    assert(out("__all__").getAs[Double]("effect") == 0.0)
  }

  // ---- matchedAtt ----------------------------------------------------

  test("matched ATT: nearest control, tie prefers the <= side") {
    val rows = Seq(
      // (id, stratum, treated, x, y)
      (1L, "s", 0, 10.0, 100.0),
      (2L, "s", 0, 20.0, 200.0),
      (3L, "s", 1, 14.0, 150.0), // nearer 10 → match y=100, diff  50
      (4L, "s", 1, 15.0, 150.0), // tie 5/5  → prefer ≤ → 100, diff 50
      (5L, "s", 1, 5.0, 80.0),   // nothing below → next → 100, diff -20
      (6L, "t", 1, 1.0, 1.0))    // stratum with no controls → unmatched
    val out = Causal.matchedAtt(rows.toDF("id", "stratum", "treated", "x", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s").getAs[Long]("n_treated") == 3L)
    assert(out("s").getAs[Long]("n_matched") == 3L)
    // (50 + 50 - 20) / 3 — raw IEEE division, no rounding step
    assert(out("s").getAs[Double]("att") == 80.0 / 3)
    assert(out("t").getAs[Long]("n_matched") == 0L)
    assert(out("t").isNullAt(out("t").fieldIndex("att")))
    assert(out("__all__").getAs[Long]("n_treated") == 4L)
    assert(out("__all__").getAs[Long]("n_matched") == 3L)
  }

  test("matched ATT: matching is with replacement") {
    // one control, three treated — all three take it
    val rows = Seq(
      (1L, "s", 0, 10.0, 7.0),
      (2L, "s", 1, 9.0, 10.0), (3L, "s", 1, 11.0, 14.0),
      (4L, "s", 1, 30.0, 27.0))
    val out = Causal.matchedAtt(rows.toDF("id", "stratum", "treated", "x", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    // diffs: 3, 7, 20 → mean 10
    assert(out("s").getAs[Double]("att") == 10.0)
  }

  // ---- upliftQini ----------------------------------------------------

  test("qini: matches a direct reimplementation on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { id =>
      val t = rnd.nextInt(2)
      val score = rnd.nextInt(1000).toDouble
      // genuine uplift at high scores: treated convert more
      val p = if (t == 1 && score > 500) 0.6 else 0.3
      (id, t, score, if (rnd.nextDouble() < p) 1 else 0)
    }
    val got = Causal.upliftQini(
      rows.toDF("id", "treated", "score", "converted").repartition(7))
      .collect().map(r => r.getAs[Long]("decile") -> r).toMap
    // reference: ntile(10) over (score desc, id) then cumulative counts
    val ranked = rows.sortBy(r => (-r._3, r._1))
    val n = ranked.size; val ss = n / 10; val nb = n % 10
    val deciles = ranked.zipWithIndex.map { case (r, i) =>
      val rank = i + 1
      val d = if (rank <= nb * (ss + 1)) (rank - 1) / (ss + 1)
        else nb + (rank - nb * (ss + 1) - 1) / ss
      (d + 1, r)
    }
    var cnt = (0L, 0L, 0L, 0L) // nt, nc, ct, cc
    (1 to 10).foreach { d =>
      val rs = deciles.filter(_._1 == d).map(_._2)
      val nt = rs.count(_._2 == 1).toLong
      val nc = rs.size - nt
      val ct = rs.count(r => r._2 == 1 && r._4 == 1).toLong
      val cc = rs.count(r => r._2 == 0 && r._4 == 1).toLong
      cnt = (cnt._1 + nt, cnt._2 + nc, cnt._3 + ct, cnt._4 + cc)
      val expQini =
        (cnt._3 * cnt._2 - cnt._4 * cnt._1).toDouble / cnt._2.toDouble
      assert(got(d.toLong).getAs[Double]("qini") == expQini, s"decile $d")
      assert(got(d.toLong).getAs[Long]("n") == rs.size.toLong)
    }
    // top decile of a genuinely-uplifted score should carry positive qini
    assert(got(1L).getAs[Double]("qini") > 0.0)
  }

  // ---- Drift.exactKs -------------------------------------------------

  test("exact KS: identical samples → 0, disjoint samples → 1") {
    val same = (1 to 50).flatMap(v => Seq((v.toDouble, true), (v.toDouble, false)))
    val r0 = Drift.exactKs(same.toDF("value", "is_a"), "value", col("is_a"))
      .head()
    assert(r0.getAs[Double]("ks") == 0.0)
    val apart = (1 to 50).map(v => (v.toDouble, true)) ++
      (51 to 100).map(v => (v.toDouble, false))
    val r1 = Drift.exactKs(apart.toDF("value", "is_a"), "value", col("is_a"))
      .head()
    assert(r1.getAs[Double]("ks") == 1.0)
    assert(r1.getAs[Double]("ks_at") == 50.0) // sup first attained at a's max
  }

  test("exact KS: matches a direct reimplementation, unequal sizes") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map { _ =>
      val a = rnd.nextInt(3) > 0 // ~2:1 sizes
      val v = math.round((rnd.nextGaussian() * 5 +
        (if (a) 0.0 else 1.5)) * 100) / 100.0
      (v, a)
    }
    val got = Drift.exactKs(rows.toDF("value", "is_a").repartition(11),
      "value", col("is_a")).head()
    val na = rows.count(_._2).toLong; val nb = rows.size - na
    val byV = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var ca = 0L; var cb = 0L; var best = BigInt(0); var at = Double.NaN
    byV.foreach { case (v, rs) =>
      ca += rs.count(_._2); cb += rs.size - rs.count(_._2)
      val gap = (BigInt(ca) * nb - BigInt(cb) * na).abs
      if (gap > best) { best = gap; at = v }
    }
    assert(got.getAs[Long]("n_a") == na && got.getAs[Long]("n_b") == nb)
    assert(got.getAs[Double]("ks") ==
      best.toDouble / (BigInt(na) * BigInt(nb)).toDouble)
    assert(got.getAs[Double]("ks_at") == at)
  }

  // ---- Screen.chi2 ---------------------------------------------------

  test("chi2: hand-checked table, independence → 0, degenerate → null") {
    val mk = (f: Int, l: Int, n: Int) => Seq.fill(n)(("x", f, l))
    // dependent feature: a=30 b=10 c=10 d=50
    val dep = mk(1, 1, 30) ++ mk(1, 0, 10) ++ mk(0, 1, 10) ++ mk(0, 0, 50)
    // independent: a=20 b=20 c=30 d=30 → ad = bc → chi2 = 0
    val ind = (mk(1, 1, 20) ++ mk(1, 0, 20) ++ mk(0, 1, 30) ++ mk(0, 0, 30))
      .map { case (_, f, l) => ("y", f, l) }
    // degenerate: label constant → (a+b)(c+d)(a+c)(b+d) has a zero margin
    val deg = (mk(1, 1, 5) ++ mk(0, 1, 5)).map { case (_, f, l) => ("z", f, l) }
    val out = Screen.chi2((dep ++ ind ++ deg).toDF("feature", "f", "label"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = 100.0; val adbc = 30.0 * 50 - 10.0 * 10
    val den = 40.0 * 60 * 40 * 60
    assert(out("x").getAs[Double]("chi2") == n * adbc * adbc / den)
    assert(out("x").getAs[Double]("cramers_v")
      == math.sqrt(adbc * adbc / den))
    assert(out("y").getAs[Double]("chi2") == 0.0)
    assert(out("z").isNullAt(out("z").fieldIndex("chi2")))
    assert(out("x").getAs[Long]("n_f1_l1") == 30L)
  }

  // ---- Experiment.proportionTest ---------------------------------------

  test("proportion test: hand-checked z, Wilson bounds, MDE") {
    val rows = (1 to 100).map(i => ("control", if (i <= 30) 1 else 0)) ++
      (1 to 100).map(i => ("treatment", if (i <= 40) 1 else 0))
    val out = graft.ops.Experiment.proportionTest(
      rows.toDF("arm", "converted")).head()
    assert(out.getAs[Long]("n_c") == 100L && out.getAs[Long]("conv_t") == 40L)
    assert(out.getAs[Double]("p_ctrl") == 0.3)
    assert(out.getAs[Double]("diff") == 0.4 - 0.3)
    val pp = 70.0 / 200.0; val invN = 1.0 / 100 + 1.0 / 100
    assert(out.getAs[Double]("z_stat") ==
      (0.4 - 0.3) / math.sqrt(pp * (1.0 - pp) * invN))
    // Wilson lower bound for control, same association as the operator
    val z = 1.96; val p = 0.3; val n = 100.0
    val lo = (p + z * z / (2.0 * n)
      - z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))) /
      (1.0 + z * z / n)
    assert(out.getAs[Double]("ctrl_lo") == lo)
    assert(out.getAs[Double]("ctrl_lo") < 0.3 &&
      out.getAs[Double]("ctrl_hi") > 0.3)
    assert(out.getAs[Double]("mde") ==
      (1.96 + 0.8416) * math.sqrt(pp * (1.0 - pp) * invN))
  }

  // ---- Screen.mutualInfo -----------------------------------------------

  test("mutual info: perfect dependence → ln2, independence → 0") {
    val mk = (g: String, f: Int, l: Int, n: Int) => Seq.fill(n)((g, f, l))
    val perfect = mk("p", 1, 1, 50) ++ mk("p", 0, 0, 50)
    val indep = mk("i", 1, 1, 25) ++ mk("i", 1, 0, 25) ++
      mk("i", 0, 1, 25) ++ mk("i", 0, 0, 25)
    val degenerate = mk("z", 1, 1, 5) ++ mk("z", 0, 1, 5) // label constant
    val out = graft.ops.Screen.mutualInfo(
      (perfect ++ indep ++ degenerate).toDF("feature", "f", "label"))
      .collect().map(r => r.getString(0) -> r).toMap
    // each 0.5·ln2 term quantizes to 9 dp before the exact sum
    val halfLn2q = BigDecimal(0.5 * math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("p").getAs[Double]("mi") == 2 * halfLn2q)
    assert(out("p").getAs[Double]("nmi") == 1.0)
    assert(out("i").getAs[Double]("mi") == 0.0)
    assert(out("i").getAs[Double]("nmi") == 0.0)
    assert(out("i").getAs[Double]("h_label") == 2 * halfLn2q)
    assert(out("z").getAs[Double]("mi") == 0.0)
    assert(out("z").getAs[Double]("h_label") == 0.0)
    assert(out("z").isNullAt(out("z").fieldIndex("nmi")))
  }

  // ---- Screen.woeIv ----------------------------------------------------

  test("woe/iv: hand-checked smoothed table; independence → iv ~ 0") {
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mk = (g: String, f: Int, l: Int, n: Int) => Seq.fill(n)((g, f, l))
    val dep = mk("x", 1, 1, 30) ++ mk("x", 1, 0, 10) ++
      mk("x", 0, 1, 10) ++ mk("x", 0, 0, 50)
    val ind = mk("i", 1, 1, 20) ++ mk("i", 1, 0, 20) ++
      mk("i", 0, 1, 30) ++ mk("i", 0, 0, 30)
    val out = graft.ops.Screen.woeIv((dep ++ ind).toDF("feature", "f", "label"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s1a = 30.5 / 41.0; val s0b = 10.5 / 61.0
    val s1c = 10.5 / 41.0; val s0d = 50.5 / 61.0
    val w1 = q9(math.log(s1a / s0b)); val w0 = q9(math.log(s1c / s0d))
    assert(out("x").getAs[Double]("woe_f1") == w1)
    assert(out("x").getAs[Double]("woe_f0") == w0)
    assert(out("x").getAs[Double]("iv") ==
      BigDecimal(q9((s1a - s0b) * w1)) .bigDecimal
        .add(BigDecimal(q9((s1c - s0d) * w0)).bigDecimal).doubleValue)
    assert(out("x").getAs[Double]("iv") > 0.5) // strong dependence
    assert(math.abs(out("i").getAs[Double]("iv")) < 0.01)
  }

  // ---- SeriesStats -----------------------------------------------------

  test("acf: alternating series — negative at lag 1, positive at lag 2") {
    val series = (0L until 40L).map(t => (t, 10.0 + (t % 2)))
    val out = graft.ops.SeriesStats.acf(series.toDF("t", "x"), maxLag = 4)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    // direct reimplementation in exact integers (1e-4 units)
    val ix = series.map { case (t, x) =>
      t -> BigInt(math.round(x * 10000)) }.toMap
    val n = BigInt(series.size)
    val sx = ix.values.sum; val ssq = ix.values.map(v => v * v).sum
    (1 to 4).foreach { k =>
      val ts = series.map(_._1).filter(t => ix.contains(t + k))
      val m = BigInt(ts.size)
      val c = ts.map(t => ix(t) * ix(t + k)).sum
      val s1 = ts.map(ix).sum; val s2 = ts.map(t => ix(t + k)).sum
      val exp = (m * c - s1 * s2).toDouble / (n * ssq - sx * sx).toDouble
      assert(out(k).getAs[Double]("acf") == exp, s"lag $k")
      assert(out(k).getAs[Long]("n_pairs") == ts.size.toLong)
    }
    assert(out(1).getAs[Double]("acf") < -0.9)
    assert(out(2).getAs[Double]("acf") > 0.9)
  }

  test("changepoint: finds the exact step in a level-shifted series") {
    val series = (0L until 20L).map(t => (t, 10.0)) ++
      (20L until 40L).map(t => (t, 30.0))
    val out = graft.ops.SeriesStats.changepoint(series.toDF("t", "x")).head()
    assert(out.getAs[Long]("t_split") == 20L)
    assert(out.getAs[Long]("split_t_value") == 19L)
    assert(out.getAs[Double]("mean_before") == 10.0)
    assert(out.getAs[Double]("mean_after") == 30.0)
    // T² at the true split: (n·S_t − t·S_n)²/(n·t·(n−t)) / 1e8
    val st = BigInt(20) * 100000; val sn = st + BigInt(20) * 300000
    val a = BigInt(40) * st - BigInt(20) * sn
    val exp = (a * a).toDouble / (BigInt(40) * 20 * 20).toDouble / 1.0e8
    assert(out.getAs[Double]("tsq") == exp)
  }

  // ---- Conformal ---------------------------------------------------------

  test("conformal: hand-checked calibration quantile and coverage") {
    // train fixes mu = 10; cal residuals are exactly 1..10 → with
    // alpha = 10%, k = ceil(11 * 0.9) = 10 → q = 10
    val train = (1 to 5).map(i => (s"tr$i", "s", "train", 10.0))
    val cal = (1 to 10).map(i => (s"c$i", "s", "cal", 10.0 + i))
    val test = Seq(("t1", "s", "test", 15.0), ("t2", "s", "test", 0.5),
      ("t3", "s", "test", 22.0)) // residuals 5, 9.5, 12 → last uncovered
    val out = graft.ops.Conformal.splitConformal(
      (train ++ cal ++ test).toDF("id", "stratum", "split", "y"),
      alphaPct = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s").getAs[Double]("q_resid") == 10.0)
    assert(out("s").getAs[Long]("n_test") == 3L)
    assert(out("s").getAs[Long]("covered") == 2L)
    assert(out("__all__").getAs[Double]("coverage") == 2.0 / 3)
  }

  test("conformal: ~1-alpha coverage on exchangeable data") {
    val rnd = new scala.util.Random(99)
    val rows = (1 to 4000).map { i =>
      val split = i % 10 match {
        case x if x < 6 => "train"; case x if x < 8 => "cal"
        case _ => "test"
      }
      (s"u$i", s"s${i % 3}", split, 100.0 + rnd.nextGaussian() * 15)
    }
    val out = graft.ops.Conformal.splitConformal(
      rows.toDF("id", "stratum", "split", "y").repartition(9), alphaPct = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val cov = out("__all__").getAs[Double]("coverage")
    assert(cov >= 0.86 && cov <= 0.96, s"coverage $cov out of band")
  }

  test("CMH: hand-computed two-stratum chi2 and MH odds ratio") {
    // stratum s1: a=8 b=2 c=5 d=5 (n_t=10, n_c=10, n=20)
    //   E = 10*13/20 = 6.5; V = 10*10*13*7/(400*19) = 9100/7600
    //   R = 8*5/20 = 2.0; S = 2*5/20 = 0.5
    // stratum s2: a=3 b=7 c=1 d=9 (n=20)
    //   E = 10*4/20 = 2.0; V = 10*10*4*16/(400*19) = 6400/7600
    //   R = 3*9/20 = 1.35; S = 7*1/20 = 0.35
    // sum_a = 11, E = 8.5, V = 15500/7600; chi2 = 6.25/V; OR = 3.35/0.85
    def rows(st: String, arm: String, conv: Int, k: Int) =
      Seq.fill(k)((st, arm, conv))
    val units = (
      rows("s1", "treatment", 1, 8) ++ rows("s1", "treatment", 0, 2) ++
        rows("s1", "control", 1, 5) ++ rows("s1", "control", 0, 5) ++
        rows("s2", "treatment", 1, 3) ++ rows("s2", "treatment", 0, 7) ++
        rows("s2", "control", 1, 1) ++ rows("s2", "control", 0, 9)
      ).toDF("stratum", "arm", "converted")
    val out = graft.ops.Experiment.cmhStratified(units).head()
    assert(out.getAs[Long]("n_strata") == 2L)
    assert(out.getAs[Long]("n_strata_used") == 2L)
    assert(out.getAs[Long]("sum_a") == 11L)
    assert(math.abs(out.getAs[Double]("expected_a") - 8.5) < 1e-8)
    val v = 15500.0 / 7600.0
    assert(math.abs(out.getAs[Double]("cmh_chi2") - 6.25 / v) < 1e-6,
      s"chi2 ${out.getAs[Double]("cmh_chi2")}")
    assert(math.abs(out.getAs[Double]("or_mh") - 3.35 / 0.85) < 1e-6,
      s"or ${out.getAs[Double]("or_mh")}")
  }

  test("CMH: immune to the Simpson composition artifact the pooled test shows") {
    // Within each stratum treatment is EXACTLY null (same rate as
    // control), but treatment is concentrated in the high-rate stratum —
    // the pooled 2x2 shows a strong spurious effect, CMH shows none.
    def rows(st: String, arm: String, conv: Int, k: Int) =
      Seq.fill(k)((st, arm, conv))
    val units = (
      // high stratum: rate 0.8 both arms; treatment-heavy (80 vs 20)
      rows("hi", "treatment", 1, 64) ++ rows("hi", "treatment", 0, 16) ++
        rows("hi", "control", 1, 16) ++ rows("hi", "control", 0, 4) ++
        // low stratum: rate 0.2 both arms; control-heavy (20 vs 80)
        rows("lo", "treatment", 1, 4) ++ rows("lo", "treatment", 0, 16) ++
        rows("lo", "control", 1, 16) ++ rows("lo", "control", 0, 64)
      ).toDF("stratum", "arm", "converted")
    val cmh = graft.ops.Experiment.cmhStratified(units).head()
    assert(math.abs(cmh.getAs[Double]("cmh_chi2")) < 1e-9,
      s"CMH must see no within-stratum effect: ${cmh.getAs[Double]("cmh_chi2")}")
    assert(math.abs(cmh.getAs[Double]("or_mh") - 1.0) < 1e-9)
    // the pooled test is fooled: 68/100 vs 32/100
    val pooled = graft.ops.Experiment.proportionTest(units).head()
    assert(math.abs(pooled.getAs[Double]("diff") - 0.36) < 1e-9)
    assert(math.abs(pooled.getAs[Double]("z_stat")) > 4.0)
  }

  test("conformal: train-absent stratum surfaces with NULL coverage") {
    val train = (1 to 5).map(i => (s"tr$i", "s", "train", 10.0))
    val cal = (1 to 10).map(i => (s"c$i", "s", "cal", 10.0 + i))
    val test = Seq(("t1", "s", "test", 15.0),
      // stratum "orphan" has NO train rows: must appear, not vanish
      ("t2", "orphan", "test", 5.0), ("t3", "orphan", "test", 7.0))
    val out = graft.ops.Conformal.splitConformal(
      (train ++ cal ++ test).toDF("id", "stratum", "split", "y"),
      alphaPct = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val orphan = out("orphan")
    assert(orphan.getAs[Long]("n_test") == 2L)
    assert(orphan.isNullAt(orphan.fieldIndex("covered")))
    assert(orphan.isNullAt(orphan.fieldIndex("coverage")))
    // the global audit counts the orphan units as NOT covered
    val all = out("__all__")
    assert(all.getAs[Long]("n_test") == 3L)
    assert(all.getAs[Long]("covered") == 1L)
    assert(all.getAs[Double]("coverage") == 1.0 / 3)
  }

  // ---- TopShare.nucleusPerGroup ----------------------------------------

  test("nucleus: smallest prefix reaching p, at least one item kept") {
    val rows = Seq(
      ("g", "a", 50.0), ("g", "b", 30.0), ("g", "c", 15.0), ("g", "d", 5.0),
      ("h", "only", 10.0), // p=80 still keeps the single item
      ("i", "x", 10.0), ("i", "y", 10.0), ("i", "z", 80.0))
    val out = graft.ops.TopShare.nucleusPerGroup(
      rows.toDF("grp", "item", "w"), Seq("grp"), "item", "w", pPct = 80)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // g: 50 (cum .5) + 30 (cum .8) kept; 15 would start at .8 → dropped
    assert(out.keySet.filter(_._1 == "g").map(_._2) == Set("a", "b"))
    assert(out(("g", "a")).getAs[Double]("cum_share") == 0.5)
    assert(out(("g", "b")).getAs[Double]("cum_share") == 0.8)
    assert(out(("g", "b")).getAs[Long]("rank") == 2L)
    assert(out.keySet.filter(_._1 == "h").map(_._2) == Set("only"))
    // i: z=80% first (cum .8), then x (tie-break by item) starts at .8 →
    // dropped; prefix rule is strict
    assert(out.keySet.filter(_._1 == "i").map(_._2) == Set("z"))
  }

  // ---- SeriesStats.olsPerGroup -----------------------------------------

  test("ols: exact line recovered; constant series → null r2") {
    val line = (0L until 30L).map(t => ("lin", t, 2.0 * t + 5.0))
    val const = (0L until 10L).map(t => ("const", t, 7.0))
    val out = graft.ops.SeriesStats.olsPerGroup(
      (line ++ const).toDF("group", "t", "x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("lin").getAs[Double]("slope") == 2.0)
    assert(out("lin").getAs[Double]("intercept") == 5.0)
    assert(out("lin").getAs[Double]("r2") == 1.0)
    assert(out("const").getAs[Double]("slope") == 0.0)
    assert(out("const").getAs[Double]("intercept") == 7.0)
    assert(out("const").isNullAt(out("const").fieldIndex("r2")))
  }

  test("ols: matches the direct formula on noisy data") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 200L).map(t =>
      ("g", t, 3.5 * t + 100 + rnd.nextInt(2000) / 100.0))
    val out = graft.ops.SeriesStats.olsPerGroup(rows.toDF("group", "t", "x"))
      .head()
    val iy = rows.map { case (_, t, x) =>
      t -> BigInt(math.round(x * 10000)) }
    val n = BigInt(rows.size)
    val st = iy.map(p => BigInt(p._1)).sum
    val stt = iy.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val sy = iy.map(_._2).sum
    val sty = iy.map(p => BigInt(p._1) * p._2).sum
    val syy = iy.map(p => p._2 * p._2).sum
    val num = n * sty - st * sy; val denT = n * stt - st * st
    val slope = num.toDouble / denT.toDouble / 10000.0
    assert(out.getAs[Double]("slope") == slope)
    assert(out.getAs[Double]("intercept") ==
      sy.toDouble / (n.toDouble * 10000.0) - slope * (st.toDouble / n.toDouble))
    assert(out.getAs[Double]("r2") ==
      (num * num).toDouble / (denT * (n * syy - sy * sy)).toDouble)
    assert(out.getAs[Double]("r2") > 0.99) // the trend dominates the noise
  }

  // ---- EmbeddingPca ----------------------------------------------------

  test("pca: recovers a planted dominant direction") {
    // vectors concentrated on u = (1,1,0,0)/√2 with small deterministic
    // off-axis noise → top component ≈ u with high variance share
    val rows = (0 until 200).map { k =>
      val s = if (k % 2 == 0) 1.0 + k % 5 * 0.1 else -(1.0 + k % 7 * 0.1)
      val e = (k % 11 - 5) * 0.01
      (k.toLong, Array(
        (s * 0.7071 + e).toFloat, (s * 0.7071 - e).toFloat,
        (e * 0.5).toFloat, (-e * 0.5).toFloat))
    }
    val out = graft.similarity.EmbeddingPca.topComponent(
      rows.toDF("vec_id", "embedding"), d = 4, steps = 8)
      .collect().map(r => r.getAs[Long]("dim") -> r).toMap
    val l0 = out(0L).getAs[Double]("loading")
    val l1 = out(1L).getAs[Double]("loading")
    assert(math.abs(math.abs(l0) - 0.7071) < 0.02, s"l0=$l0")
    assert(math.abs(math.abs(l1) - 0.7071) < 0.02, s"l1=$l1")
    assert(math.abs(out(2L).getAs[Double]("loading")) < 0.1)
    assert(out(0L).getAs[Double]("var_explained") > 0.95)
    // unit vector (within the 9dp quantization of each coordinate)
    val norm = out.values.map(r => math.pow(r.getAs[Double]("loading"), 2)).sum
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  // ---- ShapleyAttribution --------------------------------------------

  private def ev(rows: Seq[(Long, Int, String)]) =
    rows.zipWithIndex.map { case ((u, sec, t), i) =>
      (i.toLong, new Timestamp(sec * 1000L), u, t)
    }.toDF("event_id", "ts", "user_id", "event_type")

  test("shapley: hand-computed two-channel game") {
    // u1: A then buy; u2: A,B then buy; u3: B then buy
    val events = ev(Seq(
      (1L, 1, "A"), (1L, 2, "purchase"),
      (2L, 1, "A"), (2L, 2, "B"), (2L, 3, "purchase"),
      (3L, 1, "B"), (3L, 2, "purchase")))
    val out = ShapleyAttribution(events, Seq("A", "B"))
      .collect().map(r => r.getString(0) -> r).toMap
    // v(∅)=0 v(A)=1 v(B)=1 v(AB)=3 → φ_A = φ_B = (1·1 + 1·2)/2 = 1.5
    assert(out("A").getAs[Double]("shapley_conv") == 1.5)
    assert(out("B").getAs[Double]("shapley_conv") == 1.5)
    assert(out("A").getAs[Double]("share") == 0.5)
  }

  test("shapley: efficiency — credits sum to touched conversions") {
    val rnd = new scala.util.Random(41)
    val chans = Seq("c0", "c1", "c2")
    val rows = (1L to 120L).flatMap { u =>
      val touches = chans.filter(_ => rnd.nextBoolean())
        .zipWithIndex.map { case (c, i) => (u, i + 1, c) }
      val buys = if (rnd.nextBoolean()) Seq((u, 10, "purchase")) else Seq()
      // post-purchase touches must NOT count
      val post = Seq((u, 11, chans(rnd.nextInt(3))))
      touches ++ buys ++ post
    }
    val events = ev(rows)
    val out = ShapleyAttribution(events, chans).collect()
    val total = out.map(_.getAs[Double]("shapley_conv")).sum
    // touched conversions: users with a purchase AND ≥1 pre-purchase touch
    val touched = rows.groupBy(_._1).count { case (_, es) =>
      es.exists(_._3 == "purchase") &&
        es.exists(e => e._3 != "purchase" && e._2 < 10)
    }
    assert(math.abs(total - touched) < 1e-6)
  }
}
