package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Privacy

class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def groups(n: Int) =
    (1 to n).flatMap(g => (1 to 3).map(i => (s"g$g", s"u${g}_$i")))
      .toDF("grp", "unit")

  test("dpCounts: deterministic in (data, seed), partitioning-independent") {
    val df = groups(50)
    def run(d: org.apache.spark.sql.DataFrame) =
      Privacy.dpCounts(d, Seq("grp"), "seed-a", 100)
        .select("grp", "n_dp").as[(String, Double)].collect().toMap
    val a = run(df)
    val b = run(df.repartition(13))
    assert(a == b, "noise must not depend on partitioning")
    val c = Privacy.dpCounts(df, Seq("grp"), "seed-b", 100)
      .select("grp", "n_dp").as[(String, Double)].collect().toMap
    assert(a != c, "a different seed must move the noise")
  }

  test("dpCounts noise is Laplace-shaped: median |noise| near b·ln2, mean near 0") {
    // 2000 groups → 2000 independent noise draws at b = 1 (ε = 1)
    val df = groups(2000)
    val noise = Privacy.dpCounts(df, Seq("grp"), "shape-seed", 100)
      .select((col("n_dp") - col("n_exact").cast("double")).as("e"))
      .as[Double].collect()
    assert(noise.length == 2000)
    val medianAbs = noise.map(math.abs).sorted.apply(noise.length / 2)
    // Laplace(1): median |X| = ln 2 ≈ 0.693; 2000 draws keep it within ±20%
    assert(medianAbs > 0.55 && medianAbs < 0.85, s"median |noise| $medianAbs")
    val mean = noise.sum / noise.length
    assert(math.abs(mean) < 0.15, s"mean noise $mean not near 0")
    // larger ε → strictly smaller scale for the same uniforms
    val tighter = Privacy.dpCounts(df, Seq("grp"), "shape-seed", 400)
      .select((col("n_dp") - col("n_exact").cast("double")).as("e"))
      .as[Double].collect()
    val ratio = tighter.map(math.abs).sum / noise.map(math.abs).sum
    assert(math.abs(ratio - 0.25) < 1e-9, s"eps scaling ratio $ratio != 1/4")
  }

  test("dpSums: contribution is clipped to the sensitivity bound") {
    val df = Seq(
      ("g", "whale", 9999.0), // clipped to 5.0
      ("g", "minnow", 1.5),
      ("g", "refund", -3.0), // clipped up to 0
      ("h", "only", 2.0)
    ).toDF("grp", "unit", "v")
    val out = Privacy.dpSums(df, Seq("grp"), "unit", "v",
      clip4 = 50000L, seed = "s", epsilonPct = 100)
      .select("grp", "n_contributors", "sum_clipped")
      .as[(String, Long, Double)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(out("g") == ((3L, 6.5))) // 5.0 + 1.5 + 0.0
    assert(out("h") == ((1L, 2.0)))
  }

  test("dpSums noise scales with the clip (sensitivity), not the data") {
    val df = (1 to 500).map(g => (s"g$g", "u", 1.0)).toDF("grp", "unit", "v")
    def absNoise(clip4: Long) =
      Privacy.dpSums(df, Seq("grp"), "unit", "v", clip4, "s", 100)
        .select(abs(col("sum_dp") - col("sum_clipped")).as("e"))
        .as[Double].collect().sum
    val r = absNoise(20000L) / absNoise(10000L)
    assert(math.abs(r - 2.0) < 1e-9, s"noise must double with the clip: $r")
  }

  test("null group keys are sentinel-coalesced, not skipped") {
    import org.apache.spark.sql.functions.lit
    val df = Seq(Option.empty[String], Some(Privacy.NullKey), Some("a"))
      .toDF("grp")
    val out = Privacy.dpCounts(df, Seq("grp"), "seed", 100)
      .select("grp", "n_dp").collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    // the null-keyed group must hash EXACTLY like the literal sentinel
    // (the cross-engine contract: DuckDB COALESCEs to the same string)
    assert(out(None) == out(Some(Privacy.NullKey)),
      s"null key must alias the sentinel: $out")
    assert(out.contains(Some("a")))
  }

  test("dp SQL renderings escape single quotes in the seed") {
    val sql = Privacy.dpCountsSql("t", "g", "o'brien", 100)
    assert(sql.contains("o''brien") && !sql.contains("'o'brien'"))
  }

  test("keySql coalesces each key column independently") {
    val sql = Privacy.keySql(Seq("a", "b"))
    assert(sql ==
      s"COALESCE(CAST(a AS VARCHAR), '${Privacy.NullKey}') || " +
        s"COALESCE(CAST(b AS VARCHAR), '${Privacy.NullKey}')")
    // single-column rendering stays identical to what dpCountsSql embeds
    assert(Privacy.keySql(Seq("g")) ==
      s"COALESCE(CAST(g AS VARCHAR), '${Privacy.NullKey}')")
  }
}
