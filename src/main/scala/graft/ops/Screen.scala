package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Univariate feature screening against a binary label — the filter-stage
  * companion to [[ModelEval]]'s AUC screen: the chi-square test of
  * independence and Cramér's V for each candidate binary feature. The
  * standard pre-model triage on wide feature tables (the reference's
  * grain tables run to ~400 columns, `04b`; at that width you screen
  * before you fit).
  *
  * For a 2×2 contingency table [[a, b], [c, d]] (a = feature∧label,
  * b = feature∧¬label, c = ¬feature∧label, d = neither) the chi-square
  * statistic has the exact single-ratio form
  *
  *   χ² = n·(a·d − b·c)² / ((a+b)(c+d)(a+c)(b+d)),   n = a+b+c+d
  *
  * and Cramér's V = √(χ²/n) — so both close with ONE double division
  * (plus a correctly-rounded IEEE sqrt) over exact integer products.
  * Engine-bit-exact UNROUNDED — no rounding convention needed at all.
  *
  * Overflow headroom: products accumulate in DECIMAL(38,0) (int128).
  * n·(ad−bc)² ≤ n⁵/16 stays inside 38 digits for n up to ~10⁸ units;
  * past that (beyond any per-unit table this engine screens) the closing
  * would move to double. The `a..d` counts come from ONE map-side hash
  * aggregate over the unpivoted (feature, f, label) rows — no window,
  * no join, output rows = #features.
  */
object Screen {

  /** Chi-square screen over long-form rows (feature: String, f: 0/1,
    * label: 0/1) — one output row per feature, ordered by feature:
    * (feature, n_f1_l1, n_f1_l0, n_f0_l1, n_f0_l0, chi2, cramers_v).
    */
  def chi2(rows: DataFrame): DataFrame = {
    val f = col("f").cast("long"); val l = col("label").cast("long")
    val counts = rows.groupBy("feature").agg(
      sum(f * l).as("a"),
      sum(f * (lit(1L) - l)).as("b"),
      sum((lit(1L) - f) * l).as("c"),
      sum((lit(1L) - f) * (lit(1L) - l)).as("d"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val n = col("a") + col("b") + col("c") + col("d")
    // |ad−bc| ≤ n²/4, so every product below stays inside DECIMAL(38,0)
    // (scale-0 multiplies keep scale 0 under Spark's precision cap) for
    // n up to ~10⁸ units — exact int128 arithmetic at any realistic
    // per-unit table; beyond that the closing would move to double
    val adbc = dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c"))
    val adbc2 = adbc * adbc
    val num = dec(n) * adbc2
    val den = dec(col("a") + col("b")) * dec(col("c") + col("d")) *
      dec(col("a") + col("c")) * dec(col("b") + col("d"))
    counts.select(
      col("feature"),
      col("a").as("n_f1_l1"), col("b").as("n_f1_l0"),
      col("c").as("n_f0_l1"), col("d").as("n_f0_l0"),
      // a degenerate margin (a feature or label constant over the whole
      // table) has undefined chi2 — surface NULL, not an ANSI div error.
      // Unrounded: one division (and one IEEE sqrt) over exact int128
      // casts is engine-exact as is
      when(den === 0, lit(null))
        .otherwise(num.cast("double") / den.cast("double")).as("chi2"),
      when(den === 0, lit(null))
        .otherwise(sqrt(adbc2.cast("double") / den.cast("double")))
        .as("cramers_v"))
      .orderBy("feature")
  }

  /** Mutual information (nats) between each binary feature and the
    * label, with the marginal entropies and the normalized MI — the
    * information-theoretic companion to [[chi2]] (captures the same 2×2
    * dependence on a comparable-across-features scale).
    *
    *   MI = Σ_{ij} p_ij·ln(p_ij / (p_i·q_j)),  NMI = MI / min(H_f, H_l)
    *
    * Exactness: ln is transcendental (libm last-ulp varies by engine),
    * so every ln TERM quantizes to DECIMAL(18,9) before the exact sum —
    * the Drift.psi convention. Zero cells contribute zero (the measure's
    * own convention). Same one-hash-aggregate scale shape as [[chi2]].
    */
  def mutualInfo(rows: DataFrame): DataFrame = {
    val f = col("f").cast("long"); val l = col("label").cast("long")
    val counts = rows.groupBy("feature").agg(
      sum(f * l).as("a"),
      sum(f * (lit(1L) - l)).as("b"),
      sum((lit(1L) - f) * l).as("c"),
      sum((lit(1L) - f) * (lit(1L) - l)).as("d"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast("double")
    // p_ij·ln(p_ij·n² / (row·col)) — association pinned; o=0 → 0
    def term(o: org.apache.spark.sql.Column,
        row: org.apache.spark.sql.Column, cc: org.apache.spark.sql.Column) =
      when(o === 0L, lit(0).cast("decimal(18,9)")).otherwise(
        ((o.cast("double") / n) * log(o.cast("double") * n
          / (row.cast("double") * cc.cast("double"))))
          .cast("decimal(18,9)"))
    def hterm(o: org.apache.spark.sql.Column) =
      when(o === 0L, lit(0).cast("decimal(18,9)")).otherwise(
        (-(o.cast("double") / n) * log(o.cast("double") / n))
          .cast("decimal(18,9)"))
    val rF = col("a") + col("b"); val rNf = col("c") + col("d")
    val cL = col("a") + col("c"); val cNl = col("b") + col("d")
    val mi = (term(col("a"), rF, cL) + term(col("b"), rF, cNl)
      + term(col("c"), rNf, cL) + term(col("d"), rNf, cNl))
      .cast("decimal(18,9)")
    val hF = (hterm(rF) + hterm(rNf)).cast("decimal(18,9)")
    val hL = (hterm(cL) + hterm(cNl)).cast("decimal(18,9)")
    counts.select(
      col("feature"),
      mi.cast("double").as("mi"),
      hF.cast("double").as("h_feature"),
      hL.cast("double").as("h_label"),
      // min entropy 0 ⟺ a margin is constant ⟺ MI undefined → NULL
      when(least(hF, hL) > 0,
        mi.cast("double") / least(hF, hL).cast("double")).as("nmi"))
      .orderBy("feature")
  }

  /** The matching DuckDB closing SQL over a relation exposing
    * (feature, a, b, c, d). */
  def mutualInfoSql(rel: String): String = {
    def term(o: String, row: String, cc: String) =
      s"""CASE WHEN $o = 0 THEN CAST(0 AS DECIMAL(18,9)) ELSE
         | CAST((CAST($o AS DOUBLE) / n) * LN(CAST($o AS DOUBLE) * n
         |   / (CAST($row AS DOUBLE) * CAST($cc AS DOUBLE)))
         |  AS DECIMAL(18,9)) END""".stripMargin.replaceAll("\n", "")
    def hterm(o: String) =
      s"""CASE WHEN $o = 0 THEN CAST(0 AS DECIMAL(18,9)) ELSE
         | CAST(-(CAST($o AS DOUBLE) / n) * LN(CAST($o AS DOUBLE) / n)
         |  AS DECIMAL(18,9)) END""".stripMargin.replaceAll("\n", "")
    s"""SELECT feature,
       |  CAST(mi AS DOUBLE) AS mi,
       |  CAST(hf AS DOUBLE) AS h_feature,
       |  CAST(hl AS DOUBLE) AS h_label,
       |  CASE WHEN LEAST(hf, hl) > 0 THEN
       |    CAST(mi AS DOUBLE) / CAST(LEAST(hf, hl) AS DOUBLE) END AS nmi
       |FROM (
       |  SELECT feature,
       |    CAST(${term("a", "(a+b)", "(a+c)")} + ${term("b", "(a+b)", "(b+d)")}
       |      + ${term("c", "(c+d)", "(a+c)")} + ${term("d", "(c+d)", "(b+d)")}
       |      AS DECIMAL(18,9)) AS mi,
       |    CAST(${hterm("(a+b)")} + ${hterm("(c+d)")} AS DECIMAL(18,9)) AS hf,
       |    CAST(${hterm("(a+c)")} + ${hterm("(b+d)")} AS DECIMAL(18,9)) AS hl
       |  FROM (SELECT feature, a, b, c, d,
       |      CAST(a + b + c + d AS DOUBLE) AS n FROM $rel))
       |ORDER BY feature""".stripMargin
  }

  /** Weight of evidence + information value per binary feature — the
    * credit-scoring-lineage encoder/screen (Siddiqi, "Credit Risk
    * Scorecards"): for each feature value v ∈ {1, 0},
    *
    *   WoE_v = ln( (n_{v,1}/n_1) / (n_{v,0}/n_0) ),
    *   IV    = Σ_v (n_{v,1}/n_1 − n_{v,0}/n_0) · WoE_v
    *
    * with the conventional +0.5 continuity smoothing on every cell so
    * empty cells stay finite. ln terms quantize to DECIMAL(18,9) before
    * the exact IV sum (the [[mutualInfo]] convention). Same
    * one-hash-aggregate scale shape as [[chi2]].
    */
  def woeIv(rows: DataFrame): DataFrame = {
    val f = col("f").cast("long"); val l = col("label").cast("long")
    val counts = rows.groupBy("feature").agg(
      sum(f * l).as("a"),
      sum(f * (lit(1L) - l)).as("b"),
      sum((lit(1L) - f) * l).as("c"),
      sum((lit(1L) - f) * (lit(1L) - l)).as("d"))
    // smoothed shares: (cell + 0.5) / (margin + 1) — margins gain one
    // unit total so shares still sum to 1 per class
    val n1 = (col("a") + col("c")).cast("double") + lit(1.0)
    val n0 = (col("b") + col("d")).cast("double") + lit(1.0)
    def share1(o: org.apache.spark.sql.Column) =
      (o.cast("double") + lit(0.5)) / n1
    def share0(o: org.apache.spark.sql.Column) =
      (o.cast("double") + lit(0.5)) / n0
    val woe1 = log(share1(col("a")) / share0(col("b")))
      .cast("decimal(18,9)")
    val woe0 = log(share1(col("c")) / share0(col("d")))
      .cast("decimal(18,9)")
    val iv = (((share1(col("a")) - share0(col("b")))
        * woe1.cast("double")).cast("decimal(18,9)")
      + ((share1(col("c")) - share0(col("d")))
        * woe0.cast("double")).cast("decimal(18,9)"))
      .cast("decimal(18,9)")
    counts.select(
      col("feature"),
      col("a").as("n_f1_l1"), col("b").as("n_f1_l0"),
      col("c").as("n_f0_l1"), col("d").as("n_f0_l0"),
      woe1.cast("double").as("woe_f1"),
      woe0.cast("double").as("woe_f0"),
      iv.cast("double").as("iv"))
      .orderBy("feature")
  }

  /** The matching DuckDB closing SQL over a relation exposing
    * (feature, a, b, c, d). */
  def woeIvSql(rel: String): String =
    s"""SELECT feature,
       |  a AS n_f1_l1, b AS n_f1_l0, c AS n_f0_l1, d AS n_f0_l0,
       |  CAST(w1 AS DOUBLE) AS woe_f1,
       |  CAST(w0 AS DOUBLE) AS woe_f0,
       |  CAST(CAST(
       |      (s1a - s0b) * CAST(w1 AS DOUBLE) AS DECIMAL(18,9))
       |    + CAST(
       |      (s1c - s0d) * CAST(w0 AS DOUBLE) AS DECIMAL(18,9))
       |    AS DOUBLE) AS iv
       |FROM (
       |  SELECT feature, a, b, c, d, s1a, s0b, s1c, s0d,
       |    CAST(LN(s1a / s0b) AS DECIMAL(18,9)) AS w1,
       |    CAST(LN(s1c / s0d) AS DECIMAL(18,9)) AS w0
       |  FROM (
       |    SELECT feature, a, b, c, d,
       |      (CAST(a AS DOUBLE) + 0.5) / (CAST(a + c AS DOUBLE) + 1.0)
       |        AS s1a,
       |      (CAST(b AS DOUBLE) + 0.5) / (CAST(b + d AS DOUBLE) + 1.0)
       |        AS s0b,
       |      (CAST(c AS DOUBLE) + 0.5) / (CAST(a + c AS DOUBLE) + 1.0)
       |        AS s1c,
       |      (CAST(d AS DOUBLE) + 0.5) / (CAST(b + d AS DOUBLE) + 1.0)
       |        AS s0d
       |    FROM $rel))
       |ORDER BY feature""".stripMargin

  /** The matching DuckDB closing SQL over a relation exposing
    * (feature, a, b, c, d) — HUGEINT arithmetic mirrors the decimal path.
    */
  def chi2Sql(rel: String): String =
    s"""SELECT feature,
       |  a AS n_f1_l1, b AS n_f1_l0, c AS n_f0_l1, d AS n_f0_l0,
       |  CAST(CAST(a+b+c+d AS HUGEINT)
       |      * ((CAST(a AS HUGEINT)*CAST(d AS HUGEINT)
       |        - CAST(b AS HUGEINT)*CAST(c AS HUGEINT))
       |       * (CAST(a AS HUGEINT)*CAST(d AS HUGEINT)
       |        - CAST(b AS HUGEINT)*CAST(c AS HUGEINT))) AS DOUBLE)
       |    / CAST(CAST(a+b AS HUGEINT)*CAST(c+d AS HUGEINT)
       |      * CAST(a+c AS HUGEINT)*CAST(b+d AS HUGEINT) AS DOUBLE)
       |    AS chi2,
       |  SQRT(CAST((CAST(a AS HUGEINT)*CAST(d AS HUGEINT)
       |        - CAST(b AS HUGEINT)*CAST(c AS HUGEINT))
       |       * (CAST(a AS HUGEINT)*CAST(d AS HUGEINT)
       |        - CAST(b AS HUGEINT)*CAST(c AS HUGEINT)) AS DOUBLE)
       |    / CAST(CAST(a+b AS HUGEINT)*CAST(c+d AS HUGEINT)
       |      * CAST(a+c AS HUGEINT)*CAST(b+d AS HUGEINT) AS DOUBLE))
       |    AS cramers_v
       |FROM $rel
       |ORDER BY feature""".stripMargin
}
