package graft.queriesdef

/** Shared DuckDB-oracle SQL fragments.
  *
  * Conventions that make hash-matching deterministic across engines:
  *  - integer outputs are BIGINT on both sides (DuckDB `count` is BIGINT,
  *    Spark `sum(long)`/`count` are LongType; anything else is cast),
  *  - CAUTION: DuckDB `SUM` over any integer type — including window
  *    SUMs — returns HUGEINT (INT128), which pandas surfaces as float64
  *    and the driver's value hash then mismatches Spark's int64 even when
  *    every value is equal (bit the round-5 pack_sequences /
  *    token_budget_mix oracles; the local check.py compares with
  *    check_dtype=False and will NOT catch it). Wrap every integer SUM —
  *    plain or windowed — in CAST(... AS BIGINT),
  *  - money aggregates go through `SUM(CAST(x AS DECIMAL(18,4)))` then back
  *    to DOUBLE — decimal addition is exact so the result is independent of
  *    partial-aggregate combine order on either engine,
  *  - per-row double arithmetic is written with identical association on
  *    both sides (IEEE ops are deterministic; neither engine reassociates
  *    float expressions),
  *  - dates are DATE on both sides.
  */
object Oracle {

  /** The silver transactions_adj relation (mirrors
    * graft.silver.TransactionsAdj over the fixture role mapping).
    */
  val txAdj: String =
    """transactions_adj AS (
      |  SELECT household_key, basket_id, day, product_id, store_id,
      |    CAST(weekofyear(day) AS INT) AS week_no,
      |    CAST(quantity AS INT) AS units,
      |    sales_value AS amount_list,
      |    COALESCE(CASE WHEN retail_disc_rate > 0.0
      |      THEN sales_value * retail_disc_rate END, 0.0) AS instore_discount,
      |    COALESCE(CASE WHEN coupon_disc_rate >= 0.05
      |      THEN sales_value * coupon_disc_rate END, 0.0) AS campaign_coupon_discount,
      |    COALESCE(CASE WHEN coupon_disc_rate > 0.0 AND coupon_disc_rate < 0.05
      |      THEN sales_value * coupon_disc_rate END, 0.0) AS manuf_coupon_discount
      |  FROM (
      |    SELECT o.o_custkey AS household_key, l.l_orderkey AS basket_id,
      |      CAST(l.l_shipdate AS DATE) AS day, l.l_partkey AS product_id,
      |      l.l_suppkey AS store_id, l.l_quantity AS quantity,
      |      l.l_extendedprice AS sales_value, l.l_discount AS retail_disc_rate,
      |      l.l_tax AS coupon_disc_rate
      |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) raw
      |)""".stripMargin

  /** transactions_adj with the two composite money columns added. */
  val txAdjFull: String =
    txAdj + """,
      |tx AS (
      |  SELECT *,
      |    campaign_coupon_discount + manuf_coupon_discount AS total_coupon_discount,
      |    amount_list - instore_discount
      |      - (campaign_coupon_discount + manuf_coupon_discount) AS amount_paid
      |  FROM transactions_adj
      |)""".stripMargin

  /** tx ⋈ products (commodity_desc attached) — SURVEY.md J1. */
  val txCommodity: String =
    txAdjFull + """,
      |txc AS (
      |  SELECT tx.*, p.p_brand AS commodity_desc
      |  FROM tx JOIN part p ON tx.product_id = p.p_partkey
      |)""".stripMargin

  /** Deterministic exact decimal sum of a double expression, as DOUBLE. */
  def dsum(expr: String, as: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) AS $as"
}
