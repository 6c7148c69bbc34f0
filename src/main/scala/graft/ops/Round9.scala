package graft.ops

/** The suite-wide double-quantization convention: Spark's `round(_, 9)`
  * semantics (shortest-decimal HALF_UP). Driver-side folds that must
  * hash-match oracle SQL (Survival, MarkovAttribution) quantize through
  * THIS helper so the convention cannot drift per operator.
  */
object Round9 {
  def round9d(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
}
