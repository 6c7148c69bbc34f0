package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.IntegerType

/** The engine's SparkSessionExtensions: injects every custom Catalyst
  * function at SESSION BUILD time, so a SQL-only user of a
  * GraftSession-built session (or any session configured with
  * `spark.sql.extensions=graft.core.GraftExtensions`) can call them from
  * `spark.sql` without any imperative `register()` — the custom
  * expressions become part of the engine's SQL surface (SURVEY.md S11),
  * not just its Column API. The per-object `register()` methods remain
  * for sessions built elsewhere; both paths construct the identical
  * expressions, so plans cannot differ by registration route.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - native float-array dot product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(a, b)")
        graft.functions.DotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_edit_within"),
      info("graft_edit_within",
        "graft_edit_within(a, b, k) - true iff levenshtein(a, b) <= k"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "graft_edit_within(a, b, k)")
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_edit_within: threshold must be an INT literal, got $other")
        }
        graft.functions.EditWithin(exprs(0), exprs(1), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(hash, items) - Bloom sketch of long hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_bloom_agg(hash, estimatedItems)")
        val items = exprs(1) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg: estimatedItems must be an integer literal, got $other")
        }
        new BloomFilterAggregate(exprs(0), items)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      info("graft_bloom_might_contain",
        "graft_bloom_might_contain(sketch, hash) - Bloom membership probe"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_bloom_might_contain(sketch, hash)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))
      }))
  }
}
