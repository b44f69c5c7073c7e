package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.NGramHash

/** Session extensions: registers the engine's native functions so they are
  * usable from SQL and `expr(...)` in any session configured with
  * `spark.sql.extensions=graft.GraftExtensions` (see Tables.configure).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("ngram_hash"),
      new ExpressionInfo(classOf[NGramHash].getName, "ngram_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "ngram_hash(array<bigint>, n) takes 2 arguments")
        val n = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngram_hash window must be an integer literal, got $other")
        }
        NGramHash(exprs.head, n)
      }))
  }
}
