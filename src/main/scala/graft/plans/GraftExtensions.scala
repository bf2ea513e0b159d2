package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Session extensions: expose graft's native expressions to SQL callers
  * and install the HOF→native optimizer rewrite.
  *
  * ```
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT dot_product(a, b) FROM vectors")
  * -- or write the natural HOF form and let the optimizer swap it:
  * spark.sql("SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (s, x) -> s + x) FROM vectors")
  * ```
  * (Scala callers use graft.functions.Vectors.dot directly; this is the
  * registration path for pure-SQL workloads — the public
  * SparkSessionExtensions API, no session internals.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
