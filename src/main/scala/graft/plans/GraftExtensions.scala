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
  * -- curation primitives compose like built-ins:
  * spark.sql("SELECT canonical_url(url), simhash16(text), minhash_sig(text, '0'), qlog2_fp20(n) FROM docs")
  * ```
  * (Scala callers use graft.functions.{Vectors, Urls, Fingerprints, ILog}
  * directly; this is the registration path for pure-SQL workloads — the
  * public SparkSessionExtensions API, no session internals. For a
  * session that already exists — notebooks, the driver harness —
  * [[graft.functions.Registry.registerSql]] installs the same builders
  * at runtime.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftExtensions {

  /** The SQL-surface scalar functions, shared between the
    * SparkSessionExtensions path above and runtime registration
    * ([[graft.functions.Registry.registerSql]]). Every builder expands
    * to pure built-in/codegen expression trees — the Column helpers the
    * Scala API uses, no UDFs:
    *
    *  - `dot_product(a, b)`    — native codegen [[DotProduct]]
    *  - `canonical_url(u)`     — [[graft.functions.Urls.canonicalize]]
    *  - `simhash16(text)`      — [[graft.functions.Fingerprints.simhash]]
    *  - `minhash_sig(text, s)` — [[graft.functions.Fingerprints.minhashSig]]
    *  - `qlog2_fp20(n)`        — [[graft.functions.ILog.qlog2Fp20Col]]
    */
  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, resolvableExpression}
    def c1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
        : Seq[Expression] => Expression =
      children => resolvableExpression(f(column(children.head)))
    Seq(
      "dot_product" -> ((children: Seq[Expression]) =>
        DotProduct(children(0), children(1))),
      "canonical_url" -> c1(graft.functions.Urls.canonicalize),
      "simhash16" -> c1(graft.functions.Fingerprints.simhash(_, 16)),
      "minhash_sig" -> ((children: Seq[Expression]) =>
        resolvableExpression(graft.functions.Fingerprints.minhashSig(
          column(children(0)), column(children(1))))),
      "qlog2_fp20" -> c1(graft.functions.ILog.qlog2Fp20Col))
  }
}
