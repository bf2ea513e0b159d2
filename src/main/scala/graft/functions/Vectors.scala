package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders over `array<float>` columns.
  *
  * All math is widened to double and folded sequentially
  * (`aggregate`/`zip_with` — codegen'd Catalyst higher-order functions, no
  * UDFs), so a dot product is deterministic within an engine. Cross-engine
  * comparisons only ever threshold these values against gaps far wider than
  * FP noise (see [[graft.queries.VectorQueries]]).
  */
object Vectors {

  /** array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product — native codegen expression ([[DotProduct]]); accepts
    * array<float> or array<double> directly, sums in double.
    * (Spark 4 Columns wrap ColumnNodes, not Expressions — the classic-mode
    * bridge is ExpressionUtils.)
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The composable HOF formulation (kept as the reference semantics the
    * native expression is tested against; interpreted, so not for hot
    * paths).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket over `planes` pseudo-random hyperplanes.
    *
    * Hyperplane p's component for dimension i is derived from a portable
    * integer hash of (p, i) — deterministic, seedable, no stored model. The
    * bucket id packs the sign bits of the `planes` projections.
    */
  def lshBucket(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // component(p, i) in {-1.0, +1.0} from crc32 parity of "p:i"
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x * (crc32(concat(lit(s"$p:"), i.cast("string"))) % 2 * 2 - 1).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
