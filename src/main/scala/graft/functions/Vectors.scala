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

  /** max(|x|) over the vector — the scalar-quantization scale basis.
    * abs/max are exact (no rounding), so this is order-independent and
    * bit-identical cross-engine.
    */
  def maxAbs(v: Column): Column = array_max(transform(v, x => abs(x.cast("double"))))

  /** Symmetric int8 scalar quantization: q_i = floor(x_i * (127/max|x|)
    * + 0.5), q_i ∈ [-127, 127]. A fixed per-element IEEE expression tree
    * (widen, divide once, multiply, add, floor) — deterministic and
    * cross-engine exact, unlike a round() whose half-even rule differs
    * between engines. 4× memory reduction for ANN candidate scans.
    */
  def quantizeInt8(v: Column, mx: Column): Column =
    transform(v, x => floor(x.cast("double") * (lit(127.0) / mx) + lit(0.5)).cast("long"))

  /** Max reconstruction error of the int8 round-trip, in micro-units:
    * max_i |q_i * (max|x|/127) - x_i| * 1e6, floored to an exact integer.
    * The quality gate for quantized ANN (error ≤ scale/2 by construction).
    */
  def quantErrorMicros(v: Column, q: Column, mx: Column): Column =
    floor(array_max(zip_with(q, v, (qi, xi) =>
      abs(qi.cast("double") * (mx / lit(127.0)) - xi.cast("double")))) * 1e6 + lit(0.5))
      .cast("long")

  /** ±1 hyperplane component for (plane, dim): +1 iff the top bit of
    * md5("plane{p}_{i}") is 0 — i.e. the first hex digit is '0'..'7'.
    * md5 (not a JVM hash) so an external engine can re-derive the exact
    * plane from the same string: `substr(md5('plane'||p||'_'||i),1,1) <
    * '8'` — which is what the sim_lsh_ann DuckDB oracle does.
    */
  private[graft] def planeSign(p: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane${p}_$i".getBytes("UTF-8"))
    if ((h(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** Dense ±1 random projection (Johnson–Lindenstrauss via an
    * Achlioptas-style sign matrix): component j of the output is
    * ⟨v, s_j⟩ / √outDim where s_j is the [[planeSign]] hyperplane
    * family — the SAME engine-portable md5 planes the LSH bucketing
    * uses, so an external engine re-derives the exact matrix. The
    * 100 TB dimensionality-reduction front-end for ANN/clustering:
    * planes are plan-time literals (no stored model, no shuffle), the
    * projection is the codegen [[DotProduct]], everything map-side.
    * Returns one aliased column per output dim (`p0`..`p{outDim-1}`).
    */
  def randomProjection(v: Column, inDim: Int, outDim: Int): Seq[Column] = {
    require(inDim >= 1 && outDim >= 1, s"dims $inDim -> $outDim")
    val scale = math.sqrt(outDim.toDouble)
    (0 until outDim).map { j =>
      val plane = typedlit(Array.tabulate(inDim)(planeSign(j, _)).toSeq)
      (dot(v, plane) / lit(scale)).as(s"p$j")
    }
  }

  /** Sign-bit LSH bucket over `planes` pseudo-random hyperplanes.
    *
    * Hyperplane components are ±1, derived from [[planeSign]] (md5 —
    * engine-portable) at plan-construction time and embedded as literal
    * arrays — deterministic, seedable, no stored model, and the
    * projection is the native codegen [[DotProduct]] (no interpreted
    * per-element work). `maxDim` caps the hyperplane length; vectors
    * longer than it only project their first `maxDim` dims.
    */
  def lshBucket(v: Column, planes: Int, maxDim: Int = 4096): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val bits = (0 until planes).map { p =>
      val comps = Array.tabulate(maxDim)(planeSign(p, _))
      val plane = typedlit(comps.toSeq)
      val proj = ColumnBridge.column(
        DotProduct(ColumnBridge.expression(v), ColumnBridge.expression(plane)))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
