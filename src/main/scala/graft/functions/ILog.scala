package graft.functions

/** Integer fixed-point log2 — Mitchell's piecewise-linear approximation
  * (Mitchell, IRE Trans. Electronic Computers, 1962), in 20-bit fixed
  * point: for n ≥ 1 with e = ⌊log2 n⌋,
  *
  *   qlog2(n) = e·2^20 + ⌊(n − 2^e)·2^20 / 2^e⌋
  *
  * i.e. the exponent plus a LINEAR interpolation of the mantissa instead
  * of the transcendental `log` — every step is integer shift/multiply/
  * floor-divide, so Spark and DuckDB (and the JVM twin) compute
  * bit-identical values, which a libm `ln` cannot promise across builds
  * (the same reasoning as [[Hdr]]'s bin()-based buckets and text_bm25's
  * unlogged odds). Maximum error vs true log2 is ≈0.0861 bits, at the
  * mid-octave — irrelevant for RANKING-style uses (quality filtering by
  * LM score) where the scale just needs to be monotone per octave and
  * reproducible.
  *
  * Exactness domain: exact at powers of two; strictly increasing in n;
  * n must be ≥ 1 (the SQL faces raise, mirroring [[Hdr]]'s guard). Safe
  * for n up to 2^43 ((n − 2^e)·2^20 stays under 2^63).
  */
object ILog {

  /** JVM twin. */
  def qlog2Fp20(n: Long): Long = {
    require(n >= 1, s"qlog2 needs n >= 1, got $n")
    // Above 2^44 − 1 the mantissa product (n − 2^e)·2^20 would wrap a
    // Long SILENTLY here while the SQL faces fail loudly (Spark ANSI /
    // DuckDB overflow checks) — fail the same way they do.
    require(n < (1L << 44), s"qlog2 domain is n < 2^44, got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val p = 1L << e
    e.toLong * 1048576L + ((n - p) * 1048576L) / p
  }

  /** Column twin of [[qlog2Fp20]] — the SAME expression tree
    * [[qlogSqlSpark]] emits as text (length(bin)/shift/integral-divide,
    * loud failure below 1), built directly so the SQL-surface
    * registration ([[Registry.registerSql]]) can expose `qlog2_fp20` as
    * a native codegen function. Variable-distance shift and integer
    * division have no Column-API wrappers, so those two nodes go
    * through ColumnBridge.
    */
  def qlog2Fp20Col(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, ShiftLeft}
    val e = length(bin(v)) - 1
    val p = column(ShiftLeft(expression(lit(1L)), expression(e)))
    val frac = column(new IntegralDivide(expression((v - p) * 1048576), expression(p)))
    when(v < 1, raise_error(lit("qlog2: value below 1")).cast("bigint"))
      .otherwise(e.cast("bigint") * 1048576 + frac)
  }

  /** Spark SQL text of qlog2 for value expression `v`. */
  def qlogSqlSpark(v: String): String = qlogSql(v, spark = true)

  /** DuckDB text of the same (bit-identical) expression. */
  def qlogSqlDuck(v: String): String = qlogSql(v, spark = false)

  /** Fixed-point probability: ⌊num·2^34 / den⌋ — the quantized ratio
    * both engines compute identically (one integer multiply + one floor
    * divide). 2^34 scale keeps the add-1 unigram floor non-zero up to
    * ~17 G training bigrams while the product num·2^34 stays under 2^63
    * for num < 2^29 — enforced LOUDLY on both engines (the guard below
    * raises; Spark's non-ANSI multiply would otherwise wrap silently
    * while DuckDB errors — the same JVM-vs-SQL divergence [[qlog2Fp20]]
    * guards against). Corpora past 2^29 occurrences of one bigram shard
    * their LM counts first.
    */
  def pFp34Spark(num: String, den: String): String = pFp34(num, den, spark = true)
  def pFp34Duck(num: String, den: String): String = pFp34(num, den, spark = false)

  /** JVM twin of the SQL faces. */
  def pFp34(num: Long, den: Long): Long = {
    require(num >= 1 && den >= 1, s"pFp34 needs num, den >= 1, got $num / $den")
    require(num < (1L << 29), s"pFp34 domain is num < 2^29, got $num")
    (num << 34) / den
  }

  private def pFp34(num: String, den: String, spark: Boolean): String = {
    val raise =
      if (spark) "cast(raise_error('pFp34: numerator >= 2^29') as bigint)"
      else "CAST(error('pFp34: numerator >= 2^29') AS BIGINT)"
    val divOp = if (spark) "div" else "//"
    s"(CASE WHEN ($num) >= 536870912 THEN $raise ELSE (($num) * 17179869184 $divOp ($den)) END)"
  }

  private def qlogSql(v: String, spark: Boolean): String = {
    val e = s"(length(bin($v)) - 1)"
    // BIGINT base: shiftleft on an INT literal wraps at 32 bits (e ≥ 31)
    val p =
      if (spark) s"shiftleft(cast(1 as bigint), $e)"
      else s"(CAST(1 AS BIGINT) << $e)"
    val frac =
      if (spark) s"((($v) - $p) * 1048576 div $p)"
      else s"((($v) - $p) * 1048576 // $p)"
    val raise =
      if (spark) "cast(raise_error('qlog2: value below 1') as bigint)"
      else "CAST(error('qlog2: value below 1') AS BIGINT)"
    s"(CASE WHEN $v < 1 THEN $raise ELSE $e * 1048576 + $frac END)"
  }
}
