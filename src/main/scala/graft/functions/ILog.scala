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

  /** Spark SQL text of qlog2 for value expression `v`. */
  def qlogSqlSpark(v: String): String = qlogSql(v, spark = true)

  /** DuckDB text of the same (bit-identical) expression. */
  def qlogSqlDuck(v: String): String = qlogSql(v, spark = false)

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
