package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SCALAR column twins of the corpus-level fingerprint operators in
  * [[graft.operators.Dedup]], so the curation primitives are callable
  * from `spark.sql(...)` as ordinary functions (registered by
  * [[Registry.registerSql]] / [[graft.plans.GraftExtensions]]).
  *
  * The corpus operators stay the scale path — one explode + one grouped
  * aggregation over the whole table; these twins compute the SAME value
  * for one document via array HOFs (`transform`/`aggregate` — all
  * codegen'd, no UDFs), which is what a SQL user wants for ad-hoc
  * predicates, joins against an existing signature table, or
  * `CREATE VIEW ... AS SELECT minhash_sig(text, '0') ...`.
  * Bit-equivalence with the operators is pinned in FingerprintsSpec.
  */
object Fingerprints {

  /** Scalar twin of [[graft.operators.Dedup.simhash]]: `bits`-bit
    * fingerprint of one text value. Bit b votes +1/−1 by the high bit
    * of hex digit b+1 of md5(token); the md5 array is materialized once
    * and the per-bit votes fold over it.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 32, s"bits ($bits) must be in [1, 32]")
    val hs = transform(Text.tokens(text), w => md5(w))
    (0 until bits).map { b =>
      val v = aggregate(hs, lit(0),
        (s, h) => s + when(substring(h, b + 1, 1) >= "8", 1).otherwise(-1))
      when(v >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Scalar twin of one [[graft.operators.Dedup.minhashSignatures]]
    * column: min over word-bigram shingles of md5(seed ++ shingle) —
    * `minhash_sig(text, '0')` equals the signature table's `h0`.
    * NULL for texts under two words (the operator emits no signature
    * row there); the guard also keeps `sequence` in-domain (Spark's
    * sequence(1, 0) DESCENDS instead of being empty).
    */
  def minhashSig(text: Column, seed: Column): Column = {
    val ws = Text.tokens(text)
    val sh = transform(sequence(lit(1), size(ws) - 1),
      i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1)))
    when(size(ws) >= 2,
      array_min(transform(sh, x => md5(concat(seed, x)))))
      .otherwise(lit(null).cast("string"))
  }
}
