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
    * of hex digit b+1 of md5(token).
    *
    * Shape matters here: HOF lambdas are interpreted (CodegenFallback),
    * so the naive per-bit form — `bits` separate folds, each
    * re-hashing every token — costs bits × md5s per token (measured
    * 12 s for 5k docs). This form hashes each token ONCE (one
    * transform), folds the hash array ONCE into a `bits`-wide vote
    * accumulator (zip_with against the 1-based digit positions), and
    * packs the signs with one more bounded fold against the literal
    * mask array — so every downstream column reference evaluates one
    * linear pass, not sixteen.
    */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 32, s"bits ($bits) must be in [1, 32]")
    val pos = typedlit((1 to bits).toList)           // substr positions
    val masks = typedlit((0 until bits).toList.map(b => 1L << b))
    val hs = transform(Text.tokens(text), w => md5(w))
    val votes = aggregate(hs, array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc, pos,
        (a, p) => a + when(h.substr(p, lit(1)) >= "8", lit(1)).otherwise(lit(-1))))
    aggregate(
      zip_with(votes, masks, (v, m) => when(v >= 0, m).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
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
