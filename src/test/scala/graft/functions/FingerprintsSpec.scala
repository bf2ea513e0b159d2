package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar fingerprint twins ≡ the corpus operators, and the registered
  * SQL surface ≡ the Column API — on the real corpus.
  */
class FingerprintsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)

  test("scalar simhash ≡ Dedup.simhash on every corpus doc") {
    val scalar = docs.select(col("doc_id"), Fingerprints.simhash(col("text"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val op = graft.operators.Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scalar === op)
  }

  test("scalar minhash_sig ≡ the signature table's h0..h3") {
    val scalar = docs.select(col("doc_id"),
      Fingerprints.minhashSig(col("text"), lit("0")).as("h0"),
      Fingerprints.minhashSig(col("text"), lit("1")).as("h1"),
      Fingerprints.minhashSig(col("text"), lit("2")).as("h2"),
      Fingerprints.minhashSig(col("text"), lit("3")).as("h3"))
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    val op = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(scalar === op)
  }

  test("minhash_sig is NULL below two words (operator emits no row there)") {
    import spark.implicits._
    val r = Seq(Tuple1("one"), Tuple1("two words")).toDF("text")
      .select(Fingerprints.minhashSig(col("text"), lit("0")))
      .collect().map(_.isNullAt(0)).toSeq
    assert(r === Seq(true, false))
  }

  test("qlog2Fp20Col ≡ the JVM twin and the SQL text across the domain") {
    import spark.implicits._
    val ns = Seq(1L, 2L, 3L, 7L, 1023L, 1024L, 1025L, 999983L, (1L << 44) - 1)
    val df = ns.toDF("n")
    val viaCol = df.select(graft.functions.ILog.qlog2Fp20Col(col("n")))
      .collect().map(_.getLong(0)).toSeq
    val viaSqlText = df.select(expr(ILog.qlogSqlSpark("n")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol === ns.map(ILog.qlog2Fp20))
    assert(viaSqlText === ns.map(ILog.qlog2Fp20))
  }

  test("registered SQL functions ≡ the Column API (SQL front end contract)") {
    Registry.registerSql(spark)
    docs.createOrReplaceTempView("fp_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, canonical_url(concat('HTTP://WWW.Ex', cast(doc_id % 3 as string), " +
        "'.COM:80/a/?utm_source=x&z=1#f')) AS curl, simhash16(text) AS sh, " +
        "minhash_sig(text, '0') AS h0, qlog2_fp20(doc_id + 1) AS ql FROM fp_docs")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    val viaCols = docs.select(col("doc_id"),
      Urls.canonicalize(concat(lit("HTTP://WWW.Ex"), (col("doc_id") % 3).cast("string"),
        lit(".COM:80/a/?utm_source=x&z=1#f"))).as("curl"),
      Fingerprints.simhash(col("text"), 16).as("sh"),
      Fingerprints.minhashSig(col("text"), lit("0")).as("h0"),
      graft.functions.ILog.qlog2Fp20Col(col("doc_id") + 1).as("ql"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
    assert(viaSql === viaCols)
    assert(viaSql.values.map(_._1).toSet ===
      (0 to 2).map(i => s"http://ex$i.com/a?z=1").toSet)
  }
}
