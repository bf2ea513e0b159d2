package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off stage bisection for the pipeline_funnel_v2 sf10 profile
  * (round 12): each cut point of the funnel noop-sunk and timed
  * min-of-2, so the hot stage is measured, not guessed.
  * Usage: runMain graft.tools.ProfileFunnel <sfDir>
  */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.NbClassifier
    import graft.functions.Hdr

    def base = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "lang", "text")
    def docs = base.unionByName(base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        col("source"), col("lang"), col("text")))
    def tok = docs.select(col("doc_id"),
      col("source").isin("src0", "src1", "src2", "src3", "src4").as("is_pos"),
      explode(split(lower(col("text")), " ")).as("w"))
    def train = tok.filter(col("doc_id") % 10 < 8 && col("doc_id") < 100000)
    def nb = NbClassifier.score(tok.select("doc_id", "w"),
      NbClassifier.tokenClassCounts(train), NbClassifier.modelScalars(train))
    def s1 = nb.filter(col("pred_pos")).select("doc_id", "n_tokens")
    def s1docs = docs.join(s1.select("doc_id"), Seq("doc_id"), "left_semi")
    def scored = graft.operators.InfoStats
      .tokenEntropy(s1docs, "doc_id", "text")
      .join(s1docs.select("doc_id", "lang"), "doc_id")
    def th = Hdr.quantileEstimates(scored, Seq("lang"), "avg_fp20", 7,
      Seq((2L, 5L, "t_lb")), Some("n_tokens"))
    def s2 = scored.join(broadcast(th.select(col("lang"), col("t_lb"))), "lang")
      .filter(col("avg_fp20") >= col("t_lb")).select("doc_id", "n_tokens")
    def s2docs = docs.join(s2.select("doc_id"), Seq("doc_id"), "left_semi")
    def s3 = graft.operators.Dedup
      .scrubRepeatedSpans(s2docs, "doc_id", "text", n = 8)
      .filter(col("n_after") >= 30)
    def raw = docs.select(col("doc_id"),
      size(split(lower(col("text")), " ")).cast("long").as("n_tokens"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "raw_agg" -> (() => raw.agg(count(lit(1)), sum("n_tokens"))),
      "nb_only" -> (() => nb),
      "s1" -> (() => s1),
      "scored" -> (() => scored),
      "th" -> (() => th),
      "s2" -> (() => s2),
      "s2docs" -> (() => s2docs),
      "s3_scrub" -> (() => s3))
    variants.foreach { case (name, f) =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        println(f"[funnel] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
