package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: target docs speak "enX", others "zhX"
  private lazy val docs = ((1L to 20L).map(i =>
    (i, s"en${i % 5} en${(i + 1) % 5} en${(i + 2) % 5}", "en")) ++
    (21L to 40L).map(i =>
      (i, s"zh${i % 5} zh${(i + 1) % 5} zh${(i + 2) % 5}", "zh")))
    .toDF("doc_id", "text", "lang")

  private lazy val weights = Dsir
    .importanceWeights(docs, "doc_id", "text", col("lang") === "en")
    .join(docs.select("doc_id", "lang"), "doc_id")

  test("target-vocabulary docs score strictly above off-target docs") {
    val byLang = weights.groupBy("lang").agg(avg("avg_fp20").as("a"))
      .as[(String, Double)].collect().toMap
    assert(byLang("en") > byLang("zh"),
      s"en ${byLang("en")} should beat zh ${byLang("zh")}")
    // disjoint vocabularies: EVERY en doc outranks every zh doc
    val worstEn = weights.filter(col("lang") === "en")
      .agg(min("avg_fp20")).head.getLong(0)
    val bestZh = weights.filter(col("lang") =!= "en")
      .agg(max("avg_fp20")).head.getLong(0)
    assert(worstEn > bestZh, s"worst en $worstEn vs best zh $bestZh")
  }

  test("every document is scored, with its token count") {
    val got = weights.select("doc_id", "n_tok").as[(Long, Long)].collect().toMap
    assert(got.size === 40)
    assert(got.values.forall(_ === 3L))
  }

  test("bucket hashing is engine-portable md5, stable across repartition") {
    val a = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
      .select("doc_id", "logw_fp20").as[(Long, Long)].collect().toMap
    val b = Dsir.importanceWeights(docs.repartition(7), "doc_id", "text",
        col("lang") === "en")
      .select("doc_id", "logw_fp20").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("bucket-model joins broadcast (no shuffled join on the 256-row side)") {
    val plan = Dsir.importanceWeights(docs, "doc_id", "text", col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
