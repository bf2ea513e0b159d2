package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{IvfIndex, TextIndex}
import graft.streaming.EventStream

/** The EMPTY-INPUT contract, as a category: every `EventStream.drain*`
  * and every TextIndex/IvfIndex lifecycle op driven with an empty
  * corpus / empty delta / empty query set must return its contract
  * schema (or leave the index untouched) — never throw, never
  * null-poison downstream statistics. This class of bug appeared three
  * rounds running (r14 drainIndexSearch PATH_NOT_FOUND, r15 text-stats
  * null fold); this spec kills it wholesale.
  */
class DegenerateInputSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, sf)
    .filter(col("event_id") < 200).localCheckpoint()
  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "text").localCheckpoint()
  private lazy val emb = Tables.embeddings(spark, sf)
    .filter(col("vec_id") < 60).localCheckpoint()

  private def assertEmptyWithSchema(df: DataFrame, cols: Seq[String],
      hint: String): Unit = {
    assert(df.columns.toSeq === cols, s"$hint schema")
    assert(df.count() === 0L, s"$hint row count")
  }

  test("event-shaped drains return contract schemas on an EMPTY stream input") {
    val e0 = events.limit(0)
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    assertEmptyWithSchema(
      EventStream.drainEnrich(spark, e0, dim, "user_id", "c_custkey"),
      events.columns.toSeq :+ "c_mktsegment", "drainEnrich")
    assertEmptyWithSchema(
      EventStream.drainUpsert(spark, e0, "event_id"),
      events.columns.toSeq, "drainUpsert")
    assertEmptyWithSchema(
      EventStream.drainDedup(spark, e0, Seq("event_id")),
      events.columns.toSeq, "drainDedup")
    assertEmptyWithSchema(
      EventStream.drainHdrSketch(spark,
        e0.select(col("event_type"), col("value").cast("long").as("c")), "c"),
      Seq("event_type", "n", "p50_lb", "p90_lb"), "drainHdrSketch")
    assertEmptyWithSchema(
      EventStream.drainRunningCounts(spark, e0),
      Seq("user_id", "n_events"), "drainRunningCounts")
  }

  test("drainLateAudit: an empty late night and a fully-empty feed both keep the contract") {
    // the common degenerate night: on-time rows, zero late arrivals
    val (sink1, late1, dropped1) =
      EventStream.drainLateAudit(spark, events, events.limit(0))
    assert(sink1.columns.toSeq ===
      Seq("window_start", "event_type", "cnt", "sum_value_cents"))
    assert(late1 === 0L && dropped1 === 0L)
    // nothing at all arrived
    val (sink2, late2, dropped2) =
      EventStream.drainLateAudit(spark, events.limit(0), events.limit(0))
    assertEmptyWithSchema(sink2,
      Seq("window_start", "event_type", "cnt", "sum_value_cents"),
      "drainLateAudit empty")
    assert(late2 === 0L && dropped2 === 0L)
  }

  test("index drains: an EMPTY delta stream leaves the index serving its base state") {
    // splitId above every id → the streamed side is empty in all four
    val stats = EventStream.drainIndexIngest(spark, emb,
      "vec_id", "embedding", splitId = 1000L)
    assert(stats.columns.toSeq ===
      Seq("centroid_id", "n_vectors", "min_id", "max_id"))
    assert(stats.agg(sum("n_vectors")).head.getLong(0) === emb.count())
    val flat = EventStream.drainIndexMaintain(spark, emb,
      "vec_id", "embedding", splitId = 1000L, deleteIds = Nil,
      queryId = 0L, k = 5, nprobe = 2)
    assert(flat.columns.toSeq === Seq("vec_id", "centroid_id", "score"))
    assert(flat.count() === 5L)
    val pq = EventStream.drainIndexMaintainPq(spark, emb,
      "vec_id", "embedding", splitId = 1000L, deleteIds = Nil,
      queryId = 0L, k = 3, nprobe = 2, poolFactor = 4,
      dim = 64, m = 4, pqK = 4)
    assert(pq.columns.toSeq === Seq("vec_id", "centroid_id", "score"))
    assert(pq.count() === 3L)
    val text = EventStream.drainTextMaintain(spark,
      docs.filter(col("doc_id") < 60), "doc_id", "text",
      splitId = 1000L, deleteIds = Nil,
      terms = Seq("join", "vector", "stream"), limit = 10)
    assert(text.columns.toSeq === Seq("doc_id", "score_u", "n_terms"))
    assert(text.count() > 0L)
  }

  test("serving drains: EMPTY query/score sets return contract schemas") {
    val n = IvfIndex.names("degen_iv", "spec")
    if (!IvfIndex.exists(spark, n))
      IvfIndex.build(emb, "vec_id", "embedding", n, k = 8)
    assertEmptyWithSchema(
      EventStream.drainIndexSearch(spark, n, emb.limit(0),
        "vec_id", "embedding", k = 3, nprobe = 2),
      Seq("qid", "vec_id", "centroid_id", "score"), "drainIndexSearch")
    val (countsT, scalT) = TextMultimodalQueries.ensureNbModel(spark, sf)
    val nb = EventStream.drainNbScore(spark,
      Tables.documents(spark, sf).limit(0), countsT, scalT)
    assert(nb.count() === 0L, "drainNbScore rows")
    assert(nb.columns.contains("doc_id") && nb.columns.contains("score_fp20"),
      s"drainNbScore schema: ${nb.columns.mkString(",")}")
  }

  test("TextIndex lifecycle: empty corpus, absent-id takedown, no-tombstone compact") {
    val terms = Seq("join", "vector", "stream")
    // build on an EMPTY corpus: stats must be (0, 0), serving empty
    val n0 = TextIndex.names("degen_t0", "spec")
    TextIndex.build(docs.limit(0), "doc_id", "text", n0)
    val st = spark.table(n0.stats).collect().head
    assert((st.getLong(0), st.getLong(1)) === (0L, 0L))
    assertEmptyWithSchema(TextIndex.bm25(spark, n0, terms, 10),
      Seq("doc_id", "score_u", "n_terms"), "bm25 on empty index")
    assertEmptyWithSchema(
      TextIndex.phrase(spark, n0, Seq("table", "part")),
      Seq("doc_id", "pos"), "phrase on empty index")
    // compact with no tombstone table: a no-op, not an error
    TextIndex.compact(spark, n0)
    // takedown of ids the index never held: serving unchanged, compact
    // folds nothing, stats unchanged
    val n1 = TextIndex.names("degen_t1", "spec")
    TextIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", n1)
    val before = TextIndex.bm25(spark, n1, terms, 100).collect().toSeq
    val stBefore = spark.table(n1.stats).collect().head.toSeq
    TextIndex.delete(spark, n1, Seq(100000L, 100001L))
    assert(TextIndex.bm25(spark, n1, terms, 100).collect().toSeq === before)
    TextIndex.compact(spark, n1)
    assert(TextIndex.bm25(spark, n1, terms, 100).collect().toSeq === before)
    assert(spark.table(n1.stats).collect().head.toSeq === stBefore)
    assert(!spark.catalog.tableExists(TextIndex.tombstoneTable(n1)))
    // DataFrame delete with an EMPTY delta (the no-change night)
    import spark.implicits._
    TextIndex.delete(spark, n1, Seq.empty[Long].toDF("doc_id"))
    assert(TextIndex.bm25(spark, n1, terms, 100).collect().toSeq === before)
    TextIndex.compact(spark, n1)
    assert(spark.table(n1.stats).collect().head.toSeq === stBefore)
  }

  test("IvfIndex lifecycle: empty batch append, absent-id takedown, empty batch search") {
    val n = IvfIndex.names("degen_iv2", "spec")
    if (!IvfIndex.exists(spark, n))
      IvfIndex.build(emb, "vec_id", "embedding", n, k = 8)
    def top(k: Int) = IvfIndex
      .search(spark, n, "vec_id", "embedding", 0L, k = k, nprobe = 2,
        queryFrom = Some(emb))
      .collect().map(_.getLong(0)).toSeq
    val before = top(10)
    // empty batch: the no-new-vectors night
    IvfIndex.appendBatch(spark, n, emb.limit(0), "vec_id", "embedding")
    assert(top(10) === before)
    // delete ids the index never held, then fold: nothing changes
    IvfIndex.delete(spark, n, "vec_id", Seq(100000L, 100001L))
    assert(top(10) === before)
    IvfIndex.compact(spark, n, "vec_id")
    assert(top(10) === before)
    // k larger than the corpus: every PROBED live row ranks (an IVF
    // search never sees beyond its probe set — that's the design),
    // no error, no duplicates
    val all = top(10000)
    assert(all.size >= before.size && all.size < emb.count())
    assert(all.distinct.size === all.size)
    // batch search over an EMPTY query set: contract schema
    assertEmptyWithSchema(
      IvfIndex.searchBatch(spark, n, "vec_id", "embedding", Nil,
        k = 3, nprobe = 2, queryFrom = Some(emb)),
      Seq("qid", "vec_id", "centroid_id", "score"), "searchBatch(Nil)")
    // quantized layout: empty batch append leaves serving untouched
    val pn = IvfIndex.pqNames("degen_pq", "spec")
    if (!IvfIndex.pqExists(spark, pn))
      IvfIndex.buildPq(emb, "vec_id", "embedding", pn, k = 8,
        dim = 64, m = 4, pqK = 4)
    val pqBefore = IvfIndex.searchPq(spark, pn, "vec_id", "embedding", 0L,
      k = 5, nprobe = 2, poolFactor = 4, queryFrom = emb)
      .collect().map(_.getLong(0)).toSeq
    IvfIndex.appendBatchPq(spark, pn, emb.limit(0), "vec_id", "embedding")
    assert(IvfIndex.searchPq(spark, pn, "vec_id", "embedding", 0L,
      k = 5, nprobe = 2, poolFactor = 4, queryFrom = emb)
      .collect().map(_.getLong(0)).toSeq === pqBefore)
  }
}
