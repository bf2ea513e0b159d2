package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Plan-quality regression tests: the physical plans the engine is
  * designed around (README "Design") must not silently degrade.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("s2: filter is pushed to the parquet scan") {
    val p = plan("s2_scan_filter_sort")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
  }

  test("s3: read schema is pruned to the projected columns") {
    val p = plan("s3_projection_prune")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderpriority:string>"), p)
  }

  test("j1: lookup join is a broadcast hash join") {
    val p = plan("j1_lookup_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("t1: top-k fuses into TakeOrderedAndProject (no global sort)") {
    val p = plan("t1_multikey_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1: aggregation is partial (map-side) before the exchange") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p)
  }

  test("w1: pagination window input is bounded by a distributed top-k first") {
    val p = plan("w1_pagination")
    // top-20 fuses into TakeOrderedAndProject; the single-partition window
    // then ranks ≤20 rows, never the whole table (round-1 scale-killer).
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("TweetSearch.page plans as distributed top-(offset+limit), no global window") {
    import graft.TestFixtures
    import spark.implicits._
    val tweets = TestFixtures.tweets.toDF()
    val p = graft.operators.TweetSearch.page(tweets, 2, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dedup_simhash_pairs: candidates come from equi-joins, never a cartesian") {
    val p = plan("dedup_simhash_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mm_image_neardup / mm_audio_neardup: banded candidates, never a cartesian") {
    Seq("mm_image_neardup", "mm_audio_neardup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("sim_pq_ann / sim_ivfpq_ann / sim_sq8_ann: quantized scan + distributed top-k, no corpus window sort") {
    Seq("sim_pq_ann", "sim_ivfpq_ann", "sim_sq8_ann").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("j12_bucketed_join: co-located SMJ + same-key agg, zero hash exchanges") {
    val p = plan("j12_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    // Bucketed scans feed the join AND the per-order aggregate; the only
    // Exchange allowed is the output-ordering rangepartitioning sort.
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("round-12 additions: keyed joins only, no data-x-data pairing") {
    // sim_recall_matrix / mv_join_delta / url_canonical_dedup /
    // dedup_allpairs_cosine: every join is keyed (token / id / segment
    // key); the only cross joins anywhere are 1-row scalar broadcasts
    // (the documented exemption), never data x data.
    Seq("mv_join_delta", "url_canonical_dedup", "dedup_allpairs_cosine")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q: $p")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      }
    // the recall matrix's brute-force member carries the 1-row
    // query-vector broadcast (a BNLJ by physical shape) — only a true
    // CartesianProduct is a defect there
    assert(!plan("sim_recall_matrix").contains("CartesianProduct"))
  }

  test("emb_random_projection: map-side only — no exchange but the output sort") {
    val p = plan("emb_random_projection")
    assert(!p.contains("Exchange hashpartitioning"), p)
    // the 16 projections are literal-plane DotProducts inside the scan's
    // codegen stage — no shuffle, no join, no window
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("sim_index_persist / sim_index_incremental: retrain-free, partition-pruned search") {
    // The persisted index's reason to exist: the SEARCH plan contains no
    // Lloyd round (no aggregate over corpus vectors — training happened
    // at build time, amortized like j13's bucketed writes), ranks via a
    // distributed top-k, and the probe reaches the posting scan as a
    // PARTITION filter on centroid_id (unprobed cells never open).
    Seq("sim_index_persist", "sim_index_incremental", "sim_index_filtered")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("HashAggregate"), s"$q: $p")
        assert(!p.contains("ObjectHashAggregate"), s"$q: $p")
        assert(p.contains("TakeOrderedAndProject"), s"$q: $p")
        assert(p.contains("PartitionFilters"), s"$q: $p")
      }
    // filtered search: the payload predicate reaches the posting SCAN
    // (pushed filter on the in-index label column), never a side join
    val pf = plan("sim_index_filtered")
    assert(pf.contains("LessThanOrEqual(label,3)"), pf)
    assert(!pf.contains("SortMergeJoin"), pf)
    // batch search: still zero Lloyd/corpus aggregates — the probe set
    // broadcasts, ranking is a per-qid window over the probed slice
    val pb = plan("sim_index_batch")
    assert(!pb.contains("HashAggregate"), pb)
    assert(pb.contains("PartitionFilters"), pb)
    assert(pb.contains("BroadcastHashJoin"), pb)
    assert(!pb.contains("CartesianProduct"), pb)
  }

  test("quality_nb_persist: scoring is retrain-free — model tables scanned, zero training aggregates") {
    val p = plan("quality_nb_persist")
    // the persisted model IS the plan's input: both tables scanned
    assert(p.contains("nbm_counts_"), p)
    assert(p.contains("nbm_scal_"), p)
    // training signatures absent: no class label anywhere, no vocab
    // countDistinct — the model is read, never re-derived per batch
    assert(!p.contains("is_pos"), p)
    assert(!p.toLowerCase.contains("distinct"), p)
    // contrast: the inline row trains in-plan
    assert(plan("quality_nb").toLowerCase.contains("distinct"))
  }

  test("s11_sql_text_search: SQL BM25 prunes the posting scan and equals TextIndex.bm25 row for row") {
    val p = plan("s11_sql_text_search")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("tix_tpost"), p)
    assert(!p.contains("documents.parquet"), p)
    val viaSql = SparkEntry.queries("s11_sql_text_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaApi = SparkEntry.queries("text_index_persist")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql === viaApi)
  }

  test("text_index_phrase: quoted query serves from the pruned positional postings") {
    val p = plan("text_index_phrase")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("tix_tpost"), p)
    assert(!p.contains("documents.parquet"), p)
    // the word-word intersection is an equi-join, never a cartesian
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s12_sql_phrase: SQL phrase face prunes the posting scan and equals TextIndex.phrase row for row") {
    val p = plan("s12_sql_phrase")
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("tix_tpost"), p)
    assert(!p.contains("documents.parquet"), p)
    assert(!p.contains("CartesianProduct"), p)
    val viaSql = SparkEntry.queries("s12_sql_phrase")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = SparkEntry.queries("text_index_phrase")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaApi)
  }

  test("s13_sql_hybrid: SQL hybrid face serves both arms pruned and equals the DataFrame hybrid row for row") {
    val p = plan("s13_sql_hybrid")
    // lexical arm = pruned text postings, vector arm = pruned IVF
    // postings; documents is never scanned — only the embeddings point
    // read for the query vector
    assert(p.contains("tix_tpost"), p)
    assert(p.contains("ivp_post"), p)
    assert(p.contains("PartitionFilters"), p)
    assert(!p.contains("documents.parquet"), p)
    assert(!p.contains("CartesianProduct"), p)
    val viaSql = SparkEntry.queries("s13_sql_hybrid")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    val viaApi = SparkEntry.queries("sim_index_hybrid")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    assert(viaSql === viaApi)
  }

  test("rag_context_pack: corpus touched once via a pushed id point-read of the fused winners") {
    val p = plan("rag_context_pack")
    // retrieval already ran on the indexes (driver-side, bounded); the
    // final plan only FETCHES the ≤10 winning docs — the id set reaches
    // the documents scan as a pushed filter, the fused scores broadcast
    assert(p.contains("In(doc_id"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("quality_calibration: persisted-model scoring, integer banding — retrain-free, no corpus window") {
    val p = plan("quality_calibration")
    // scored against the persisted model tables, like quality_nb_persist
    assert(p.contains("nbm_counts_"), p)
    assert(p.contains("nbm_scal_"), p)
    assert(!p.contains("is_pos"), p)
    assert(!p.toLowerCase.contains("distinct"), p)
    // banding is a fixed-width integer map + one hash agg — never an
    // ntile/row_number window over the held-out slice
    assert(!p.contains("Window"), p)
    // bands clamp to ±8 and cover the held-out slice exactly
    val rows = SparkEntry.queries("quality_calibration")(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) >= -8 && r.getLong(0) <= 8))
    val heldOut = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 >= 8).count()
    assert(rows.map(_.getLong(1)).sum === heldOut)
  }

  test("sim_index_pq family: ADC over pruned code postings, retrain-free, id-keyed re-rank") {
    Seq("sim_index_pq", "sim_index_pq_filtered", "sim_index_pq_incremental")
      .foreach { q =>
        val p = plan(q)
        // zero Lloyd rounds / corpus aggregates — both models persisted
        assert(!p.contains("HashAggregate"), s"$q: $p")
        assert(!p.contains("ObjectHashAggregate"), s"$q: $p")
        // probe = partition pruning on the code postings
        assert(p.contains("PartitionFilters"), s"$q: $p")
        // ADC pool and final ranking are distributed top-ks
        assert(p.contains("TakeOrderedAndProject"), s"$q: $p")
        // the exact re-rank fetches pool vectors through an id-keyed
        // BROADCAST join against the source table — never a shuffle of
        // the corpus, never a cartesian
        assert(p.contains("BroadcastHashJoin"), s"$q: $p")
        assert(!p.contains("SortMergeJoin"), s"$q: $p")
        assert(!p.contains("CartesianProduct"), s"$q: $p")
      }
    // filtered: the payload predicate is PUSHED to the code-posting scan
    val pf = plan("sim_index_pq_filtered")
    assert(pf.contains("LessThanOrEqual(label,3)"), pf)
    // batch: still zero Lloyd/corpus aggregates; probe rows broadcast
    // onto the pruned code scan; per-qid ranking is a window, and the
    // exact re-rank is the same id-keyed broadcast fetch
    val pb = plan("sim_index_pq_batch")
    assert(!pb.contains("HashAggregate"), pb)
    assert(pb.contains("PartitionFilters"), pb)
    assert(pb.contains("BroadcastHashJoin"), pb)
    assert(!pb.contains("SortMergeJoin"), pb)
    assert(!pb.contains("CartesianProduct"), pb)
  }

  test("sim_index_delete: tombstone anti-join is a bounded broadcast — search stays pruned and aggregate-free") {
    val p = plan("sim_index_delete")
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("ObjectHashAggregate"), p)
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // the exclusion is a broadcast LeftAnti on the bounded tombstone
    // table — never a shuffle of the postings
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("s9_sql_index_search: DPP prunes the posting scan; SQL ≡ IvfIndex.search row for row") {
    val p = plan("s9_sql_index_search")
    // the 2-row probe CTE reaches the partitioned posting scan as a
    // DYNAMIC partition-pruning filter — the SQL plan's equivalent of
    // the driver-side probe (unprobed cells never open)
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // still retrain-free: no Lloyd round, no corpus aggregate anywhere
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
    // and the SQL statement returns EXACTLY what the Scala API returns
    val viaSql = SparkEntry.queries("s9_sql_index_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = SparkEntry.queries("sim_index_persist")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaApi)
  }

  test("s14_sql_pq_search: DPP prunes the code-posting scan; SQL ≡ IvfIndex.searchPq row for row") {
    val p = plan("s14_sql_pq_search")
    // the probe CTE reaches the partitioned code-posting scan as a
    // dynamic partition-pruning filter, and the ADC stage touches only
    // code columns — no original vector arithmetic before the re-rank
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val viaSql = SparkEntry.queries("s14_sql_pq_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = SparkEntry.queries("sim_index_pq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaApi)
  }

  test("text_index_persist: BM25 serves from the pruned persisted postings — corpus text never scanned") {
    val p = plan("text_index_persist")
    // the query terms' buckets reach the posting scan as PARTITION
    // filters (≤3 of 32 partitions open) and the term predicate pushes
    // to the surviving files' row groups
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("In(term"), p)
    assert(p.contains("tix_tpost"), p)
    // the serving plan never touches the documents table — the index's
    // reason to exist (the reference regex-scans every text per search)
    assert(!p.contains("documents.parquet"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sim_index_hybrid: both arms serve from persisted indexes — zero corpus scans, both pruned") {
    val p = plan("sim_index_hybrid")
    // lexical arm = pruned text postings, vector arm = pruned IVF
    // postings; the only base-table touch is the one pushed point read
    // of the query vector (embeddings) — documents is never scanned
    assert(p.contains("tix_tpost"), p)
    assert(p.contains("ivp_post"), p)
    assert(p.contains("PartitionFilters"), p)
    assert(!p.contains("documents.parquet"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pipeline_incremental: only the new batch flows — base never rescanned, old-old never joins") {
    val p = plan("pipeline_incremental")
    // the merge plan reads ONLY persisted state (manifest/sigidx/store
    // managed tables) plus the checkpointed new-batch rows: zero scans
    // of the base corpus parquet, and no trace of the old-snapshot
    // derivation (its ' v0' stale-text marker) — the base-rescan lock
    assert(!p.contains("documents.parquet"), p)
    assert(p.contains("pinc_sigidx"), p)
    assert(p.contains("pinc_store"), p)
    assert(!p.contains("v0"), p)
    // dedup verdicts come from keyed band joins, never data-x-data
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("pipeline_assemble_incremental: carried docs ride persisted encodings — no base rescan, no corpus re-encode") {
    val p = plan("pipeline_assemble_incremental")
    // the incremental manifest reads ONLY persisted previous-build
    // artifacts (per-doc encodings + shard manifest) plus the
    // checkpointed surviving-batch encodings: zero scans of the base
    // corpus parquet, no trace of the old-snapshot derivation (its
    // ' v0' stale-text marker), and no tokenize/encode of carried docs
    // (the encode subtree sits behind the survivors' checkpoint)
    assert(p.contains("painc_enc"), p)
    assert(p.contains("painc_manifest"), p)
    assert(!p.contains("documents.parquet"), p)
    assert(!p.contains("v0"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // packing stays shard-partitioned, never a global window
    assert(!p.contains("SinglePartition, Window"), p)
  }

  test("pipeline_assemble_publish: the no-change night detects an empty delta and serves the published manifest") {
    import org.apache.spark.sql.functions.col
    // the pass against the PUBLISHED snapshot must classify every doc
    // as unchanged — zero batch docs, zero affected shards — and the
    // output must be the persisted manifest rows verbatim
    val p = plan("pipeline_assemble_publish")
    assert(p.contains("painc2_manifest"), p)
    assert(!p.contains("documents.parquet"), p)
    assert(!p.contains("v0"), p)
    assert(!p.contains("CartesianProduct"), p)
    val got = SparkEntry.queries("pipeline_assemble_publish")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val published = spark.table(
      s"painc2_manifest_${graft.util.Paths.corpusFingerprint(sf, Seq("documents"))}")
      .orderBy(col("shard")).collect().map(_.toSeq).toSeq
    assert(got === published)
  }

  test("j13_bucketed_reuse: the REUSE query is also exchange-free (amortization proof)") {
    // j12 proves the layout works the day it is written; j13 proves every
    // LATER consumer of an existing bucketed pair still joins + aggregates
    // with zero hash exchanges — the pay-shuffle-once claim itself.
    val p = plan("j13_bucketed_reuse")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("quality_nb / text_phrase_search / report_source_overlap: keyed joins only") {
    Seq("quality_nb", "text_phrase_search", "report_source_overlap").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      // quality_nb's model scalars ride a 1-row broadcast cross join
      // (the text_lm_score pattern) — allowed; data-data BNLJ is not.
      if (q != "quality_nb")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("quality_ensemble: four broadcast-model signal passes, vote joins keyed — no data-x-data pairing") {
    val p = plan("quality_ensemble")
    // each signal is one linear pass with a broadcast model; the vote is
    // a doc_id-keyed 4-way join of doc-sized frames. The NB/DSIR model
    // scalars ride 1-row broadcast cross joins (the quality_nb
    // exemption) — a true CartesianProduct is the defect.
    assert(!p.contains("CartesianProduct"), p)
    // the per-lang entropy threshold joins as a broadcast (bounded
    // bucket table), never a shuffled fact-fact join of the signal pass
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dedup_span_scrub: span flags join on the hash key, never doc-doc pairs") {
    val p = plan("dedup_span_scrub")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_ngram_jaccard: no forced broadcast of the corpus-sized count table") {
    val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("strategy=broadcast"), opt)
  }

  test("sample_bernoulli: map-only plan — the sample is a scan-stage filter, no exchange") {
    val p = plan("sample_bernoulli")
    // the md5-threshold predicate evaluates inside the scan's codegen
    // stage; the only allowed exchange is the output sort's
    assert(p.contains("Filter"), p)
    assert(!p.split("Sort").head.contains("Exchange"),
      s"exchange before the sampling filter:\n$p")
  }

  test("emb_quantize: no shuffle — quantization is a pure projection") {
    val df = SparkEntry.queries("emb_quantize")(spark, sf)
    val noSort = df.queryExecution.executedPlan.toString
    // project+scan below the output sort; nothing between them shuffles
    assert(!noSort.split("Sort").head.contains("Exchange"), noSort)
  }

  test("sample_stratified: bounded per-stratum aggregation, no full-stratum window sort") {
    val p = plan("sample_stratified")
    // the winner set comes from a partially-aggregated bounded min-k
    // (O(k) state), NOT a row_number window that externally sorts the
    // whole stratum in one task (the 100 TB single-task trap)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_mink"), p)
    // winner keys broadcast back onto the source rows
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("sample_weighted: map-only — the per-row threshold is a scan-stage filter") {
    val p = plan("sample_weighted")
    assert(p.contains("Filter"), p)
    assert(!p.split("Sort").head.contains("Exchange"),
      s"exchange before the weighted-sampling filter:\n$p")
  }

  test("hh_event_types: heavy hitters aggregate partially before the exchange") {
    val p = plan("hh_event_types")
    assert(p.contains("partial_freqitems"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("stream_interval_join: range-condition join, never a cartesian") {
    val p = plan("stream_interval_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("a15_ntile: window is partitioned (no single-task global window)") {
    val p = plan("a15_ntile")
    assert(p.contains("hashpartitioning(c_nationkey"), p)
    assert(!p.contains("SinglePartition, Window"), p)
  }

  test("k5_upsert: full-outer merge is a hash/merge join, never a nested loop") {
    val p = plan("k5_upsert")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("dedup_decontaminate: the benchmark shingle set is the broadcast side") {
    val p = plan("dedup_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("decon_bloom: corpus stream is bloom-filtered map-side before the verify join") {
    val p = plan("decon_bloom")
    // the codegen'd probe gates the corpus side...
    assert(p.contains("might_contain"), p)
    // ...and the exact verify of the surviving candidates broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("layout_zorder: one exchange total — the bucket aggregation's") {
    val p = plan("layout_zorder")
    // morton key + bucket are pure column math computed in the scan
    // stage; anything beyond the single aggregation exchange (plus AQE
    // bookkeeping) means the bit math fell out of the map side
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("text_quality_gate: map-only rule stack (no exchange before the sort)") {
    val p = plan("text_quality_gate")
    assert(!p.split("Sort").head.contains("Exchange"), p)
  }

  test("pack_sequences: packing window is shard-partitioned, never global") {
    val p = plan("pack_sequences")
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("SinglePartition, Window"), p)
  }

  test("graph_pagerank: every iteration joins on keys, never a cartesian") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("lshCandidatePairsBounded: hub selection is a bounded partial aggregation, not a window") {
    // the hub-capped band join must pick its per-bucket hubs with the
    // O(k)-state MinK aggregator — a row_number window would sort the
    // whole hot bucket in one task. (graph_pagerank's own plan string
    // can't be inspected for this: its localCheckpoint barriers replace
    // upstream stages with RDD scans, so the operator is locked direct.)
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, sf)
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 4)
    val p = Dedup.lshCandidatePairsBounded(sig, "doc_id", 4, 2, hubs = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_mink"), p)
    // no window partitioned by the band bucket keys (per-doc lead()
    // windows from the inlined shingle computation are fine — bounded by
    // document length, not bucket size)
    assert(!p.contains("windowspecdefinition(h0"), p)
    assert(!p.contains("windowspecdefinition(h2"), p)
  }

  test("incrementalLshPairs: the old index is a probe side only — old-old never joins") {
    // built WITHOUT localCheckpoint so the batch predicates stay visible
    // as pushed filters in the scans: the old-corpus side must appear
    // exactly once per band (right/probe side of the band join); a
    // regression to joining (old ∪ new) × (old ∪ new) would double it
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, sf)
    def sigFor(pred: org.apache.spark.sql.Column) =
      Dedup.minhashSignatures(docs.filter(pred), "doc_id", "text", 4)
    import org.apache.spark.sql.functions.col
    val p = Dedup.incrementalLshPairs(
        sigFor(col("doc_id") >= 25), sigFor(col("doc_id") < 25), "doc_id", 4, 2)
      .queryExecution.executedPlan.toString
    val nBands = 2
    assert("LessThan\\(doc_id,25\\)".r.findAllIn(p).length === nBands, p)
    assert("GreaterThanOrEqual\\(doc_id,25\\)".r.findAllIn(p).length === 2 * nBands, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("skew_salted_agg: both phases aggregate partially before exchanging") {
    val p = plan("skew_salted_agg")
    assert(p.contains("partial_sum"), p)
  }

  test("skew_adaptive_agg: ONE fact scan through a conditional salt, no union") {
    val p = plan("skew_adaptive_agg")
    // the routed agg reads lineitem exactly once (the MG probe is a
    // separate bounded pre-pass, already executed when the plan builds);
    // the old hot-filter/cold-filter union scanned it twice
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
    assert(!p.contains("Union"), p)
    // partial aggregation on (key, __salt) before the exchange
    assert(p.contains("__salt"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_substring: span stats are aggregate+join — no cartesian, no all-pairs") {
    val p = plan("dedup_substring")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the distinct-doc count must partially aggregate before the shuffle
    assert(p.contains("partial_count"), p)
  }

  test("a21_pct_chain: continuous-domain percentiles never build a percentile() buffer") {
    val p = plan("a21_pct_chain")
    assert(!p.contains("percentile("), p)
    // each refinement level is a real partial aggregation before its
    // window — no task ever holds a group's raw rows
    assert(p.contains("partial_count"), p)
  }

  test("a20_mad: exact MAD is histogram-based — no percentile() value buffer") {
    val p = plan("a20_mad")
    // Spark's exact percentile buffers every distinct value per group in
    // one aggregation task; the bounded-domain histogram plan must not
    // regress to it
    assert(!p.contains("percentile("), p)
    // cumulative-rank pass over the value histogram
    assert(p.contains("Window"), p)
    // the 3-row median table broadcasts back onto the deviation histogram
    assert(p.contains("BroadcastHashJoin"), p)
    // the 2-column projection is cached across the med + mad passes —
    // four lineage evaluations must not mean four parquet scans
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("sketch_pct_bound: only the sketch is approximate — exact side is histogram-based") {
    val p = plan("sketch_pct_bound")
    assert(p.contains("approx_percentile"), p)
    assert(!p.replace("approx_percentile", "").contains("percentile("), p)
  }

  test("dedup_containment: benchmark shingles broadcast; corpus side never does") {
    val p = plan("dedup_containment")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("text_boilerplate: span generation is one doc-partitioned window, no cartesian") {
    val p = plan("text_boilerplate")
    assert(p.contains("hashpartitioning(doc_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_minhash_est: estimate and exact sides join on keys, never a cartesian") {
    val p = plan("dedup_minhash_est")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sim_filtered_ann: the metadata predicate is pushed to the vector scan") {
    val p = plan("sim_filtered_ann")
    assert(p.contains("LessThanOrEqual(label,3)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("hdr_quantiles: bucket counts aggregate partially; no percentile() buffer") {
    val p = plan("hdr_quantiles")
    // the two-phase hash aggregation to bucket counts is the scale story:
    // map-side combine bounds the shuffle at O(tasks × buckets-per-group)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("percentile"), p)
    // the window runs over bucket rows, partitioned by the group key
    assert(p.contains("hashpartitioning(l_returnflag"), p)
  }

  test("text_postings: segment shards aggregate on keys — no cartesian, no global window") {
    val p = plan("text_postings")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    // token-level top-50 is a distributed top-k, not a global sort+limit
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("snapshot_diff: both sides reduce to (key, hash) before the full-outer join") {
    val p = plan("snapshot_diff")
    // the join must move 16-byte hashes, not documents: md5 is computed
    // below the join (in each side's project), so no `text` column
    // appears in any exchange's output schema
    assert(!p.contains("CartesianProduct"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, p)
    exchanges.foreach(l => assert(!l.contains("text#"), l))
  }

  test("sketch_kmv: the bounded sketch aggregates partially before the exchange") {
    val p = plan("sketch_kmv")
    // KmvSketch is an object aggregator: partial ObjectHashAggregate on
    // the map side is what makes it a sketch (each task reduces to <=k
    // values) rather than a disguised exact-distinct shuffle
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_kmvsketch") || p.contains("partial_KmvSketch"), p)
  }

  test("ts_gapfill: fill window is entity-partitioned; spine join is never a cartesian") {
    val p = plan("ts_gapfill")
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j11: fact-fact join takes the sort-merge path (the 100 TB default)") {
    val p = plan("j11_sortmerge")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    // and the post-join aggregation still combines map-side
    assert(p.contains("partial_count") || p.contains("Partial"), p)
  }

  test("dedup_semantic: pair join is centroid-keyed — never a cartesian") {
    val p = plan("dedup_semantic")
    assert(!p.contains("CartesianProduct"), p)
    // The ONLY nested-loop join allowed is the k-row broadcast centroid
    // model inside the row-based assignment (bounded side by
    // construction). The ranked subplan feeds the pair join's a-side,
    // b-side, and the final classification join, so that one bounded
    // BNLJ appears up to three times in the printed tree; the
    // corpus-sized duplicate-candidate join itself must stay equi-keyed
    // on centroid_id (no cartesian above).
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 3, p)
  }

  test("f3: language filter prunes partitions on a lang-partitioned table") {
    import graft.ingest.TweetIngest
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("planspec")
    val line =
      """{"id": 1, "id_str": "1", "text": "hello", "lang": "en", "created_at": "Sun Apr 12 16:48:01 +0000 2020", "user": {"id": 5, "id_str": "5", "screen_name": "u", "created_at": "Sun Apr 12 16:48:01 +0000 2020"}}"""
    val line2 = line.replace(""""lang": "en"""", """"lang": "fr"""").replace(""""id_str": "1"""", """"id_str": "2"""")
    Files.write(Paths.get(dir, "raw.json"), (line + "\n" + line2).getBytes("UTF-8"))
    TweetIngest.run(spark, dir + "/raw.json", dir + "/tweets", dir + "/users")
    val q = spark.read.parquet(dir + "/tweets").filter("lang = 'en'")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p)
    assert(q.count() === 1)
  }

  test("punkt: model joins broadcast; token stream never sort-merges or cartesians") {
    for (name <- Seq("text_sentences", "text_sentences_full",
        "text_punkt_starters")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: $p")
      assert(!p.contains("SortMergeJoin"), s"$name: $p")
      assert(!p.contains("CartesianProduct"), s"$name: $p")
      assert(p.contains("hashpartitioning(doc_id"), s"$name: $p")
    }
  }

  test("punkt trainer: vocabulary agg is partial before the exchange; scalars broadcast") {
    val p = plan("text_punkt_train")
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    assert(!p.contains("CartesianProduct"), p)
    // The 1-row corpus-scalar cross join is a broadcast nested loop —
    // the only acceptable NLJ shape (k-row model side).
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("layout_zrange: z intervals prune PARTITIONS and push to the zkey sort column") {
    val p = plan("layout_zrange")
    // the zbucket IN (...) literal list is partition pruning at planning
    // (at tiny SF the z space collapses into bucket 0, so the list may
    // fold to an equality — the lock is zbucket appearing as a
    // PARTITION filter, not a data filter)
    assert("PartitionFilters: \\[[^\\]]*zbucket".r.findFirstIn(p).isDefined, p)
    // the interval OR-chain reaches the parquet reader on the sort col
    assert(p.contains("PushedFilters:") && p.contains("zkey"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("scd2_apply: only key-equi joins, never a cartesian or per-row lookup") {
    // Catalyst specializes the authored full-outer into ≤3 equi joins
    // with the branch filters pushed through — same children, reused
    // exchanges/broadcasts; the lock is the JOIN CLASS, not the count.
    val p = plan("scd2_apply")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert("sortmergejoin|broadcasthashjoin|shuffledhashjoin".r
      .findAllIn(p.toLowerCase).length <= 3, p)
  }

  test("s15_sql_zrange: the SQL face rides the same pruned scan, row-for-row vs the DataFrame face") {
    val p = plan("s15_sql_zrange")
    assert("PartitionFilters: \\[[^\\]]*zbucket".r.findFirstIn(p).isDefined, p)
    assert(p.contains("PushedFilters:") && p.contains("zkey"), p)
    val sqlRows = SparkEntry.queries("s15_sql_zrange")(spark, sf).collect().toSeq
    val dfRows = SparkEntry.queries("layout_zrange")(spark, sf).collect().toSeq
    assert(sqlRows === dfRows)
  }

  test("mm_audio_opus_toc: one decode pass, no join, no shuffle before the sort") {
    val p = plan("mm_audio_opus_toc")
    assert(!p.toLowerCase.contains("join"), p)
    assert("Exchange".r.findAllIn(p).length === 1, p) // the output range sort only
  }
}
