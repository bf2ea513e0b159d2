package graft.operators

import graft.SparkSpec

/** Dedup family: exact, MinHash signatures, LSH candidate pairs,
  * n-gram Jaccard, SimHash.
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "g", "the quick brown fox jumps over the lazy dog"),
      (2L, "g", "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "g", "the quick brown fox jumps over the lazy cat"), // near dup of 1
      (4L, "g", "completely different content about spark engines"),
      (5L, "g", "unrelated words nothing shared here at all today"))
      .toDF("doc_id", "source", "text")
  }

  test("exact dedup keeps one row per distinct text") {
    assert(Dedup.exact(docs, "text").count() === 4)
    val groups = Dedup.exactGroups(docs, "text")
      .collect().map(r => r.getLong(1)).sorted
    assert(groups === Array(1L, 1L, 1L, 2L))
  }

  test("identical docs share the full minhash signature; different docs do not") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(4L))
  }

  test("LSH candidates include the exact pair and exclude unrelated docs") {
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, disjoint absent") {
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    // 1 vs 3: 8 bigrams each, 7 shared → 7/9
    assert(math.abs(j((1L, 3L)) - 7.0 / 9.0) < 1e-12)
    assert(!j.contains((4L, 5L)))
  }

  test("simhash: identical texts equal; near dups closer than unrelated") {
    val s = Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) === s(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(1L), s(3L)) <= hamming(s(1L), s(5L)))
  }

  test("simhashPairs emits only pairs within the hamming radius") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("segment-blocked simhashPairs equals the all-pairs reference (pigeonhole loses nothing)") {
    val sig = Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (ia, sa) <- sig; (ib, sb) <- sig if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("allPairsCosine: prefix filtering equals the full inverted-index join") {
    // semantic reference: every pair sharing >= 1 shingle, integer
    // cross-multiply acceptance — recomputed from raw shingle sets
    val fixture = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sets = Dedup.shingleRows(fixture, "doc_id", "text").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      shared = (sa & sb).size.toLong if shared > 0
      if 100 * shared * shared >= 49L * sa.size * sb.size
    } yield (ia, ib, shared, sa.size.toLong, sb.size.toLong)).toSet
    val got = Dedup.allPairsCosine(fixture, "doc_id", "text", 7, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must contain qualifying pairs")
  }

  test("allPairsCosine: exact dup pair scores 1.0; the prefix index is a strict subset") {
    val pairs = Dedup.allPairsCosine(docs, "doc_id", "text", 7, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L).get
    assert(dup._3 === dup._4 && dup._4 === dup._5) // shared = |A| = |B|
    // unrelated docs (4, 5) share no shingles — must be absent
    assert(!pairs.exists(p => (p._1, p._2) == (4L, 5L)))
    // tau = 1 keeps only the exact dup
    val exact = Dedup.allPairsCosine(docs, "doc_id", "text", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((1L, 2L)))
  }

  test("lshCandidatePairs rejects band configs that would drop hashes") {
    val e = intercept[IllegalArgumentException] {
      Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 5, rowsPerBand = 2)
    }
    assert(e.getMessage.contains("multiple of rowsPerBand"))
  }

  test("incremental dedup: persisted signatures + a new batch equal a full recompute") {
    import spark.implicits._
    // day 1: signature table computed once and persisted (the cluster
    // path — signatures are written, not recomputed per query)
    val day1 = docs
    val sigPath = tmpDir("incsig") + "/sigs"
    Dedup.minhashSignatures(day1, "doc_id", "text", 4)
      .write.mode("overwrite").parquet(sigPath)
    // day 2: a new batch arrives; only ITS signatures are computed,
    // then unioned with the stored table
    val day2 = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, docs.filter($"doc_id" === 1L).select("text").collect().head.getString(0)))
      .toDF("doc_id", "text")
    val incSig = spark.read.parquet(sigPath)
      .unionByName(Dedup.minhashSignatures(day2, "doc_id", "text", 4))
    val incremental = Dedup.lshCandidatePairsFromSignatures(incSig, "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: recompute everything from scratch
    val full = Dedup.lshCandidatePairs(
      day1.select("doc_id", "text").unionByName(day2), "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incremental === full)
    assert(incremental.contains((1L, 101L))) // the day-2 duplicate is caught
  }

  test("incrementalLshPairs = full pair set minus old-old; is_cross marks the quadrant") {
    import spark.implicits._
    // old corpus contains an internal dup pair (1,2) that the incremental
    // run must NOT re-emit; the new batch has an internal dup (101,102)
    // and cross dups against old docs 1 and 2
    val oldDocs = docs // ids 1..5; (1,2) exact dups
    val newDocs = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),  // dup of 1,2
      (102L, "the quick brown fox jumps over the lazy dog"),  // dup of 101
      (103L, "entirely novel text with no earlier relatives whatsoever"))
      .toDF("doc_id", "text")
    val oldSig = Dedup.minhashSignatures(oldDocs, "doc_id", "text", 4).localCheckpoint()
    val newSig = Dedup.minhashSignatures(newDocs, "doc_id", "text", 4).localCheckpoint()
    val inc = Dedup.incrementalLshPairs(newSig, oldSig, "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    // reference: global pairs over old ∪ new, minus the old-old quadrant
    val full = Dedup.lshCandidatePairsFromSignatures(
        oldSig.unionByName(newSig), "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filterNot { case (a, b) => a <= 5 && b <= 5 }
    assert(inc.keySet === expected)
    assert(!inc.keySet.contains((1L, 2L))) // old-old dup stays un-recomputed
    assert(inc((1L, 101L)) === true)       // cross: canonical already ingested
    assert(inc((101L, 102L)) === false)    // in-batch: pick a canonical locally
    inc.foreach { case ((a, b), cross) => assert(cross === (a <= 5L), s"($a,$b)") }
  }

  test("incrementalDropIds: epoch dominance, in-batch id order, self never blocks") {
    import spark.implicits._
    val oldDocs = docs // ids 1..5; (1,2) exact dups
    val newDocs = Seq(
      // re-ingest of doc 5 (same id, same text — doc 5 collides with no
      // other old doc): its own old signature must NOT block it
      (5L, oldDocs.filter($"doc_id" === 5).select("text").collect().head.getString(0)),
      (101L, "the quick brown fox jumps over the lazy dog"), // dup of old 1,2 → dropped (epoch)
      (102L, "the quick brown fox jumps over the lazy dog"), // dup of 101 → dropped (in-batch order)
      (103L, "entirely novel text with no earlier relatives whatsoever"))
      .toDF("doc_id", "text")
    val oldSig = Dedup.minhashSignatures(oldDocs, "doc_id", "text", 4).localCheckpoint()
    val newSig = Dedup.minhashSignatures(newDocs, "doc_id", "text", 4).localCheckpoint()
    val dropped = Dedup.incrementalDropIds(newSig, oldSig, "doc_id", 4, 2)
      .collect().map(_.getLong(0)).toSet
    assert(!dropped.contains(5L), "re-ingested doc blocked by its own previous version")
    assert(dropped.contains(101L), "cross dup must be dropped regardless of id order")
    assert(dropped.contains(102L), "in-batch dup with a smaller-id collider must drop")
    assert(!dropped.contains(103L), "novel doc wrongly dropped")
  }

  test("contaminated flags only corpus docs sharing enough shingles with the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over dogs")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "look the quick brown fox appears here"), // shares: "the quick", "quick brown", "brown fox"
      (2L, "completely different words entirely now"),
      (3L, "quick brown things")) // shares only "quick brown"
      .toDF("doc_id", "text")
    val flagged = Dedup.contaminated(corpus, bench, "doc_id", "text", minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged === Map(1L -> 3L)) // doc 3 below threshold, doc 2 clean
  }

  test("bloomContaminated is bit-identical to contaminated (fpp tail removed by verify)") {
    import spark.implicits._
    val fixture = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = fixture.filter($"doc_id" >= 10)
    val bench = fixture.filter($"doc_id" < 10)
    val exact = Dedup.contaminated(corpus, bench, "doc_id", "text", minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Dedup.bloomContaminated(corpus, bench, "doc_id", "text", minShared = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloomed === exact)
    assert(exact.nonEmpty) // fixture must actually exercise the overlap
  }

  test("bloomContaminated with an empty benchmark flags nothing") {
    import spark.implicits._
    val corpus = Seq((10L, "some corpus text here")).toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.bloomContaminated(corpus, bench, "doc_id", "text").count() === 0)
  }

  test("containment scores a short benchmark item quoted inside a long doc ≈ 1") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a very long document embeds the quick brown fox somewhere inside its body"),
      (2L, "completely different words entirely now"))
      .toDF("doc_id", "text")
    val got = Dedup.containment(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 12 distinct bigrams, 3 shared ("the quick","quick brown","brown fox")
    assert(got(1L) === ((3L, 12L, 0.25)))
    assert(got(2L) === ((0L, 4L, 0.0)))
  }

  test("star edges give the same clusters as candidate pairs (linear vs quadratic)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 4).localCheckpoint()
    def labels(edges: org.apache.spark.sql.DataFrame) =
      Components.clusters(docs, "doc_id", edges, "id_a", "id_b")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaStars = labels(Dedup.lshStarEdges(sig, "doc_id", 4, 2))
    val viaPairs = labels(Dedup.lshCandidatePairsFromSignatures(sig, "doc_id", 4, 2))
    assert(viaStars === viaPairs)
    // and the star edge list is no larger than the pair list
    val nStars = Dedup.lshStarEdges(sig, "doc_id", 4, 2).count()
    val nPairs = Dedup.lshCandidatePairsFromSignatures(sig, "doc_id", 4, 2).count()
    assert(nStars <= nPairs, s"stars=$nStars pairs=$nPairs")
  }

  test("lshCandidatePairsBounded: hot bucket emits O(hubs·b) edges, not O(b²)") {
    import spark.implicits._
    // 60 identical docs — every band bucket holds all 60 (the template/
    // boilerplate hot-bucket shape the cap exists for)
    val hot = (1L to 60L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(hot, "doc_id", "text", 4).localCheckpoint()
    val full = Dedup.lshCandidatePairsFromSignatures(sig, "doc_id", 4, 2).count()
    val bounded = Dedup.lshCandidatePairsBounded(sig, "doc_id", 4, 2, hubs = 8).count()
    assert(full === 60L * 59 / 2, s"full=$full")          // O(b²): 1770
    assert(bounded === 8L * 52 + 8L * 7 / 2, s"bounded=$bounded") // hubs×rest + hub-clique: 444
    assert(bounded <= 60L * 2 * 8)                        // O(docs × bands × hubs)
    // connectivity survives the cap: the min id is always a hub, so the
    // bucket keeps a spanning star
    val ids = Dedup.lshCandidatePairsBounded(sig, "doc_id", 4, 2, hubs = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ids === (2L to 60L).map(i => (1L, i)).toSet)
  }

  test("lshCandidatePairsBounded equals the unbounded join when buckets fit the cap") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 4).localCheckpoint()
    val full = Dedup.lshCandidatePairsFromSignatures(sig, "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bounded = Dedup.lshCandidatePairsBounded(sig, "doc_id", 4, 2, hubs = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bounded === full)
  }

  test("ngramRows emits sliding n-token spans; short docs emit none") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val grams = Dedup.ngramRows(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(grams === Set((1L, "a b c"), (1L, "b c d"), (1L, "c d e")))
  }

  test("repeatedNgramStats flags cross-doc spans, not within-doc repeats") {
    import spark.implicits._
    // Docs 1 and 2 share the span "a b c"; doc 3 repeats "p q r" TWICE
    // within itself only (one distinct doc — must not be flagged); doc 4
    // is too short for any span.
    val docs = Seq(
      (1L, "a b c d"),       // spans: "a b c"*, "b c d"
      (2L, "z a b c"),       // spans: "z a b", "a b c"*
      (3L, "p q r p q r"),   // spans: p q r, q r p, r p q, p q r (4 total, 0 flagged)
      (4L, "x y")).toDF("doc_id", "text")
    val out = Dedup.repeatedNgramStats(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 4L, 0L, 0.0)))
  }

  test("scrubRepeatedSpans: keeper keeps the span, dup docs lose it, rest untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),      // keeper of "a b c" (min doc id) — untouched
      (2L, "z a b c"),      // loses positions of "a b c" → "z"
      (3L, "a b c"),        // fully covered → empty
      (4L, "p q r s")).toDF("doc_id", "text") // no repeats — untouched
    val out = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 4L, 4L, "a b c d"),
      (2L, 4L, 1L, "z"),
      (3L, 3L, 0L, ""),
      (4L, 4L, 4L, "p q r s")))
  }

  test("scrubRepeatedSpans: overlapping flagged grams merge into one maximal cut") {
    import spark.implicits._
    // "a b c d" appears in docs 1 and 2 → grams "a b c" and "b c d" both
    // flagged; doc 2's coverage is the union {positions of a b c d}, so
    // the cut is maximal, not per-gram fragments
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "x a b c d y")).toDF("doc_id", "text")
    val out = Dedup.scrubRepeatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq === Seq((1L, "a b c d"), (2L, "x y")))
  }
}
