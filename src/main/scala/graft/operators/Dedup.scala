package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Blooms, Text}

/** Deduplication operators for large-scale corpus curation
  * (beyond-reference north star; see BASELINE.json).
  *
  * Scale design: every variant is a shuffle-bounded DataFrame plan —
  * signatures are computed map-side (pure column expressions, no UDFs),
  * candidate generation shuffles only on compact hash keys, and pairwise
  * verification happens only inside candidate buckets (never all-pairs).
  *
  * Cache lifecycle: signature tables are materialized via
  * `localCheckpoint(eager = true)` — unlike `.cache()`, each call builds a
  * fresh checkpointed RDD that the ContextCleaner releases when the result
  * is dropped, so repeated calls neither pile up storage nor log
  * "already cached" warnings. On a real cluster prefer writing the
  * signature table once (parquet) and passing it to the
  * `...FromSignatures` variants — localCheckpoint blocks don't survive
  * executor loss.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct content hash. */
  def exact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("__h", md5(col(textCol))).dropDuplicates("__h").drop("__h")

  /** Exact-dup groups: hash → multiplicity (diagnostics / dup reporting). */
  def exactGroups(df: DataFrame, textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("h")).agg(count(lit(1)).as("cnt"))

  /** One row per word-bigram shingle: (`idCol`, extraCols..., sh).
    *
    * posexplode + lead() window instead of nested array HOFs: the HOF
    * formulation (transform over sequence with element_at(split(...)))
    * gets its `split` inlined into every lambda by CollapseProject and
    * falls out of whole-stage codegen — measured 224ms/row interpreted.
    * This shape is codegen end-to-end, and the window's doc-id shuffle is
    * reused by downstream per-doc aggregation (same key, no extra
    * exchange). Docs with <2 tokens yield no rows.
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String,
      extraCols: Seq[String] = Nil): DataFrame = {
    val keep = (idCol +: extraCols).map(col)
    val tok = df.select(keep :+ posexplode(Text.tokens(col(textCol))).as(Seq("pos", "w")): _*)
    tok
      .withColumn("__nxt", lead("w", 1).over(Window.partitionBy(idCol).orderBy("pos")))
      .filter(col("__nxt").isNotNull)
      .select(keep :+ concat_ws(" ", col("w"), col("__nxt")).as("sh"): _*)
  }

  /** Sliding n-token spans per document (generalizes [[shingleRows]]'s
    * bigrams): one exchange on the doc id; the n-1 `lead` columns share
    * a single window spec, so they come out of ONE Window pass.
    */
  def ngramRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    ngramRowsPos(df, idCol, textCol, n).drop("pos")

  /** [[ngramRows]] keeping each gram's 0-based START TOKEN position —
    * the span-removal path needs to map a flagged gram back to the
    * token positions it covers.
    */
  def ngramRowsPos(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"span length $n must be >= 2")
    val tok = df.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "w")))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val nexts = (1 until n).map(k => lead(col("w"), k).over(w).as(s"__w$k"))
    tok.select(col(idCol) +: col("pos") +: col("w") +: nexts: _*)
      .filter((1 until n).map(k => col(s"__w$k").isNotNull).reduce(_ && _))
      .select(col(idCol), col("pos"),
        concat_ws(" ", col("w") +: (1 until n).map(k => col(s"__w$k")): _*).as("gram"))
  }

  /** Cross-document repeated-span statistics — the span-level companion
    * to the document-level dedup family (training-data "exact substring"
    * dedup: spans repeated verbatim across documents are memorization and
    * benchmark-leak hot spots that doc-level signatures miss). Every
    * sliding n-token span is counted by the DISTINCT documents containing
    * it corpus-wide; a span present in >= `minDocs` documents is flagged,
    * and each document reports its total span positions, how many are
    * flagged, and the flagged ratio. Documents with fewer than n tokens
    * have no spans and emit no row.
    *
    * Scale shape: [[ngramRows]] is one exchange on the doc id; spans
    * shuffle as md5 keys, never as text; the distinct-doc count is a
    * two-level aggregate with map-side combine; and the flag set joins
    * back on the same compact key. No all-pairs anything — cost is linear
    * in corpus token count.
    */
  def repeatedNgramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs ($minDocs) must be >= 2 — 1 flags every span")
    // xxhash64, not md5 (round-17 §2.3 "shuffle fewer bytes"): the span
    // key is INTERNAL — never in the output, which carries only counts —
    // so the cheap 8-byte key replaces the 32-char hex string in both
    // aggregations and the flag join. (The oracle twin keys on md5; the
    // grouping is identical under any injective-on-this-corpus hash, and
    // the hash match at both driver scales proves no collision differs.)
    val grams = ngramRows(df, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("gram")).as("__h"))
    val flagged = grams.distinct()
      .groupBy("__h").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__h"), lit(1L).as("__dup"))
    grams.join(flagged, Seq("__h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("total_spans"),
        sum(coalesce(col("__dup"), lit(0L))).as("dup_spans"))
      .withColumn("dup_ratio", col("dup_spans").cast("double") / col("total_spans"))
  }

  /** Span REMOVAL — the enforcement half of [[repeatedNgramStats]]
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better": repeated spans are cut from all but one
    * occurrence, not merely counted). Every token position covered by
    * a cross-document repeated n-gram is dropped UNLESS this doc is the
    * span's canonical keeper (min doc id containing it); surviving
    * tokens reassemble in position order. Returns
    * (idCol, n_before, n_after, scrubbed).
    *
    * Scale shape: gram hashing is the [[ngramRowsPos]] token-window
    * pass; the flagged-span table aggregates to one row per repeated
    * hash (tiny vs the corpus); coverage expansion is an equi-join on
    * the hash + a bounded n-wide explode; removal is a (doc, pos)
    * anti-join; reassembly is one doc-keyed sort-within-group. Nothing
    * pairs docs with docs — span identity routes through the hash key,
    * exactly like the counting query. (Lee et al. use suffix arrays for
    * arbitrary-length spans; fixed-n hashed grams are the
    * shuffle-bounded distributed form — overlapping flagged grams merge
    * into maximal removed spans through position coverage.)
    */
  def scrubRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs ($minDocs) must be >= 2 — 1 flags every span")
    val toks = df.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "w")))
    // materialized once: both the flag aggregation and the coverage
    // join read the gram rows
    // internal-only span key: xxhash64 for the repeatedNgramStats reason
    // (8-byte key through the checkpoint, the flag agg, and the coverage
    // join instead of a 32-char hex string; output exposes no hash)
    val grams = ngramRowsPos(df, idCol, textCol, n)
      .select(col(idCol), col("pos"), xxhash64(col("gram")).as("__h"))
      .localCheckpoint()
    val flagged = grams.select(col(idCol), col("__h")).distinct()
      .groupBy("__h")
      .agg(count(lit(1)).as("__nd"), min(col(idCol)).as("__keeper"))
      .filter(col("__nd") >= minDocs)
      .select("__h", "__keeper")
    val covered = grams.join(flagged, "__h")
      .filter(col(idCol) =!= col("__keeper"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    val surv = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_after"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ").as("scrubbed"))
    // left join back: a fully-covered doc must still appear (empty)
    df.select(col(idCol),
        size(Text.tokens(col(textCol))).cast("long").as("n_before"))
      .join(surv, Seq(idCol), "left")
      .select(col(idCol), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("scrubbed"), lit("")).as("scrubbed"))
  }

  /** MinHash signature table: `idCol`, h0..h{k-1} over word-bigram
    * shingles. Portable md5-based hash family (seed-prefixed).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 4): DataFrame = {
    val sigCols = (0 until numHashes).map(i =>
      min(md5(concat(lit(i.toString), col("sh")))).as(s"h$i"))
    shingleRows(df, idCol, textCol)
      .groupBy(idCol).agg(sigCols.head, sigCols.tail: _*)
  }

  /** LSH candidate pairs from a materialized signature table (the cluster
    * path: persist signatures once, reuse across band joins).
    */
  def lshCandidatePairsFromSignatures(sig: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand) — " +
        "trailing hashes would be silently dropped, reducing recall")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val keys = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
      val a = sig.select(col(idCol).as("id_a") +: keys.map(col): _*)
      val bs = sig.select(col(idCol).as("id_b") +: keys.map(k => col(k).as(s"_$k")): _*)
      a.join(bs,
        keys.map(k => col(k) === col(s"_$k")).reduce(_ && _) && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }
    bands.reduce(_ unionByName _).distinct()
  }

  /** Star edges per LSH band: (id, min id in its band bucket), one row
    * per non-minimal doc per band. Same CONNECTIVITY as the pairwise
    * band graph — inside a bucket everything connects through the bucket
    * minimum — but O(docs × bands) edges instead of O(Σ bucket²): a hot
    * bucket of b docs emits b-1 star edges, not b(b-1)/2 pairs. This is
    * the input to feed connected components at scale; use
    * [[lshCandidatePairsFromSignatures]] only when the PAIRS themselves
    * are the product (verification, similarity reports). Each band is
    * one window pass over the signature table — no self-join at all.
    */
  def lshStarEdges(sig: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand)")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val keys = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      val w = Window.partitionBy(keys: _*)
      sig.withColumn("__bm", min(col(idCol)).over(w))
        .filter(col(idCol) =!= col("__bm"))
        .select(col(idCol).as("id_a"), col("__bm").as("id_b"))
    }
    bands.reduce(_ unionByName _).distinct()
  }

  /** LSH candidate pairs: ids whose signatures collide on at least one
    * band of `rowsPerBand` consecutive hashes. The signature table is
    * materialized before the self-joins — inlined signature expressions
    * would be re-evaluated per join side (measured 100×: 102s → <1s) and
    * blow up optimizer time on deep expression trees.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 4, rowsPerBand: Int = 2): DataFrame =
    lshCandidatePairsFromSignatures(
      minhashSignatures(df, idCol, textCol, numHashes).localCheckpoint(),
      idCol, numHashes, rowsPerBand)

  /** INCREMENTAL LSH candidate pairs: dedup a NEW batch against an
    * ALREADY-INGESTED corpus without recomputing old-vs-old pairs — the
    * batch-ingest shape of a 100 TB pipeline, where each arriving slice
    * must be checked against petabytes of history but history-vs-history
    * was already settled when those batches landed.
    *
    * `oldSig` is the persisted signature index of the ingested corpus
    * (build once with [[minhashSignatures]], write to parquet, reuse
    * every batch); `newSig` is the new batch's signatures. Each band
    * equi-joins the NEW side (left) against old ∪ new (right) — the
    * old-old quadrant, quadratically the largest, never joins: per band
    * the old index is scanned ONCE as a join probe side, so batch cost
    * is O(|new| × bands) driving lookups into the index, not
    * O(|corpus|²). Band collision depends only on the two signatures,
    * never on batch membership, so the emitted set is EXACTLY
    * {full-corpus band pairs} − {old-old pairs}: ingesting a corpus in
    * any batch order accumulates the same pair set as one global run.
    *
    * Output: (id_a, id_b, is_cross), id_a < id_b, ≥1 side new.
    * `is_cross` marks new-vs-old (canonical copy already ingested —
    * drop/link the new doc) vs new-vs-new (pick a canonical within the
    * batch). Precondition: ids are unique across batches.
    */
  def incrementalLshPairs(newSig: DataFrame, oldSig: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand)")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val keys = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
      val left = newSig.select(col(idCol).as("id_x") +: keys.map(col): _*)
      def side(sig: DataFrame, old: Boolean) = sig
        .select(col(idCol).as("id_y") +: keys.map(k => col(k).as(s"_$k")): _*)
        .withColumn("__old", lit(old))
      val right = side(oldSig, old = true).unionByName(side(newSig, old = false))
      left.join(right,
        keys.map(k => col(k) === col(s"_$k")).reduce(_ && _) &&
          // old partner: always take the pair (ids are cross-batch
          // unique, so no self/double emission); new partner: id order
          // dedups the two orientations of a new-new collision
          (col("__old") || col("id_x") < col("id_y")))
        .select(least(col("id_x"), col("id_y")).as("id_a"),
          greatest(col("id_x"), col("id_y")).as("id_b"),
          col("__old").as("is_cross"))
    }
    // (id_a, id_b) determines is_cross — batch membership is a function
    // of the id — so distinct() dedups band multiplicity only
    bands.reduce(_ unionByName _).distinct()
  }

  /** Batch dedup VERDICTS against a persisted index — the enforcement
    * half of [[incrementalLshPairs]]: the ids of `newSig` rows that must
    * be DROPPED because they band-collide with (a) any already-ingested
    * signature in `oldSig` — epoch dominance, regardless of id order —
    * or (b) an earlier (smaller-id) member of the same batch.
    *
    * Unlike [[incrementalLshPairs]] this tolerates a RE-INGESTED id: a
    * changed document's new signature meeting its own previous
    * signature in the index (same id) never blocks itself, while that
    * previous signature still blocks every OTHER colliding newcomer —
    * the tombstone-blocks-readmission contract of an incremental
    * curated store. Same scale shape: per band the old index is a probe
    * side scanned once, the old-old quadrant never joins.
    */
  def incrementalDropIds(newSig: DataFrame, oldSig: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand)")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val keys = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
      val left = newSig.select(col(idCol) +: keys.map(col): _*)
      def side(sig: DataFrame, old: Boolean) = sig
        .select(col(idCol).as("__id_y") +: keys.map(k => col(k).as(s"_$k")): _*)
        .withColumn("__old", lit(old))
      val right = side(oldSig, old = true).unionByName(side(newSig, old = false))
      left.join(right,
        keys.map(k => col(k) === col(s"_$k")).reduce(_ && _) &&
          ((col("__old") && col(idCol) =!= col("__id_y")) ||
            (!col("__old") && col("__id_y") < col(idCol))))
        .select(col(idCol))
    }
    bands.reduce(_ unionByName _).distinct()
  }

  /** Hub-capped LSH candidate pairs: per band bucket, only the `hubs`
    * smallest ids pair with the rest of the bucket, so a hot bucket of b
    * docs emits O(hubs·b) edges instead of the b(b-1)/2 of
    * [[lshCandidatePairsFromSignatures]] — total edge volume is bounded
    * by O(docs × bands × hubs). For buckets of size ≤ hubs the output is
    * IDENTICAL to the unbounded pairwise join (every doc is a hub), so
    * recall only degrades — gracefully, and only among non-hub pairs —
    * inside genuinely hot buckets (template/boilerplate families), where
    * members are already mutually reachable through the hubs.
    *
    * This is the edge generator to feed ITERATIVE graph jobs (PageRank)
    * whose input must stay bounded per bucket but whose semantics need
    * real multi-neighbor degrees — a middle point between the full
    * pairwise join (pairs are the product) and [[lshStarEdges]] (pure
    * connectivity, degree-1 stars).
    *
    * Hub selection is the bounded [[graft.functions.MinK]] aggregator on
    * the zero-padded id string (numeric order for non-negative ids, and
    * fixed-width so string order == numeric order) — O(hubs) state with
    * map-side partial aggregation, never a full-bucket window sort.
    * Precondition: ids are non-negative integers.
    */
  def lshCandidatePairsBounded(sig: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int, hubs: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand)")
    require(hubs >= 1, s"hubs ($hubs) must be >= 1")
    val minK = udaf(graft.functions.MinK(hubs))
    val padded = lpad(col(idCol).cast("string"), 20, "0")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val keys = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => s"h$i")
      val hubRows = sig
        .select(keys.map(col) :+ padded.as("__p"): _*)
        .groupBy(keys.map(col): _*)
        .agg(minK(col("__p"), col("__p")).as("__w"))
        .select(keys.map(col) :+ explode(col("__w")).as("__x"): _*)
        .select(keys.map(col) :+ col("__x.k").cast("long").as("__hub"): _*)
      hubRows.join(sig.select(keys.map(col) :+ col(idCol): _*), keys)
        .filter(col("__hub") =!= col(idCol))
        .select(least(col("__hub"), col(idCol)).as("id_a"),
          greatest(col("__hub"), col(idCol)).as("id_b"))
    }
    bands.reduce(_ unionByName _).distinct()
  }

  /** Bigram-shingle Jaccard similarity for candidate pairs. `scopeCol`
    * bounds the pair space (e.g. a source/bucket column); at scale pass
    * the LSH band key instead of a broad scope.
    *
    * Join strategy is left to AQE: the per-doc count table `n` is
    * corpus-sized (one row per document), so it must never be broadcast —
    * the small side of both count joins is the aggregated pair table `p`.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      scopeCol: String): DataFrame = {
    // Materialized once: referenced by both self-join sides and the
    // per-doc-count branch (3 plan references → 3 recomputes otherwise).
    // MEASURED round-17 non-change: folding (sh, scope) into one
    // xxhash64 long key (the repeatedNgramStats treatment) regressed
    // this query 2.8× at 100× scale (35.6 s → 100.1 s, paired same-data
    // runs) — the join's cost is its OUTPUT volume (hot shingles fan
    // out quadratically before the pair aggregation), and the narrower
    // input rows dropped the shuffled partitions below AQE's
    // skew-split thresholds, serializing exactly the partitions whose
    // join output dominates. The string key stays: its wider rows keep
    // the skew splitter engaged where it matters.
    val w = shingleRows(df, idCol, textCol, Seq(scopeCol)).distinct().localCheckpoint()
    val n = w.groupBy(idCol).agg(count(lit(1)).as("nd"))
    val p = w.as("a")
      .join(w.as("b"),
        col(s"a.sh") === col(s"b.sh") && col(s"a.$scopeCol") === col(s"b.$scopeCol")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    p.join(n.as("na"), col("id_a") === col(s"na.$idCol"))
      .join(n.as("nb"), col("id_b") === col(s"nb.$idCol"))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") / (col("na.nd") + col("nb.nd") - col("shared")))
          .as("jaccard"))
  }

  /** SimHash: `bits`-bit locality-sensitive fingerprint — per-token hash
    * bits vote ±1 per position; the sign vector packs into a long.
    * Near-dups differ in few bits (hamming via bit_count(a ^ b)).
    *
    * Bit family: bit b of a token = high bit of hex digit b+1 of md5(token)
    * (digit >= '8'). md5-hex is byte-identical across engines, so the
    * fingerprints are DuckDB-expressible for the oracle (crc32/xxhash64
    * are Spark-only). Single explode + one grouped aggregation.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 32, s"bits ($bits) must be in [1, 32] (md5 has 32 hex digits)")
    val t = df.select(col(idCol), explode(Text.tokens(col(textCol))).as("w"))
      .withColumn("h", md5(col("w")))
    val votes = (0 until bits).map(b =>
      sum(when(substring(col("h"), b + 1, 1) >= "8", 1).otherwise(-1)).as(s"v$b"))
    t.groupBy(idCol).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until bits).map(b =>
          when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` from a materialized
    * fingerprint table. Pigeonhole blocking — split the fingerprint into
    * maxHamming+1 disjoint bit segments; any pair within the radius agrees
    * exactly on at least one segment — so candidates come from equi-joins
    * on compact segment keys (shuffle-bounded), never an all-pairs
    * cartesian. Same pattern as the MinHash bands.
    */
  def simhashPairsFromSignatures(sig: DataFrame, idCol: String,
      maxHamming: Int = 3, bits: Int = 16): DataFrame = {
    val nBlocks = maxHamming + 1
    require(bits >= nBlocks, s"need at least one bit per segment ($nBlocks)")
    val base = bits / nBlocks
    def seg(sh: Column, k: Int): Column = {
      val lo = k * base
      val width = if (k == nBlocks - 1) bits - lo else base
      shiftright(sh, lo).bitwiseAND(lit((1L << width) - 1))
    }
    val a = sig.select(col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = sig.select(col(idCol).as("id_b"), col("simhash").as("sh_b"))
    (0 until nBlocks).map { k =>
        a.join(b,
          seg(col("sh_a"), k) === seg(col("sh_b"), k) && col("id_a") < col("id_b"))
      }
      .reduce(_ unionByName _)
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash near-dup pairs within `maxHamming` (fingerprints computed and
    * materialized internally; see [[simhashPairsFromSignatures]]).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bits: Int = 16): DataFrame =
    simhashPairsFromSignatures(
      simhash(df, idCol, textCol, bits).localCheckpoint(),
      idCol, maxHamming, bits)

  /** All-pairs cosine similarity over binary shingle sets with PREFIX
    * FILTERING (Bayardo, Ma & Srikant, WWW 2007 — "Scaling Up All Pairs
    * Similarity Search"): find every doc pair with set-cosine
    * |A∩B|/√(|A|·|B|) ≥ τ without the full inverted-index self-join.
    *
    * τ is a RATIONAL `tauNum/tauDen`, so the acceptance test is the
    * all-integer cross-multiply `shared²·den² ≥ |A|·|B|·num²` — exact
    * on any engine, no FP-gap analysis needed.
    *
    * The scale machinery: order tokens by ascending document frequency
    * (rarest first, ties by token — a total order); a doc A only needs
    * to INDEX its first |A| − ⌈τ·|A|⌉ + 1 tokens. For any qualifying
    * pair with (|A|, idA) ≤ (|B|, idB): shared ≥ τ·√(|A||B|) ≥ τ·|A| =
    * t, and A's unindexed suffix holds at most t − 1 tokens, so some
    * INDEXED (prefix) token of A is in B — candidates come from the
    * prefix⋈full token equi-join and pruning provably loses no pair
    * (the oracle is the semantic all-pairs form). Because prefixes keep
    * the RAREST tokens, the hot (stopword-like) shingles that dominate
    * posting lists never generate candidates from long-doc prefixes —
    * the candidate volume is bounded by rare-token postings, which is
    * what makes all-pairs tractable at corpus scale. Verification is
    * map-side: each doc's sorted shingle array rides the candidate row
    * and `array_intersect` counts exact overlap — never a token-level
    * re-join (|candidates|·|doc| rows).
    *
    * Output: (id_a < id_b, shared, n_a, n_b) for qualifying pairs.
    *
    * MEMORY ENVELOPE (the four `localCheckpoint`s below): `toks` is
    * one row per distinct (doc, shingle) — O(corpus tokens); `tokIds`
    * re-materializes it with the dictionary id; `packed` holds one
    * sorted id array per doc; and `ranked` adds a (nd, rk) pair per
    * token row — together roughly 4× the distinct-shingle volume held
    * on executor block storage
    * for the query's lifetime. That is what makes the prefix filter
    * pay (each checkpoint is read 2-3×; unmaterialized, the shingle
    * explode re-runs per consumer), but at corpus scales beyond the
    * bench fixtures the checkpoints should move to `persist(DISK_ONLY)`
    * or an explicit staging table so the envelope is disk, not RAM.
    */
  def allPairsCosine(df: DataFrame, idCol: String, textCol: String,
      tauNum: Int = 7, tauDen: Int = 10): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau = $tauNum/$tauDen must be in (0, 1]")
    // materialized once: document frequencies, the ranked index, and
    // the packed per-doc sets all read the shingle rows
    val toks = shingleRows(df, idCol, textCol).distinct().localCheckpoint()
    // Dictionary-encode shingles to LONG ids (round-17 measured fix: the
    // verification stage spent ~80% of the query hashing ~100-element
    // STRING arrays through array_intersect for every candidate pair —
    // long-array intersects and long join keys cut that per-pair cost).
    // monotonically_increasing_id is nondeterministic per evaluation, so
    // the id assignment is PINNED by the localCheckpoint below — every
    // consumer (packed arrays, ranked index, candidate join) reads the
    // same tid↔sh bijection, and the RESULT (overlap counts) is invariant
    // to which bijection a run drew.
    val dict = toks.groupBy("sh").agg(count(lit(1)).as("df"))
      .withColumn("tid", monotonically_increasing_id())
    val tokIds = toks.join(dict, "sh")
      .select(col(idCol), col("tid"), col("df"), col("sh"))
      .localCheckpoint()
    // one row per doc: the sorted shingle-id array + its size — the
    // verification representation (map-side array_intersect per
    // candidate pair; a token-level re-join would pay
    // |candidates|·|doc| rows)
    val packed = tokIds.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("tid"))).as("__toks"),
        count(lit(1)).as("nd"))
      .localCheckpoint()
    val sizes = packed.select(col(idCol), col("nd"))
    val ranked = tokIds.join(sizes, idCol)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("df"), col("sh"))))
      .select(col(idCol), col("tid"), col("nd"), col("rk"))
      .localCheckpoint()
    // prefix length |A| − ⌈τ|A|⌉ + 1, with ⌈τ·nd⌉ = (nd·num + den−1) div den
    val pref = ranked.filter(col("rk") <=
      col("nd") - expr(s"(nd * $tauNum + ${tauDen - 1}) div $tauDen") + 1)
    val a = pref.select(col(idCol).as("id_a"), col("tid"),
      col("nd").as("na"), col("rk").as("ra"))
    val num2 = tauNum.toLong * tauNum
    val den2 = tauDen.toLong * tauDen
    // PPJoin prefix-prefix (Xiao, Wang, Lin & Yu, WWW 2008, Lemma 1): the
    // probe side also indexes only a prefix — length |B| − ⌈τ²·|B|⌉ + 1 —
    // instead of the full token list. Lossless for qualifying pairs with
    // (|A|, idA) ≤ (|B|, idB): the true overlap t = ⌈τ·√(|A||B|)⌉ satisfies
    // t ≥ ⌈τ²·|B|⌉ (τ√(|A||B|) ≥ τ²·|B| ⟺ |A| ≥ τ²·|B|, the size-filter
    // condition below, itself implied by shared ≤ |A|), and Lemma 1 says the
    // SMALLEST common token of any pair with overlap ≥ t sits inside both
    // (len − t + 1)-prefixes under one global order: its t − 1 larger common
    // successors force its position ≤ len − t + 1 in each list. Pairs
    // outside the size filter are the only ones a τ²-prefix could lose, and
    // those cannot reach τ anyway. At τ = 9/10 this indexes ~19% of B's
    // tokens instead of 100% — the candidate equi-join shrinks ~5× with a
    // provably identical verified pair set (oracle = semantic all-pairs).
    val bPref = ranked.filter(col("rk") <=
      col("nd") - expr(s"(nd * $num2 + ${den2 - 1}) div $den2") + 1)
    val b = bPref.select(col(idCol).as("id_b"), col("tid"),
      col("nd").as("nb"), col("rk").as("rb"))
    // size filter (the paper's second prune): with na <= nb,
    // cos <= sqrt(na/nb), so na·den² >= nb·num² is NECESSARY for
    // cos >= τ — pairs of very different sizes never become candidates.
    // POSITIONAL filter (PPJoin Lemma 2): a qualifying pair's SMALLEST
    // common token (which Lemma 1 places inside both prefixes, so it is
    // one of the joined rows) has no common token before it in either
    // sorted list — overlap ≤ u = min(na − ra, nb − rb) + 1 on that row,
    // so u²·den² ≥ na·nb·num² must hold for at least one joined row.
    // Rows where the bound fails are pruned BEFORE the distinct and the
    // array-intersect verification; the minimal-token row of any true
    // pair always survives, so the pair set is unchanged.
    val u = least(col("na") - col("ra"), col("nb") - col("rb")) + 1
    val cand = a.join(b, "tid")
      .filter(col("na") < col("nb") ||
        (col("na") === col("nb") && col("id_a") < col("id_b")))
      .filter(col("na") * den2 >= col("nb") * num2)
      .filter(u * u * den2 >= col("na") * col("nb") * num2)
      .select("id_a", "id_b").distinct()
    cand
      .join(packed.select(col(idCol).as("id_a"),
        col("__toks").as("__ta"), col("nd").as("na")), "id_a")
      .join(packed.select(col(idCol).as("id_b"),
        col("__toks").as("__tb"), col("nd").as("nb")), "id_b")
      .withColumn("shared",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .filter(col("shared") * col("shared") * den2 >= col("na") * col("nb") * num2)
      // re-orient from (smaller-set, larger-set) to id order
      .select(
        least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"),
        col("shared"),
        when(col("id_a") < col("id_b"), col("na")).otherwise(col("nb")).as("n_lo"),
        when(col("id_a") < col("id_b"), col("nb")).otherwise(col("na")).as("n_hi"))
      .select(col("lo").as("id_a"), col("hi").as("id_b"),
        col("shared"), col("n_lo").as("n_a"), col("n_hi").as("n_b"))
  }

  /** Decontamination: corpus docs sharing ≥ `minShared` distinct
    * word-bigram shingles with the benchmark set (eval-set leakage
    * check — contaminated docs must be dropped before training).
    *
    * Scale shape: the benchmark shingle set is small (eval suites are
    * thousands of docs) — Spark broadcasts it; the corpus side streams
    * through a broadcast semi-ish join keyed on compact shingle strings,
    * then a bounded per-doc count. Never pairs docs with docs.
    */
  def contaminated(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, minShared: Int = 1): DataFrame = {
    val corpusSh = shingleRows(corpus, idCol, textCol).distinct()
    val benchSh = shingleRows(benchmark, idCol, textCol)
      .select("sh").distinct()
    corpusSh.join(broadcast(benchSh), "sh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Bloom-gated decontamination — [[contaminated]] semantics (the result
    * is bit-identical) with the benchmark membership test collapsed into
    * a compact bloom filter probed map-side before anything joins.
    *
    * Scale shape: [[contaminated]] broadcast-joins the full benchmark
    * shingle SET — fine for a few thousand eval docs, but a
    * consortium-scale benchmark suite (tens of millions of shingles ×
    * long strings) is GBs on the wire and in every executor's heap. Here
    * the corpus shingle stream is filtered by a codegen'd
    * `might_contain` (~1.2 MB per million shingles at 1% fpp, independent
    * of shingle length) inside the scan stage, so at 100 TB only true
    * matches plus the fpp tail ever reach the exact broadcast verify
    * join that removes false positives. Blooms have no false negatives,
    * so the pre-filter can never drop a real contamination.
    *
    * On a real cluster, persist `shingleRows(benchmark).distinct()` once
    * and build the bloom from the persisted table — here the benchmark
    * side is localCheckpointed so the build and the verify share one
    * materialization.
    */
  def bloomContaminated(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, minShared: Int = 1,
      expectedShingles: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val benchSh = shingleRows(benchmark, idCol, textCol)
      .select("sh").distinct().localCheckpoint()
    val corpusSh = shingleRows(corpus, idCol, textCol).distinct()
    Blooms.buildBytes(benchSh, col("sh"), expectedShingles, fpp) match {
      case None =>
        corpusSh.select(col(idCol), lit(0L).as("n_shared")).limit(0)
      case Some(bloom) =>
        corpusSh
          .filter(Blooms.mightContain(bloom, col("sh")))
          .join(broadcast(benchSh), "sh")
          .groupBy(idCol)
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= minShared)
    }
  }

  /** ASYMMETRIC containment decontamination: per corpus doc, the fraction
    * of its distinct shingles that appear anywhere in the benchmark —
    * |sh(doc) ∩ sh(bench)| / |sh(doc)|. Jaccard misses the case that
    * matters most for eval integrity: a short benchmark item quoted
    * whole inside a long document (tiny union-ratio, containment ≈ 1).
    * The ratio is one division of two exact integers — deterministic on
    * any engine. Same scale shape as [[contaminated]]: the benchmark
    * shingle set broadcasts, the corpus never shuffles beyond its own
    * per-doc aggregation.
    *
    * Corpus docs with fewer than 2 tokens produce no shingles (see
    * [[shingleRows]]) and are therefore ABSENT from the report, not
    * scored 0 — "unmeasurable" and "clean" are different states; left-join
    * from the full doc set and treat NULL as unmeasurable if the
    * distinction matters downstream. (The DuckDB oracle behaves
    * identically, so the catalog twin stays aligned.)
    */
  def containment(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val corpusSh = shingleRows(corpus, idCol, textCol).distinct()
    val totals = corpusSh.groupBy(idCol).agg(count(lit(1)).as("n_total"))
    val benchSh = shingleRows(benchmark, idCol, textCol)
      .select("sh").distinct()
    val shared = corpusSh.join(broadcast(benchSh), "sh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__shared"))
    totals.join(shared, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__shared"), lit(0L)).as("n_shared"),
        col("n_total"),
        (coalesce(col("__shared"), lit(0L)).cast("double") / col("n_total"))
          .as("containment"))
  }
}
