package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ILog, Text, Vectors}

/** Text-analysis queries (tokens, langid, quality, tf vocab, scrub,
  * fingerprints) and the multimodal metadata/codec oracles.
  */
private[queries] object TextMultimodalQueries {
  import CatalogShared._

  /** Per-doc Jelinek-Mercer interpolated LM scores (λ = 1/2, add-1
    * faces, all-integer fixed-point log2) — the text_lm_interp plan,
    * shared so ccnet_buckets composes the identical scorer. Columns:
    * (doc_id, held_out, n_bigrams, nll_fp20, avg_fp20). Unordered.
    */
  private def lmInterpDocScores(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ILog
    val ws = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
    val bi = ws.select(col("doc_id"),
      explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (l, r) => struct(l.as("u"), r.as("v")))).as("p"))
      .select(col("doc_id"), col("p.u").as("u"), col("p.v").as("v"))
    val tb = bi.filter(col("doc_id") % 10 < 8)
    val cuv = tb.groupBy("u", "v").agg(count(lit(1)).as("cuv"))
    val cu = tb.groupBy("u").agg(count(lit(1)).as("cu"))
    val cv = tb.groupBy("v").agg(count(lit(1)).as("cv"))
    val gl = tb.agg(count(lit(1)).as("nbi"))
    val vs = ws.filter(col("doc_id") % 10 < 8)
      .select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("vsz"))
    bi.join(cuv, Seq("u", "v"), "left")
      .join(cu, Seq("u"), "left")
      .join(cv, Seq("v"), "left")
      .crossJoin(broadcast(gl))
      .crossJoin(broadcast(vs))
      .withColumn("a_fp", expr(ILog.pFp34Spark(
        "coalesce(cuv, 0) + 1", "coalesce(cu, 0) + vsz")))
      .withColumn("b_fp", expr(ILog.pFp34Spark(
        "coalesce(cv, 0) + 1", "nbi + vsz")))
      .withColumn("mix_fp", col("a_fp") + col("b_fp"))
      .withColumn("nll",
        lit(36700160L) - expr(ILog.qlogSqlSpark("mix_fp")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_fp20"))
      .select(col("doc_id"), (col("doc_id") % 10 >= 8).as("held_out"),
        col("n_bigrams"), col("nll_fp20"),
        expr("nll_fp20 div n_bigrams").as("avg_fp20"))
  }

  /** DuckDB CTE chain twin of [[lmInterpDocScores]]: ends in `lmdoc`
    * with the same five columns. Splice as `WITH $lmInterpCtes …`.
    */
  private val lmInterpCtes: String = {
    import graft.functions.ILog
    "ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), " +
      "bi AS (SELECT doc_id, ws[i] AS u, ws[i+1] AS v FROM ws, LATERAL unnest(generate_series(1, len(ws)-1)) AS t(i)), " +
      "tb AS (SELECT u, v FROM bi WHERE doc_id % 10 < 8), " +
      "cuv AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cuv FROM tb GROUP BY 1, 2), " +
      "cu AS (SELECT u, CAST(count(*) AS BIGINT) AS cu FROM tb GROUP BY 1), " +
      "cv AS (SELECT v, CAST(count(*) AS BIGINT) AS cv FROM tb GROUP BY 1), " +
      "gl AS (SELECT CAST(count(*) AS BIGINT) AS nbi FROM tb), " +
      "vs AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vsz FROM (SELECT unnest(ws) AS w FROM ws WHERE doc_id % 10 < 8)), " +
      "j AS (SELECT bi.doc_id, COALESCE(cuv.cuv, 0) + 1 AS anum, COALESCE(cu.cu, 0) + vsz AS aden, " +
      "COALESCE(cv.cv, 0) + 1 AS bnum, nbi + vsz AS bden " +
      "FROM bi LEFT JOIN cuv USING (u, v) LEFT JOIN cu USING (u) LEFT JOIN cv USING (v) CROSS JOIN gl CROSS JOIN vs), " +
      s"f AS (SELECT doc_id, ${ILog.pFp34Duck("anum", "aden")} + ${ILog.pFp34Duck("bnum", "bden")} AS mix_fp FROM j), " +
      s"sc AS (SELECT doc_id, 36700160 - ${ILog.qlogSqlDuck("mix_fp")} AS nll FROM f), " +
      "lmdoc AS (SELECT doc_id, doc_id % 10 >= 8 AS held_out, CAST(count(*) AS BIGINT) AS n_bigrams, " +
      "CAST(sum(nll) AS BIGINT) AS nll_fp20, CAST(sum(nll) // count(*) AS BIGINT) AS avg_fp20 " +
      "FROM sc GROUP BY doc_id)"
  }

  // --------------------------------------------------------------------
  // Keyword analytics + text pipeline (SURVEY §2.4 A1/A2, §2.8 C5-C8;
  // beyond-reference text analysis)
  // --------------------------------------------------------------------

  /** Shared oracle CTE chain computing the closed-form BMP pixel
    * function, per-block and per-image luma sums for the 12-bit aHash
    * (consumed by `mm_image_ahash` and `mm_image_neardup`).
    */
  private val bmpAHashCtes: String =
    "WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents WHERE doc_id < 100), " +
      "px AS (SELECT doc_id, w, h, x, y FROM d, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
      "c AS (SELECT doc_id, w, h, x, y, (doc_id + 7*x + 13*y) % 256 AS r, (2*doc_id + 11*x + 3*y) % 256 AS g, (3*doc_id + 5*x + 17*y) % 256 AS b FROM px), " +
      "l AS (SELECT doc_id, w, h, (y*3//h)*4 + (x*4//w) AS blk, (r*299 + g*587 + b*114) // 1000 AS luma FROM c), " +
      "bs AS (SELECT doc_id, blk, SUM(luma) AS bsum, CAST(count(*) AS BIGINT) AS bn FROM l GROUP BY 1, 2), " +
      "g AS (SELECT doc_id, CAST(any_value(w) AS BIGINT) AS w, CAST(any_value(h) AS BIGINT) AS h, SUM(luma) AS gsum, CAST(count(*) AS BIGINT) AS gn FROM l GROUP BY 1)"

  /** Shared oracle CTE chain computing the closed-form waveform,
    * per-window and per-stream energy sums for the 16-bit eHash
    * (consumed by `mm_audio_ehash` and `mm_audio_neardup`).
    */
  private val wavEHashCtes: String =
    "WITH d AS (SELECT doc_id, 64 + doc_id % 37 AS n, 8000 + (doc_id % 3) * 4000 AS rate FROM documents WHERE doc_id < 100), " +
      "sm AS (SELECT doc_id, n, rate, i, (i * 16) // n AS win, " +
      "((31*doc_id + 7*i*i + 13*i) % 256 - 128) * (1 + 3 * ((doc_id // (CAST(1 AS BIGINT) << CAST((i * 16) // n AS INTEGER))) % 2)) AS s " +
      "FROM d, LATERAL unnest(generate_series(0, n - 1)) AS t(i)), " +
      "e AS (SELECT doc_id, n, rate, win, s * s AS en FROM sm), " +
      "ws AS (SELECT doc_id, win, CAST(SUM(en) AS BIGINT) AS wsum, CAST(count(*) AS BIGINT) AS wn FROM e GROUP BY 1, 2), " +
      "g AS (SELECT doc_id, CAST(any_value(rate) AS BIGINT) AS rate, CAST(SUM(en) AS BIGINT) AS tsum, CAST(count(*) AS BIGINT) AS tn FROM e GROUP BY 1)"

  /** Shared oracle CTE chain computing the closed-form planted-key
    * video, per-cell and per-video luma sums, and the packed 16-bit
    * vHash (consumed by `mm_video_vhash` and `mm_video_neardup`).
    * `vh` ends with (doc_id, vhash).
    */
  private val y4mVHashCtes: String =
    "WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h, " +
      "(doc_id % 256) | ((255 - doc_id % 256) << 8) AS key FROM documents WHERE doc_id < 100), " +
      "pc AS (SELECT doc_id, key, t, x, y, " +
      "4*t + (CASE WHEN 2*x >= w THEN 1 ELSE 0 END) + (CASE WHEN 2*y >= h THEN 2 ELSE 0 END) AS b " +
      "FROM d, LATERAL unnest(generate_series(0, 3)) AS tt(t), " +
      "LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
      "px AS (SELECT doc_id, b, (doc_id + 7*x + 13*y + 29*t) % 32 + " +
      "(CASE WHEN ((key >> CAST(b AS INTEGER)) & 1) = 1 THEN 160 ELSE 0 END) AS luma FROM pc), " +
      "cells AS (SELECT doc_id, b, SUM(luma) AS cs, CAST(count(*) AS BIGINT) AS cc FROM px GROUP BY 1, 2), " +
      "tot AS (SELECT doc_id, SUM(luma) AS ts, CAST(count(*) AS BIGINT) AS tc FROM px GROUP BY 1), " +
      "vh AS (SELECT doc_id, CAST(SUM(CASE WHEN cs * tc > ts * cc THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS vhash " +
      "FROM cells JOIN tot USING (doc_id) GROUP BY doc_id)"

  /** The three modality near-dup PAIR queries as standalone SQL (no
    * ORDER BY) — each modality's mm_*_neardup oracle, shared with the
    * per-modality datasheet rollup (report_datacard_mm), which embeds
    * them as derived tables (the recallMatrixSql pattern — the chains
    * reuse CTE names, so they can't share one WITH).
    */
  private lazy val imageNearDupSql: String =
    s"$bmpAHashCtes, " +
      "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN (CAST(1 AS BIGINT) << CAST(blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash " +
      "FROM bs JOIN g USING (doc_id) GROUP BY doc_id) " +
      "SELECT id_a, id_b, hamming FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming " +
      "FROM sig a JOIN sig b ON a.doc_id < b.doc_id) " +
      "WHERE hamming <= 2"

  private lazy val audioNearDupSql: String =
    s"$wavEHashCtes, " +
      "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN wsum * tn > tsum * wn THEN (CAST(1 AS BIGINT) << CAST(win AS INTEGER)) ELSE 0 END) AS BIGINT) AS ehash " +
      "FROM ws JOIN g USING (doc_id) GROUP BY doc_id) " +
      "SELECT id_a, id_b, hamming FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(bit_count(xor(a.ehash, b.ehash)) AS BIGINT) AS hamming " +
      "FROM sig a JOIN sig b ON a.doc_id < b.doc_id) " +
      "WHERE hamming <= 1"

  private lazy val videoNearDupSql: String =
    y4mVHashCtes +
      " SELECT id_a, id_b, hamming FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS hamming " +
      "FROM vh a JOIN vh b ON a.doc_id < b.doc_id) WHERE hamming <= 2"

  /** Train-once wrapper for the persisted BPE model (`text_bpe_persist`):
    * the 8-round merge table persists per corpus fingerprint; repeat
    * invocations (bench passes, re-runs) load it retrain-free.
    * cachedModel serializes concurrent first builds (the ensureIndex
    * pattern).
    */
  private def ensureBpeModel(s: SparkSession, d: String): String = {
    import graft.operators.Bpe
    val fp = graft.util.Paths.corpusFingerprint(d, Seq("documents"))
    val table = s"bpm_merges_$fp"
    cachedBuild(s"bpemodel|$table") {
      if (!s.catalog.tableExists(table)) {
        val vocab = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word").rlike("^[a-z0-9]+$"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
        val (merges, _) = Bpe.train(vocab, "word", "freq", rounds = 8)
        Bpe.persistModel(s, merges, table)
      }
      java.lang.Boolean.TRUE
    }
    table
  }

  /** Train-once wrapper for the persisted NB quality classifier
    * (`quality_nb_persist`): the vocab-bounded class-count table and the
    * 1-row model scalars persist per corpus fingerprint — the
    * "train the filter on the curated slice once, score every crawl
    * batch retrain-free" deployment shape (the IvfIndex / BPE-model
    * economics applied to the quality filter). All columns are BIGINT,
    * so the parquet round-trip is exact and the persisted model IS the
    * inline one. Returns (countsTable, scalarsTable).
    */
  private[queries] def ensureNbModel(s: SparkSession, d: String): (String, String) = {
    import graft.operators.NbClassifier
    val fp = graft.util.Paths.corpusFingerprint(d, Seq("documents"))
    val (countsT, scalT) = (s"nbm_counts_$fp", s"nbm_scal_$fp")
    cachedBuild(s"nbmodel|$fp") {
      if (!s.catalog.tableExists(countsT) || !s.catalog.tableExists(scalT)) {
        val train = Tables.documents(s, d)
          .select(col("doc_id"),
            col("source").isin("src0", "src1", "src2", "src3", "src4")
              .as("is_pos"),
            explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("doc_id") % 10 < 8)
        graft.sources.Warehouse.writeTable(
          NbClassifier.tokenClassCounts(train), countsT)
        graft.sources.Warehouse.writeTable(
          NbClassifier.modelScalars(train), scalT)
      }
      java.lang.Boolean.TRUE
    }
    (countsT, scalT)
  }

  /** Shared DuckDB twin of the NB scoring chain: trains on the 80%
    * slice and scores EVERY document — `quality_nb` runs it against the
    * inline-trained model, `quality_nb_persist` against the persisted
    * model tables, so one oracle hash-pins that persisted ≡ inline ≡
    * closed form.
    */
  private[queries] lazy val nbScoreSql: String =
    "WITH tok AS (SELECT doc_id, source IN ('src0','src1','src2','src3','src4') AS is_pos, unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
      "tr AS (SELECT * FROM tok WHERE doc_id % 10 < 8), " +
      "cl AS (SELECT w, CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS cp, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS cn FROM tr GROUP BY w), " +
      "ms AS (SELECT CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS npos, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS nneg, " +
      "CAST(count(DISTINCT w) AS BIGINT) AS vsz, CAST(count(DISTINCT CASE WHEN is_pos THEN doc_id END) AS BIGINT) AS dpos, CAST(count(DISTINCT CASE WHEN NOT is_pos THEN doc_id END) AS BIGINT) AS dneg FROM tr), " +
      "j AS (SELECT tok.doc_id, " +
      s"${ILog.qlogSqlDuck("(COALESCE(cp, 0) + 1)")} - ${ILog.qlogSqlDuck("(npos + vsz)")} - ${ILog.qlogSqlDuck("(COALESCE(cn, 0) + 1)")} + ${ILog.qlogSqlDuck("(nneg + vsz)")} AS wt, dpos, dneg " +
      "FROM tok LEFT JOIN cl USING (w) CROSS JOIN ms) " +
      "SELECT doc_id, doc_id % 10 >= 8 AS held_out, CAST(count(*) AS BIGINT) AS n_tokens, " +
      s"CAST(${ILog.qlogSqlDuck("dpos")} - ${ILog.qlogSqlDuck("dneg")} + SUM(wt) AS BIGINT) AS score_fp20, " +
      s"(${ILog.qlogSqlDuck("dpos")} - ${ILog.qlogSqlDuck("dneg")} + SUM(wt)) > 0 AS pred_pos " +
      "FROM j GROUP BY doc_id, dpos, dneg ORDER BY doc_id"

  /** DuckDB CTE chain twin of the [[graft.operators.Punkt]] pipeline:
    * `pt0…ptok` derive the sentence-structured token stream, `pabbr`
    * is the type-stage abbreviation model, `psent` the per-document
    * segmentation stats (the learned abbrevs feed the boundary rule
    * through `pab`). All scores are fp20 BIGINTs via [[ILog]], so the
    * chain is bit-identical to the Spark plan.
    */
  private lazy val punktCtes: String = {
    import graft.operators.Punkt
    def L(e: String) = ILog.qlogSqlDuck(e)
    val l99 = ILog.qlog2Fp20(99) - ILog.qlog2Fp20(100)
    val l01 = ILog.qlog2Fp20(1) - ILog.qlog2Fp20(100)
    val l14 = -2L * 1048576L                              // log2(1/4)
    val l34 = ILog.qlog2Fp20(3) - ILog.qlog2Fp20(4)       // log2(3/4)
    val abbrevIn = Punkt.AbbrevWords.map(w => s"'$w'").mkString("(", ", ", ")")
    val starterIn = Punkt.StarterWords.map(w => s"'$w'").mkString("(", ", ", ")")
    "pws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), " +
      "pt0 AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w0 FROM pws, LATERAL unnest(generate_series(1, len(ws))) AS t(i)), " +
      s"pt1 AS (SELECT doc_id, pos, w0, (w0 IN $abbrevIn) OR ((doc_id * 131 + pos) % ${Punkt.SentenceMod} = 0) OR (lead(w0) OVER (PARTITION BY doc_id ORDER BY pos) IN $starterIn AND (doc_id * 131 + pos) % ${Punkt.StarterMod} = 1) AS endp FROM pt0), " +
      "pt2 AS (SELECT doc_id, pos, w0 || CASE WHEN endp THEN '.' ELSE '' END AS w1, COALESCE(lag(endp) OVER (PARTITION BY doc_id ORDER BY pos), TRUE) AS cap FROM pt1), " +
      "ptok AS (SELECT doc_id, pos, CASE WHEN cap THEN upper(substr(w1, 1, 1)) || substr(w1, 2) ELSE w1 END AS w FROM pt2), " +
      "pty AS (SELECT doc_id, pos, w, w LIKE '%.' AS hasp, CASE WHEN w LIKE '%.' THEN lower(substr(w, 1, length(w) - 1)) ELSE lower(w) END AS ty FROM ptok), " +
      "psc AS (SELECT CAST(count(*) AS BIGINT) AS n_tok, CAST(sum(CASE WHEN hasp THEN 1 ELSE 0 END) AS BIGINT) AS n_period FROM pty), " +
      "pgrp AS (SELECT ty, CAST(count(*) AS BIGINT) AS cnt_total, CAST(sum(CASE WHEN hasp THEN 1 ELSE 0 END) AS BIGINT) AS cnt_period FROM pty GROUP BY ty), " +
      "pcand AS (SELECT ty, cnt_total, cnt_period, cnt_total - cnt_period AS cwp, CAST(length(replace(ty, '.', '')) AS BIGINT) AS len, CAST(length(ty) - length(replace(ty, '.', '')) + 1 AS BIGINT) AS np, n_tok, n_period FROM pgrp, psc WHERE cnt_period >= 1 AND length(replace(ty, '.', '')) >= 1), " +
      s"pllr AS (SELECT *, CAST(CASE WHEN n_tok - n_period < 1 THEN NULL ELSE 2 * ((cnt_period * ($l99) + cwp * ($l01)) - (cnt_period * (${L("n_period")} - ${L("n_tok")}) + cwp * (${L("(n_tok - n_period)")} - ${L("n_tok")}))) END AS BIGINT) AS llr_fp20 FROM pcand), " +
      s"pscore AS (SELECT *, CAST(CASE WHEN llr_fp20 IS NULL OR llr_fp20 < 1 THEN NULL ELSE ${L("llr_fp20")} - ${Punkt.Fp20Bias} + ${L("np")} - len * 1048576 - cwp * ${L("len")} END AS BIGINT) AS score_fp20 FROM pllr), " +
      s"pabbr AS (SELECT ty, cnt_total, cnt_period, llr_fp20, score_fp20, COALESCE(score_fp20 >= ${Punkt.ScoreThresholdFp20}, FALSE) AS is_abbrev FROM pscore), " +
      "pab AS (SELECT ty, TRUE AS is_ab FROM pabbr WHERE is_abbrev), " +
      "pb AS (SELECT doc_id, pos, w, hasp, ty, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt, is_ab FROM pty LEFT JOIN pab USING (ty)), " +
      "pbd AS (SELECT doc_id, pos, (nxt IS NULL) OR (hasp AND substr(nxt, 1, 1) BETWEEN 'A' AND 'Z' AND is_ab IS NULL) AS boundary FROM pb), " +
      "psx AS (SELECT doc_id, pos, COALESCE(CAST(sum(CASE WHEN boundary THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS sidx FROM pbd), " +
      "pst AS (SELECT doc_id, sidx, CAST(count(*) AS BIGINT) AS stoks FROM psx GROUP BY 1, 2), " +
      "psent AS (SELECT doc_id, CAST(sum(stoks) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_sentences, CAST(max(stoks) AS BIGINT) AS max_sent_tokens FROM pst GROUP BY doc_id), " +
      // Token-stage frequent-sentence-starter model: types following
      // UNAMBIGUOUS boundaries (doc start, or a period whose type is
      // not a learned abbreviation) at rate >= 1/4 vs the base rate.
      "psv AS (SELECT doc_id, pos, ty, hasp, lag(hasp) OVER (PARTITION BY doc_id ORDER BY pos) AS p_hasp, lag(ty) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_ty FROM pty), " +
      "psafb AS (SELECT psv.ty, (p_hasp IS NULL) OR (p_hasp AND ab2.is_ab IS NULL) AS afb FROM psv LEFT JOIN pab ab2 ON psv.prev_ty = ab2.ty), " +
      "psg AS (SELECT ty, CAST(count(*) AS BIGINT) AS cnt_total, CAST(sum(CASE WHEN afb THEN 1 ELSE 0 END) AS BIGINT) AS cnt_start FROM psafb GROUP BY ty), " +
      "pssc AS (SELECT CAST(sum(cnt_total) AS BIGINT) AS n_tok, CAST(sum(cnt_start) AS BIGINT) AS n_ab FROM psg), " +
      "pscand2 AS (SELECT ty, cnt_total, cnt_start, cnt_total - cnt_start AS cns, n_tok, n_ab FROM psg, pssc WHERE cnt_start >= 1 AND length(replace(ty, '.', '')) >= 1), " +
      s"psllr AS (SELECT ty, cnt_total, cnt_start, CAST(CASE WHEN n_tok - n_ab < 1 THEN NULL ELSE 2 * ((cnt_start * ($l14) + cns * ($l34)) - (cnt_start * (${L("n_ab")} - ${L("n_tok")}) + cns * (${L("(n_tok - n_ab)")} - ${L("n_tok")}))) END AS BIGINT) AS llr_fp20 FROM pscand2), " +
      "pstart AS (SELECT ty, cnt_total, cnt_start, llr_fp20, COALESCE(llr_fp20 >= 1, FALSE) AS is_starter FROM psllr), " +
      "pstty AS (SELECT ty FROM pstart WHERE is_starter), " +
      // Full segmentation: the starter set re-opens boundaries after
      // learned abbreviations ("… at Merge. The next day …").
      "pb2 AS (SELECT pty.doc_id, pty.pos, pty.w, pty.hasp, pty.ty, lead(pty.w) OVER (PARTITION BY pty.doc_id ORDER BY pty.pos) AS nxt, lead(pty.ty) OVER (PARTITION BY pty.doc_id ORDER BY pty.pos) AS nxt_ty, pab.is_ab FROM pty LEFT JOIN pab USING (ty)), " +
      "pbd2 AS (SELECT pb2.doc_id, pb2.pos, (nxt IS NULL) OR (hasp AND substr(nxt, 1, 1) BETWEEN 'A' AND 'Z' AND (is_ab IS NULL OR st.ty IS NOT NULL)) AS boundary FROM pb2 LEFT JOIN pstty st ON pb2.nxt_ty = st.ty), " +
      "psx2 AS (SELECT doc_id, pos, COALESCE(CAST(sum(CASE WHEN boundary THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS sidx FROM pbd2), " +
      "pst2 AS (SELECT doc_id, sidx, CAST(count(*) AS BIGINT) AS stoks FROM psx2 GROUP BY 1, 2), " +
      "psent2 AS (SELECT doc_id, CAST(sum(stoks) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_sentences, CAST(max(stoks) AS BIGINT) AS max_sent_tokens FROM pst2 GROUP BY doc_id)"
  }

  /** Shared oracle of text_sentences AND text_punkt_persist — one SQL
    * hash-pins persisted-model ≡ inline-trained segmentation (the
    * quality_nb / quality_nb_persist pattern).
    */
  private lazy val punktSentSql: String =
    s"WITH $punktCtes SELECT doc_id, n_tokens, n_sentences, max_sent_tokens FROM psent ORDER BY doc_id"

  /** Build-once persisted Punkt abbreviation model per corpus
    * fingerprint — the "learn the splitter on the corpus once, segment
    * every batch retrain-free" deployment shape ([[ensureNbModel]]
    * economics). All columns BIGINT/BOOLEAN/VARCHAR: parquet round-trip
    * exact, persisted ≡ inline.
    */
  private[queries] def ensurePunktModel(s: SparkSession, d: String): String = {
    import graft.operators.Punkt
    val fp = graft.util.Paths.corpusFingerprint(d, Seq("documents"))
    val t = s"punkt_model_$fp"
    cachedBuild(s"punktmodel|$fp") {
      if (!s.catalog.tableExists(t)) {
        graft.sources.Warehouse.writeTable(
          Punkt.trainAbbrevs(Punkt.derivedTokens(
            Tables.documents(s, d).select("doc_id", "text"))), t)
      }
      java.lang.Boolean.TRUE
    }
    t
  }

  private val textual = Seq(
    // A1+A2+C5+C7+C8: tokenize → alnum filter → stopword drop → global
    // word-frequency top-k (cache.py:220-240 cache_top_10_keywords).
    Q("a1_word_topk",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word").rlike("^[a-z0-9]+$") && !col("word").isin(Text.StopWords: _*))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20),
      Some(s"SELECT word, cnt FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) WHERE regexp_matches(word, '^[a-z0-9]+$$') AND word NOT IN ${Text.StopWordsSql} GROUP BY word) ORDER BY cnt DESC, word LIMIT 20")),

    // Beyond-reference: heuristic language ID (stopword-hit ratio).
    Q("text_langid",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${Text.StopWordsSql})) AS BIGINT) * 10 >= CAST(len(string_split(lower(text), ' ')) AS BIGINT) THEN 'en' ELSE 'und' END AS lang_pred FROM documents ORDER BY doc_id")),

    // Beyond-reference: quality scoring — length / stopword / density
    // ratios. Single-division doubles: deterministic.
    Q("text_quality",
      (s, d) => {
        val toks = size(split(lower(col("text")), " ")).cast("long")
        // translate char-map scan, NOT regexp_extract_all: the regex
        // form allocates a per-match array — 69 s alone at sf10
        // (round-11 profile); the translate form is ~1 s and
        // bit-identical ([[Text.punctCount]]).
        val punct = Text.punctCount(col("text"))
        Tables.documents(s, d).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          toks.as("n_tokens"),
          (Text.stopwordHits(col("text")).cast("double") / toks).as("stopword_ratio"),
          (punct.cast("double") / length(col("text"))).as("punct_ratio"),
          (length(col("text")).cast("double") / toks).as("chars_per_token"))
          .orderBy("doc_id")
      },
      // DuckDB length() = CHARACTERS, matching Spark length(); strlen
      // counts BYTES and would diverge on any non-ASCII document.
      Some(s"SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens, CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${Text.StopWordsSql})) AS DOUBLE) / len(string_split(lower(text), ' ')) AS stopword_ratio, CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / length(text) AS punct_ratio, CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) AS chars_per_token FROM documents ORDER BY doc_id")),

    // Beyond-reference: BPE-ish token counting (alpha runs + digit runs).
    Q("text_tokens",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.bpeishTokenCount(col("text")).as("n_bpeish"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS BIGINT) AS n_bpeish FROM documents ORDER BY doc_id")),

    // Beyond-reference: document fingerprint (md5 of sorted distinct
    // token set — canonical bag-of-words identity).
    Q("text_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp FROM documents ORDER BY doc_id")),

    // Composite quality gate: the keep/drop decision with the FIRST
    // failing rule as the reason (Gopher-style rule stack). All signals
    // are exact integers or single divisions of identical ints, so even
    // exact-boundary comparisons agree cross-engine.
    Q("text_quality_gate",
      (s, d) => {
        val toks = size(split(lower(col("text")), " ")).cast("long")
        val punct = Text.punctCount(col("text")) // see text_quality note
        val swRatio = Text.stopwordHits(col("text")).cast("double") / toks
        val cpt = length(col("text")).cast("double") / toks
        val reason =
          when(toks < 5, "too_short")
            .when(toks > 1000, "too_long")
            .when(swRatio < 0.05, "low_stopword")
            .when(punct.cast("double") / length(col("text")) > 0.3, "punct_heavy")
            .when(cpt > 12.0, "long_tokens")
            .otherwise("keep")
        Tables.documents(s, d)
          .select(col("doc_id"), (reason === "keep").as("keep"), reason.as("reason"))
          .orderBy("doc_id")
      },
      Some(s"SELECT doc_id, reason = 'keep' AS keep, reason FROM (SELECT doc_id, CASE " +
        "WHEN len(string_split(lower(text), ' ')) < 5 THEN 'too_short' " +
        "WHEN len(string_split(lower(text), ' ')) > 1000 THEN 'too_long' " +
        s"WHEN CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${Text.StopWordsSql})) AS DOUBLE) / len(string_split(lower(text), ' ')) < 0.05 THEN 'low_stopword' " +
        "WHEN CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / length(text) > 0.3 THEN 'punct_heavy' " +
        "WHEN CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) > 12.0 THEN 'long_tokens' " +
        "ELSE 'keep' END AS reason FROM documents) ORDER BY doc_id")),

    // PII/URL scrubbing: mask URLs then long digit runs — the redaction
    // pass before training.
    Q("text_scrub",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Text.scrub(col("text")).as("scrubbed"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, regexp_replace(regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'), '[0-9]{4,}', '<NUM>', 'g') AS scrubbed FROM documents ORDER BY doc_id")),

    // Repeated-bigram ratio (Gopher-style repetition filter signal):
    // 1 − distinct/total bigrams via the codegen-safe shingle rows (a
    // per-row HOF over split() would fall into the CollapseProject
    // interpreted-lambda trap). Exact integer counts, one division.
    Q("text_rep_ngram",
      (s, d) => graft.operators.Dedup
        .shingleRows(Tables.documents(s, d), "doc_id", "text")
        .groupBy("doc_id")
        .agg((lit(1.0) - countDistinct(col("sh")).cast("double") / count(lit(1)))
          .as("rep_ratio"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, 1.0 - CAST(count(DISTINCT sh) AS DOUBLE) / count(*) AS rep_ratio FROM (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]) AS sh FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents) WHERE len(ws) >= 2) GROUP BY doc_id ORDER BY doc_id")),

    // PII masking ([[graft.functions.Pii]], Dolma-style): the corpus has
    // no organic PII, so the query injects synthetic email / IPv4 / phone
    // tokens derived deterministically from doc_id (the snapshot_diff
    // derivation pattern), then counts and redacts them. Both engines run
    // the SAME portable regexes (no lookaround/backrefs) verbatim.
    Q("text_pii_scrub",
      (s, d) => {
        import graft.functions.Pii
        val id = col("doc_id")
        val injected = when(id % 7 === 1,
            concat(col("text"), lit(" contact user"), id.cast("string"), lit("@example.com please")))
          .when(id % 7 === 3,
            concat(col("text"), lit(" server 10.42."), (id % 250).cast("string"),
              lit("."), ((id % 199) + 1).cast("string"), lit(" up")))
          .when(id % 7 === 5,
            concat(col("text"), lit(" call +1-555-"), lpad((id % 1000).cast("string"), 3, "0"),
              lit("-"), lpad((id % 10000).cast("string"), 4, "0")))
          .otherwise(col("text"))
        Tables.documents(s, d).select(id, injected.as("t"))
          .select(id,
            Pii.count(col("t"), Pii.EmailRe).as("n_email"),
            Pii.count(col("t"), Pii.Ipv4Re).as("n_ip"),
            Pii.count(col("t"), Pii.PhoneRe).as("n_phone"),
            Pii.redact(col("t")).as("clean"))
          .orderBy("doc_id")
      },
      Some("WITH t AS (SELECT doc_id, CASE " +
        "WHEN doc_id % 7 = 1 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com please' " +
        "WHEN doc_id % 7 = 3 THEN text || ' server 10.42.' || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 199 + 1 AS VARCHAR) || ' up' " +
        "WHEN doc_id % 7 = 5 THEN text || ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') " +
        "ELSE text END AS t FROM documents) " +
        "SELECT doc_id, " +
        "CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_email, " +
        "CAST(len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip, " +
        "CAST(len(regexp_extract_all(t, '\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}')) AS BIGINT) AS n_phone, " +
        "regexp_replace(regexp_replace(regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}', '<PHONE>', 'g'), " +
        "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS clean " +
        "FROM t ORDER BY doc_id")),

    // Gopher per-doc repetition signals ([[graft.operators.Repetition]]):
    // most-frequent-2-gram coverage + duplicate-3-gram coverage, all
    // integer (count × length products; the flag compares integer
    // cross-products, never a double). Tie on the top 2-gram count is
    // common — broken by (cnt, coverage, gram) on both engines.
    Q("text_repetition",
      (s, d) => graft.operators.Repetition
        .signals(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents), " +
        "g2 AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws)-1)]) AS g FROM t), " +
        "c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY doc_id, g), " +
        "top2 AS (SELECT doc_id, CAST(cnt * length(g) AS BIGINT) AS top2_chars FROM (SELECT doc_id, g, cnt, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cnt * length(g) DESC, g) AS rn FROM c2) WHERE rn = 1), " +
        "g3 AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in generate_series(1, len(ws)-2)]) AS g FROM t), " +
        "c3 AS (SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY doc_id, g), " +
        "dup3 AS (SELECT doc_id, CAST(COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt * length(g) END), 0) AS BIGINT) AS dup3_chars FROM c3 GROUP BY doc_id) " +
        "SELECT t.doc_id, COALESCE(top2.top2_chars, 0) AS top2_chars, COALESCE(dup3.dup3_chars, 0) AS dup3_chars, " +
        "CAST(length(t.text) AS BIGINT) AS total_chars, " +
        "(COALESCE(top2.top2_chars, 0) * 8 > length(t.text) OR COALESCE(dup3.dup3_chars, 0) * 10 > length(t.text)) AS rep_flag " +
        "FROM t LEFT JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id) ORDER BY doc_id")),

    // Context-window chunking: 50-token windows, stride 40 (10-token
    // overlap) — map-side posexplode+slice, no shuffle.
    Q("text_chunks",
      (s, d) => graft.operators.Chunk
        .chunkTokens(Tables.documents(s, d), "doc_id", "text", size = 50, stride = 40)
        .orderBy("doc_id", "chunk_id"),
      Some("SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, array_to_string(ws[i*40+1 : i*40+50], ' ') AS chunk FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), LATERAL unnest(generate_series(0, CAST(floor((len(ws)-1)/40) AS BIGINT))) AS t(i) ORDER BY doc_id, chunk_id")),

    // Vocabulary construction: contiguous token ids by frequency rank.
    // Two-phase like w1: TakeOrderedAndProject bounds the top-200 BEFORE
    // the id-assigning window ranks ≤200 rows (never the whole vocab).
    Q("text_vocab",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(200)
        counts
          .select(col("word"), col("cnt"),
            row_number().over(Window.orderBy(col("cnt").desc, col("word")))
              .cast("long").as("token_id"))
          .orderBy("token_id")
      },
      Some("SELECT word, cnt, rn AS token_id FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt, row_number() OVER (ORDER BY count(*) DESC, word) AS rn FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) GROUP BY word) WHERE rn <= 200 ORDER BY token_id")),

    // Bigram LM perplexity quality score (the CCNet/C4-style signal):
    // train add-1-smoothed bigram counts on the 80% held-in slice
    // (doc_id%10<8), score EVERY doc by its summed negative log2
    // probability. The log is [[graft.functions.ILog]]'s Mitchell
    // piecewise-linear fixed-point log2 — pure integer shift/mul/floor-
    // div, so the scores hash-match DuckDB exactly (a libm ln would
    // drift in the last ulp). Scale shape: count tables are
    // vocab-bounded; the scoring joins are equi-keyed (u,v)/(u) with
    // map-side partial aggregation; nothing iterates the corpus twice.
    Q("text_lm_score",
      (s, d) => {
        import graft.functions.ILog
        val ws = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        val bi = ws.select(col("doc_id"),
          explode(zip_with(
            slice(col("ws"), lit(1), size(col("ws")) - 1),
            slice(col("ws"), lit(2), size(col("ws")) - 1),
            (l, r) => struct(l.as("u"), r.as("v")))).as("p"))
          .select(col("doc_id"), col("p.u").as("u"), col("p.v").as("v"))
        val tb = bi.filter(col("doc_id") % 10 < 8)
        val cuv = tb.groupBy("u", "v").agg(count(lit(1)).as("cuv"))
        val cu = tb.groupBy("u").agg(count(lit(1)).as("cu"))
        val vs = ws.filter(col("doc_id") % 10 < 8)
          .select(explode(col("ws")).as("w"))
          .agg(countDistinct(col("w")).as("vsz"))
        bi.join(cuv, Seq("u", "v"), "left")
          .join(cu, Seq("u"), "left")
          .crossJoin(broadcast(vs))
          .withColumn("den", coalesce(col("cu"), lit(0L)) + col("vsz"))
          .withColumn("num", coalesce(col("cuv"), lit(0L)) + lit(1L))
          .withColumn("nll",
            expr(ILog.qlogSqlSpark("den")) - expr(ILog.qlogSqlSpark("num")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("nll_fp20"))
          .select(col("doc_id"), (col("doc_id") % 10 >= 8).as("held_out"),
            col("n_bigrams"), col("nll_fp20"),
            expr("nll_fp20 div n_bigrams").as("avg_fp20"))
          .orderBy("doc_id")
      },
      Some {
        import graft.functions.ILog
        "WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), " +
          "bi AS (SELECT doc_id, ws[i] AS u, ws[i+1] AS v FROM ws, LATERAL unnest(generate_series(1, len(ws)-1)) AS t(i)), " +
          "tb AS (SELECT u, v FROM bi WHERE doc_id % 10 < 8), " +
          "cuv AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cuv FROM tb GROUP BY 1, 2), " +
          "cu AS (SELECT u, CAST(count(*) AS BIGINT) AS cu FROM tb GROUP BY 1), " +
          "vs AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vsz FROM (SELECT unnest(ws) AS w FROM ws WHERE doc_id % 10 < 8)), " +
          "j AS (SELECT bi.doc_id, COALESCE(cu.cu, 0) + vsz AS den, COALESCE(cuv.cuv, 0) + 1 AS num FROM bi LEFT JOIN cuv USING (u, v) LEFT JOIN cu USING (u) CROSS JOIN vs), " +
          s"sc AS (SELECT doc_id, ${ILog.qlogSqlDuck("den")} - ${ILog.qlogSqlDuck("num")} AS nll FROM j) " +
          "SELECT doc_id, doc_id % 10 >= 8 AS held_out, CAST(count(*) AS BIGINT) AS n_bigrams, " +
          "CAST(sum(nll) AS BIGINT) AS nll_fp20, CAST(sum(nll) // count(*) AS BIGINT) AS avg_fp20 " +
          "FROM sc GROUP BY doc_id ORDER BY doc_id"
      }),

    // Jelinek-Mercer interpolated LM score (λ = 1/2): the back-off
    // upgrade of text_lm_score — P_mix(v|u) = (P_bi + P_uni)/2 with
    // add-1 faces P_bi = (cuv+1)/(cu+|V|), P_uni = (cv+1)/(N+|V|), the
    // CCNet-style smoothing that stops one unseen bigram from dominating
    // a document's score. Exactness: each probability is quantized ONCE
    // to 2^-34 fixed point ([[graft.functions.ILog.pFp34Spark]] — one
    // multiply + one floor divide, identical on both engines), the sum
    // of the two fp probabilities feeds the same Mitchell integer log2,
    // and −log2((a+b)/2^35) = 35·2^20 − qlog2(a+b) exactly (dividing by
    // a power of two is an exact exponent shift in qlog2). Scale shape
    // identical to text_lm_score: three vocab-bounded count tables,
    // equi-keyed scoring joins on (u,v)/(u)/(v), two 1-row broadcasts
    // (N, |V|); per-34-bit quantization floors stay positive up to ~17 G
    // training bigrams, and the 2^29 numerator domain raises loudly on
    // both engines past it.
    Q("text_lm_interp",
      (s, d) => lmInterpDocScores(s, d).orderBy("doc_id"),
      Some(s"WITH $lmInterpCtes SELECT doc_id, held_out, n_bigrams, nll_fp20, avg_fp20 " +
        "FROM lmdoc ORDER BY doc_id")),

    // PMI collocation mining (Church & Hanks, CL 1990): the top bigram
    // collocations by pointwise mutual information — the classic
    // phrase-extraction / tokenizer-seeding primitive (high-PMI pairs
    // are the multi-word units worth fusing before BPE training). All
    // counts are vocab-bounded aggs (map-side combined); N is a 1-row
    // broadcast; the min-count floor (≥3) is applied BEFORE the unigram
    // joins so only surviving pairs shuffle. PMI in fp20 integer bits
    // via the four-term telescoped form qlog2(N)+qlog2(cuv)−qlog2(cu)
    // −qlog2(cv) — each argument stays far inside qlog2's 2^43 domain
    // (the fused N·cuv form would overflow it at corpus scale), and the
    // Mitchell log is bit-identical on both engines.
    Q("text_pmi",
      (s, d) => {
        import graft.functions.ILog
        val ws = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
        val bi = ws.select(
          explode(zip_with(
            slice(col("ws"), lit(1), size(col("ws")) - 1),
            slice(col("ws"), lit(2), size(col("ws")) - 1),
            (l, r) => struct(l.as("u"), r.as("v")))).as("p"))
          .select(col("p.u").as("u"), col("p.v").as("v"))
        val cuv = bi.groupBy("u", "v").agg(count(lit(1)).as("cuv"))
          .filter(col("cuv") >= 3)
        val cu = bi.groupBy("u").agg(count(lit(1)).as("cu"))
        val cv = bi.groupBy("v").agg(count(lit(1)).as("cv"))
        val gl = bi.agg(count(lit(1)).as("nbi"))
        cuv.join(cu, "u").join(cv, "v")
          .crossJoin(broadcast(gl))
          .select(col("u"), col("v"), col("cuv"),
            (expr(ILog.qlogSqlSpark("nbi")) + expr(ILog.qlogSqlSpark("cuv"))
              - expr(ILog.qlogSqlSpark("cu"))
              - expr(ILog.qlogSqlSpark("cv"))).as("pmi_fp20"))
          .orderBy(col("pmi_fp20").desc, col("u"), col("v"))
          .limit(50)
      },
      Some {
        import graft.functions.ILog
        "WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), " +
          "bi AS (SELECT ws[i] AS u, ws[i+1] AS v FROM ws, LATERAL unnest(generate_series(1, len(ws)-1)) AS t(i)), " +
          "cuv AS (SELECT u, v, CAST(count(*) AS BIGINT) AS cuv FROM bi GROUP BY 1, 2 HAVING count(*) >= 3), " +
          "cu AS (SELECT u, CAST(count(*) AS BIGINT) AS cu FROM bi GROUP BY 1), " +
          "cv AS (SELECT v, CAST(count(*) AS BIGINT) AS cv FROM bi GROUP BY 1), " +
          "gl AS (SELECT CAST(count(*) AS BIGINT) AS nbi FROM bi) " +
          "SELECT u, v, cuv, " +
          s"${ILog.qlogSqlDuck("nbi")} + ${ILog.qlogSqlDuck("cuv")} - ${ILog.qlogSqlDuck("cu")} - ${ILog.qlogSqlDuck("cv")} AS pmi_fp20 " +
          "FROM cuv JOIN cu USING (u) JOIN cv USING (v) CROSS JOIN gl " +
          "ORDER BY pmi_fp20 DESC, u, v LIMIT 50"
      }),

    // CCNet-style perplexity-tercile partitioning (Wenzek et al., LREC
    // 2020): per LANGUAGE, split the corpus into head/middle/tail thirds
    // by the Jelinek-Mercer LM score above — the standard recipe for
    // quality-stratified sampling (train mostly on the head, keep the
    // tail for diversity). The thresholds are per-language EXACT type-7
    // terciles of the integer fp20 scores computed with
    // [[graft.operators.Percentiles.exactRefinedChain]] — a bounded
    // two-level histogram refinement (65536-wide then unit buckets), so
    // no task ever sorts a language's whole score list (the naive
    // per-lang ntile window is exactly the single-task-per-language plan
    // that dies at 100 TB). Bucketing itself is a broadcast join of the
    // ≤|langs| threshold rows + a map-side CASE. Cross-engine exactness:
    // scores are integers, and the type-7 interpolation tree is the
    // bit-identical quantile_cont twin proven since round 2; the
    // quantile literals are IEEE doubles on both sides (CAST(1 AS
    // DOUBLE)/3, not DuckDB's decimal 1.0/3).
    Q("ccnet_buckets",
      (s, d) => {
        // Materialized once per invocation (round-17 measured fix): the
        // two-level refinement chain + final ranking + the bucketing join
        // each re-evaluate `scored`, and unmaterialized that re-runs the
        // full bigram-LM scoring pipeline (explode + 3 count aggregates +
        // fixed-point log per bigram) FOUR times per query. localCheckpoint
        // recomputes from the parquet inputs on every invocation — nothing
        // is memoized across runs.
        val scored = lmInterpDocScores(s, d)
          .select(col("doc_id"), col("avg_fp20"))
          .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
          .localCheckpoint()
        val th = graft.operators.Percentiles.exactRefinedChain(
          scored, Seq("lang"), "avg_fp20",
          Seq(1.0 / 3 -> "t1", 2.0 / 3 -> "t2"),
          Seq(graft.operators.Percentiles.widthBucket(65536),
            graft.operators.Percentiles.widthBucket(1)))
        scored.join(broadcast(th), "lang")
          .select(col("doc_id"), col("lang"), col("avg_fp20"),
            when(col("avg_fp20") <= col("t1"), "head")
              .when(col("avg_fp20") <= col("t2"), "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some(s"WITH $lmInterpCtes, " +
        "scored AS (SELECT doc_id, lang, avg_fp20 FROM lmdoc JOIN documents USING (doc_id)), " +
        "th AS (SELECT lang, quantile_cont(avg_fp20, CAST(1 AS DOUBLE)/3) AS t1, " +
        "quantile_cont(avg_fp20, CAST(2 AS DOUBLE)/3) AS t2 FROM scored GROUP BY lang) " +
        "SELECT doc_id, lang, avg_fp20, CASE WHEN avg_fp20 <= t1 THEN 'head' " +
        "WHEN avg_fp20 <= t2 THEN 'middle' ELSE 'tail' END AS bucket " +
        "FROM scored JOIN th USING (lang) ORDER BY doc_id")),

    // Distributed BPE vocabulary training ([[graft.operators.Bpe]]):
    // learn 8 subword merges from the corpus — corpus collapses ONCE to
    // the (word, freq) vocab, then every round is one bounded pair
    // aggregation + one literal replace (the unrolled-rounds oracle
    // pattern of k-means/PageRank). Integer counts, binary string
    // tie-breaks — the merge table hash-matches DuckDB's identical
    // 8 unrolled rounds.
    Q("text_bpe_train",
      (s, d) => {
        import graft.operators.Bpe
        val vocab = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word").rlike("^[a-z0-9]+$"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
        val (merges, _) = Bpe.train(vocab, "word", "freq", rounds = 8)
        s.createDataFrame(merges)
          .select(col("round").cast("long").as("round"),
            col("lft"), col("rgt"), col("cnt"))
          .orderBy("round")
      },
      Some(bpeTrainSql(8))),

    // BPE inference over the trained vocab: every word's final
    // segmentation after the 8 learned merges (piece count + the pieces
    // themselves) — the encode face of the trainer, same unrolled twin.
    Q("text_bpe_encode",
      (s, d) => {
        import graft.operators.Bpe
        val vocab = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word").rlike("^[a-z0-9]+$"))
          .groupBy("word").agg(count(lit(1)).as("freq"))
        val (_, words) = Bpe.train(vocab, "word", "freq", rounds = 8)
        words.select(col("word"),
          size(Bpe.symbols(col("w"))).cast("long").as("n_pieces"),
          array_join(Bpe.symbols(col("w")), " ").as("pieces"))
          .orderBy("word")
      },
      Some(bpeEncodeSql(8))),

    // The PERSISTED tokenizer — how BPE actually deploys (the IvfIndex
    // lesson applied to text): train ONCE per corpus, write the
    // vocab-bounded merge table as a model table, encode RETRAIN-FREE
    // from the loaded artifact. The encode input is a FRESH slice
    // (doc_id % 3 == 0 — tokenizer inference on new data, not the train
    // replay text_bpe_encode does), and the plan carries zero pair-count
    // aggregations — the 8 merge rounds happened at build time. Oracle
    // re-derives the identical merges (deterministic function of the
    // corpus; strings round-trip parquet exactly) and segments the same
    // slice.
    Q("text_bpe_persist",
      (s, d) => {
        import graft.operators.Bpe
        val table = ensureBpeModel(s, d)
        val merges = Bpe.loadModel(s, table)
        val words = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 0)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .filter(col("word").rlike("^[a-z0-9]+$"))
          .distinct()
        Bpe.encode(words, "word", merges)
          .select(col("word"),
            size(Bpe.symbols(col("w"))).cast("long").as("n_pieces"),
            array_join(Bpe.symbols(col("w")), " ").as("pieces"))
          .orderBy("word")
      },
      Some(bpePersistEncodeSql(8))),

    // Document frequency (how many docs contain each word — the IDF
    // numerator, distinct from text_vocab's collection frequency).
    Q("text_df",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
        .distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("word"))
        .limit(100),
      Some("SELECT word, df FROM (SELECT word, CAST(count(*) AS BIGINT) AS df FROM (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents) GROUP BY word) ORDER BY df DESC, word LIMIT 100")),

    // Segmented inverted index ([[graft.operators.Postings]]): positional
    // posting lists sharded by doc-id segment (Lucene-segment style — a
    // hot token yields docs/segSize bounded rows, never one corpus-sized
    // list). Top-50 tokens by global df via TakeOrdered on the small
    // token-level relation, then an equi-join back to the segment rows;
    // postings render as canonical "doc:p1|p2,…" strings, so the entire
    // index — positions included — is byte-compared against DuckDB.
    Q("text_postings",
      (s, d) => {
        import graft.operators.Postings
        val idx = Postings.segmented(Tables.documents(s, d), "doc_id", "text", 128)
        val top = Postings.tokenDf(idx)
          .orderBy(col("df").desc, col("w")).limit(50)
        idx.join(top, "w")
          .select(col("w").as("token"), col("df"), col("seg"),
            col("seg_df"), col("postings"))
          .orderBy(col("df").desc, col("token"), col("seg"))
      },
      Some("WITH tok AS (SELECT doc_id, doc_id // 128 AS seg, ws[i] AS w, i - 1 AS pos FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws))) AS t(i)), " +
        "pd AS (SELECT w, seg, doc_id, CAST(doc_id AS VARCHAR) || ':' || string_agg(CAST(pos AS VARCHAR), '|' ORDER BY pos) AS posting FROM tok GROUP BY w, seg, doc_id), " +
        "ps AS (SELECT w, seg, CAST(count(*) AS BIGINT) AS seg_df, string_agg(posting, ',' ORDER BY doc_id) AS postings FROM pd GROUP BY w, seg), " +
        "top AS (SELECT w, CAST(SUM(seg_df) AS BIGINT) AS df FROM ps GROUP BY w ORDER BY df DESC, w LIMIT 50) " +
        "SELECT ps.w AS token, top.df, CAST(ps.seg AS BIGINT) AS seg, ps.seg_df, ps.postings FROM ps JOIN top ON ps.w = top.w ORDER BY top.df DESC, token, seg")),

    // Skip-gram co-occurrence (window ±2): pairs come from lead() over
    // (doc, pos) — one shuffle, NO position self-join. Pairs normalized
    // (least, greatest) so (a,b) and (b,a) accumulate together.
    Q("text_cooccur",
      (s, d) => {
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
          .withColumn("w1", lead("w", 1).over(byDoc))
          .withColumn("w2", lead("w", 2).over(byDoc))
        tok.select(col("w").as("a"), col("w1").as("b"))
          .unionByName(tok.select(col("w").as("a"), col("w2").as("b")))
          .filter(col("b").isNotNull && col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("wa"), greatest(col("a"), col("b")).as("wb"))
          .groupBy("wa", "wb").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("wa"), col("wb"))
          .limit(100)
      },
      Some("SELECT wa, wb, cnt FROM (SELECT least(a, b) AS wa, greatest(a, b) AS wb, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT ws[i] AS a, ws[i+k] AS b FROM (SELECT string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws))) AS t(i), LATERAL unnest([1, 2]) AS g(k) WHERE i + k <= len(ws)) WHERE a <> b GROUP BY 1, 2) ORDER BY cnt DESC, wa, wb LIMIT 100")),

    // Token-count histogram over the corpus (bucket = floor(tokens/10)) —
    // the length-distribution diagnostic a curation pipeline reports.
    Q("text_len_histogram",
      (s, d) => Tables.documents(s, d)
        .groupBy(floor(size(split(col("text"), " ")) / lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("SELECT CAST(floor(len(string_split(text, ' ')) / 10) AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1 ORDER BY 1")),

    // posexplode: token stream with positions (the lateral-view /
    // flatten-with-ordinality shape).
    Q("c17_explode_pos",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
        .orderBy("doc_id", "pos"),
      Some("SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ws[i] AS w FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws))) AS t(i) ORDER BY doc_id, pos")),

    // Beyond-reference: multimodal plumbing — opaque payload treated as
    // bytes + typed metadata derived without decoding.
    Q("mm_binary_meta",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (octet_length(col("text")).cast("long") % 640).as("fake_width"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, CAST(strlen(text) AS BIGINT) % 640 AS fake_width FROM documents ORDER BY doc_id")),

    // REAL pixel decode: synthesize a deterministic 24-bit BMP per doc
    // (pixel (x,y) of doc i: r=(i+7x+13y)%256 g=(2i+11x+3y)%256
    // b=(3i+5x+17y)%256; odd ids stored top-down, even bottom-up),
    // round-trip it through the library-free encoder+decoder, and
    // aggregate the DECODED pixels: channel sums, a position-weighted
    // luminance sum (catches row-order/orientation bugs that plain sums
    // can't), and an 8-bin luminance histogram. The oracle computes the
    // same integers from the closed-form pixel function — it never sees a
    // BMP byte, so a hash match proves the decoder inverts the format.
    Q("mm_pixel_stats",
      (s, d) => graft.multimodal.Multimodal
        .syntheticBmpStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents WHERE doc_id < 100), " +
        "px AS (SELECT doc_id, w, h, x, y FROM d, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
        "c AS (SELECT doc_id, w, h, x, y, (doc_id + 7*x + 13*y) % 256 AS r, (2*doc_id + 11*x + 3*y) % 256 AS g, (3*doc_id + 5*x + 17*y) % 256 AS b FROM px), " +
        "l AS (SELECT *, (r*299 + g*587 + b*114) // 1000 AS luma FROM c) " +
        "SELECT doc_id, CAST(any_value(w) AS BIGINT) AS w, CAST(any_value(h) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n_px, " +
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b, " +
        "CAST(sum((x + w*y) * luma) AS BIGINT) AS wluma, " +
        (0 until 8).map(i =>
          s"CAST(sum(CASE WHEN luma // 32 = $i THEN 1 ELSE 0 END) AS BIGINT) AS lb$i").mkString(", ") +
        " FROM l GROUP BY doc_id ORDER BY doc_id")),

    // Perceptual image fingerprint over the REAL BMP codec
    // ([[graft.multimodal.Multimodal.aHash12]]): a 12-bit average-hash
    // from the DECODED pixels — 4×3 block grid, bit = block mean luma
    // strictly above image mean, compared by integer cross-multiply (no
    // division, no FP). The pre-filter for image near-dup dedup; 12-bit
    // hamming banding downstream reuses the SimHash pigeonhole pattern.
    // The oracle computes the hash closed-form from the pixel function
    // without seeing a BMP byte, so a match proves decode + hash
    // together.
    Q("mm_image_ahash",
      (s, d) => graft.multimodal.Multimodal
        .syntheticBmpAHash(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some(s"$bmpAHashCtes " +
        "SELECT doc_id, w, h, " +
        "CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN (CAST(1 AS BIGINT) << CAST(blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash, " +
        "CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN 1 ELSE 0 END) AS BIGINT) AS n_on " +
        "FROM bs JOIN g USING (doc_id) GROUP BY doc_id, w, h ORDER BY doc_id")),

    // Nearest-neighbor resize over the REAL codec
    // ([[graft.multimodal.Multimodal.syntheticBmpResize]]): every image
    // decoded, floor-mapped to a 4×3 thumbnail, RE-ENCODED, decoded
    // again, and reduced to exact integer stats — the resize stage of an
    // image pipeline, with the codec round-trip of the resized payload
    // included in what the oracle's hash proves. The oracle computes the
    // same stats closed-form from the pixel function (target (tx,ty) →
    // source (tx·w//4, ty·h//3)) without seeing a BMP byte.
    Q("mm_image_resize",
      (s, d) => graft.multimodal.Multimodal
        .syntheticBmpResize(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id", tw = 4, th = 3)
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents WHERE doc_id < 100), " +
        "t AS (SELECT doc_id, w, h, tx, ty, (tx * w) // 4 AS sx, (ty * h) // 3 AS sy FROM d, LATERAL unnest(generate_series(0, 3)) AS a(tx), LATERAL unnest(generate_series(0, 2)) AS b(ty)), " +
        "c AS (SELECT doc_id, w, h, tx, ty, (doc_id + 7*sx + 13*sy) % 256 AS r, (2*doc_id + 11*sx + 3*sy) % 256 AS g, (3*doc_id + 5*sx + 17*sy) % 256 AS b FROM t), " +
        "l AS (SELECT *, (r*299 + g*587 + b*114) // 1000 AS luma FROM c) " +
        "SELECT doc_id, CAST(any_value(w) AS BIGINT) AS src_w, CAST(any_value(h) AS BIGINT) AS src_h, " +
        "CAST(4 AS BIGINT) AS w, CAST(3 AS BIGINT) AS h, " +
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b, " +
        "CAST(sum((tx + 4*ty) * luma) AS BIGINT) AS wluma " +
        "FROM l GROUP BY doc_id ORDER BY doc_id")),

    // REAL COMPRESSED-image decode — the zero-dependency PNG codec
    // ([[graft.multimodal.Png]]): per doc, the standing pixel function
    // encodes as a real PNG (zlib IDAT via java.util.zip.Deflater; even
    // ids RGB / odd ids RGBA; the per-row filter rotates (y+id)%5 so the
    // corpus exercises ALL FIVE scanline filters), decodes through
    // Inflater + un-filtering, and reduces to the same exact integer
    // stats the BMP rows verify — plus png_eq_bmp, the decoded RGB plane
    // compared byte-for-byte against the BMP twin of the same pixels.
    // The oracle computes everything closed-form without seeing a PNG
    // byte, so the hash match proves inflate + all five filters invert
    // the format exactly. This closes the PNG slice of the
    // compressed-codec waiver (JPEG/Opus remain documented).
    Q("mm_image_png",
      (s, d) => graft.multimodal.Png
        .syntheticPngParity(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents WHERE doc_id < 100), " +
        "px AS (SELECT doc_id, w, h, x, y FROM d, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
        "c AS (SELECT doc_id, w, h, x, y, (doc_id + 7*x + 13*y) % 256 AS r, (2*doc_id + 11*x + 3*y) % 256 AS g, (3*doc_id + 5*x + 17*y) % 256 AS b, " +
        "CASE WHEN doc_id % 4 = 1 THEN (doc_id + 9*x + 21*y) % 256 ELSE 255 END AS a FROM px), " +
        "l AS (SELECT doc_id, w, h, x, y, r, g, b, a, (y*3//h)*4 + (x*4//w) AS blk, (r*299 + g*587 + b*114) // 1000 AS luma FROM c), " +
        "bs AS (SELECT doc_id, blk, SUM(luma) AS bsum, CAST(count(*) AS BIGINT) AS bn FROM l GROUP BY 1, 2), " +
        "g AS (SELECT doc_id, SUM(luma) AS gsum, CAST(count(*) AS BIGINT) AS gn FROM l GROUP BY 1), " +
        "ah AS (SELECT doc_id, CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN (CAST(1 AS BIGINT) << CAST(blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash FROM bs JOIN g USING (doc_id) GROUP BY doc_id), " +
        "st AS (SELECT doc_id, CAST(any_value(w) AS BIGINT) AS w, CAST(any_value(h) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n_px, " +
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b, CAST(sum(a) AS BIGINT) AS sum_a, " +
        "CAST(sum((x + w*y) * luma) AS BIGINT) AS wluma FROM l GROUP BY doc_id) " +
        "SELECT st.doc_id, w, h, " +
        "CAST(CASE st.doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END AS BIGINT) AS color_type, " +
        "CAST(CASE WHEN st.doc_id % 4 = 3 THEN 16 ELSE 8 END AS BIGINT) AS bit_depth, " +
        "CAST(CASE WHEN st.doc_id % 3 = 2 THEN 1 ELSE 0 END AS BIGINT) AS interlaced, n_px, " +
        "sum_r, sum_g, sum_b, sum_a, wluma, ahash, CAST(1 AS BIGINT) AS png_eq_bmp " +
        "FROM st JOIN ah USING (doc_id) ORDER BY doc_id")),

    // REAL baseline-JPEG decode — the last image-codec waiver closed
    // ([[graft.multimodal.Jpeg]]): per doc, a block-constant color image
    // (16×16 blocks — every block is DC-only under the exact orthonormal
    // DCT, so with all-ones quant tables the entropy+DCT pipeline
    // round-trips BIT-EXACTLY) encodes as a real JPEG (Annex-K Huffman,
    // odd ids 4:2:0 / even 4:4:4), decodes through the zero-dependency
    // path (markers → Huffman → dequant → IDCT → upsample → fixed-point
    // YCbCr), and reduces to exact integer stats plus jpeg_eq_closed —
    // every decoded pixel compared against the closed form, which is
    // just the integer YCbCr round-trip of the block color. The oracle
    // computes that chain with the same bias-trick constants (every
    // floor-division operand non-negative, so // ≡ the Scala >> 16)
    // without seeing a JPEG byte. JpegSpec additionally pins the
    // decoder against the JDK's own ImageIO (libjpeg-derived) reader.
    Q("mm_image_jpeg",
      (s, d) => graft.multimodal.Jpeg
        .syntheticJpegStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 16*(1 + doc_id % 3) AS w, 16*(1 + doc_id % 2) AS h FROM documents WHERE doc_id < 100), " +
        "px AS (SELECT doc_id, w, h, x, y, x // 16 AS bx, y // 16 AS by FROM d, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
        "c0 AS (SELECT *, (doc_id + 11*bx + 17*by) % 256 AS r, (3*doc_id + 7*bx + 5*by) % 256 AS g, (2*doc_id + 13*bx + 3*by) % 256 AS b FROM px), " +
        "yc AS (SELECT doc_id, w, h, x, y, (19595*r + 38470*g + 7471*b + 32768) // 65536 AS yy, " +
        "((-11056*r - 21712*g + 32768*b + 32768 + 16777216) // 65536) - 256 AS cbm, " +
        "((32768*r - 27440*g - 5328*b + 32768 + 16777216) // 65536) - 256 AS crm FROM c0), " +
        "rc AS (SELECT doc_id, w, h, x, y, " +
        "LEAST(255, GREATEST(0, yy + ((91881*crm + 32768 + 16777216) // 65536) - 256)) AS r2, " +
        "LEAST(255, GREATEST(0, yy - (((22554*cbm + 46802*crm + 32768 + 16777216) // 65536) - 256))) AS g2, " +
        "LEAST(255, GREATEST(0, yy + ((116130*cbm + 32768 + 16777216) // 65536) - 256)) AS b2 FROM yc), " +
        "l AS (SELECT *, (r2*299 + g2*587 + b2*114) // 1000 AS luma, (y*3//h)*4 + (x*4//w) AS blk FROM rc), " +
        "bs AS (SELECT doc_id, blk, SUM(luma) AS bsum, CAST(count(*) AS BIGINT) AS bn FROM l GROUP BY 1, 2), " +
        "g AS (SELECT doc_id, SUM(luma) AS gsum, CAST(count(*) AS BIGINT) AS gn FROM l GROUP BY 1), " +
        "ah AS (SELECT doc_id, CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN (CAST(1 AS BIGINT) << CAST(blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash FROM bs JOIN g USING (doc_id) GROUP BY doc_id), " +
        "st AS (SELECT doc_id, CAST(any_value(w) AS BIGINT) AS w, CAST(any_value(h) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n_px, " +
        "CAST(sum(r2) AS BIGINT) AS sum_r, CAST(sum(g2) AS BIGINT) AS sum_g, CAST(sum(b2) AS BIGINT) AS sum_b, " +
        "CAST(sum((x + w*y) * luma) AS BIGINT) AS wluma FROM l GROUP BY doc_id) " +
        "SELECT st.doc_id, w, h, CAST(st.doc_id % 2 AS BIGINT) AS subsampled, n_px, " +
        "sum_r, sum_g, sum_b, wluma, ahash, CAST(1 AS BIGINT) AS jpeg_eq_closed " +
        "FROM st JOIN ah USING (doc_id) ORDER BY doc_id")),

    // REAL GIF decode — variable-width LZW with the full dictionary
    // lifecycle, block walk, and the 4-pass interlace order
    // ([[graft.multimodal.Gif]]; odd ids store INTERLACED). GIF is
    // palette-LOSSLESS, so this is the strongest of the three image
    // parity rows: the oracle pins every decoded pixel as exactly the
    // source block color — no conversion caveat anywhere — and the
    // stats/fingerprint re-derive from the same closed form the other
    // image rows use. JpegSpec/GifSpec additionally cross-decode
    // against the JDK's own ImageIO readers.
    Q("mm_image_gif",
      (s, d) => graft.multimodal.Gif
        .syntheticGifStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 16*(1 + doc_id % 3) AS w, 16*(1 + doc_id % 2) AS h FROM documents WHERE doc_id < 100), " +
        "px AS (SELECT doc_id, w, h, x, y, x // 16 AS bx, y // 16 AS by FROM d, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
        "c0 AS (SELECT doc_id, w, h, x, y, (doc_id + 11*bx + 17*by) % 256 AS r, (3*doc_id + 7*bx + 5*by) % 256 AS g, (2*doc_id + 13*bx + 3*by) % 256 AS b FROM px), " +
        "l AS (SELECT *, (r*299 + g*587 + b*114) // 1000 AS luma, (y*3//h)*4 + (x*4//w) AS blk FROM c0), " +
        "bs AS (SELECT doc_id, blk, SUM(luma) AS bsum, CAST(count(*) AS BIGINT) AS bn FROM l GROUP BY 1, 2), " +
        "g AS (SELECT doc_id, SUM(luma) AS gsum, CAST(count(*) AS BIGINT) AS gn FROM l GROUP BY 1), " +
        "ah AS (SELECT doc_id, CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN (CAST(1 AS BIGINT) << CAST(blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash FROM bs JOIN g USING (doc_id) GROUP BY doc_id), " +
        "st AS (SELECT doc_id, CAST(any_value(w) AS BIGINT) AS w, CAST(any_value(h) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS n_px, " +
        "CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b, " +
        "CAST(sum((x + w*y) * luma) AS BIGINT) AS wluma FROM l GROUP BY doc_id) " +
        "SELECT st.doc_id, w, h, CAST(st.doc_id % 2 AS BIGINT) AS interlaced, n_px, " +
        "sum_r, sum_g, sum_b, wluma, ahash, CAST(1 AS BIGINT) AS gif_eq_closed " +
        "FROM st JOIN ah USING (doc_id) ORDER BY doc_id")),

    // The aHash fingerprint's CONSUMER — image near-dup pairs within
    // hamming radius 2, via the SimHash pigeonhole blocking
    // ([[graft.multimodal.Multimodal.imageNearDupPairs]]): 3 disjoint
    // 4-bit segments, candidates from segment equi-joins, exact popcount
    // verify inside buckets. The oracle computes the hashes closed-form
    // (never sees a BMP byte) and pairs them with the SEMANTIC all-pairs
    // form, so a hash match proves decode + hash + the claim that
    // pigeonhole banding loses no pair.
    Q("mm_image_neardup",
      (s, d) => graft.multimodal.Multimodal
        .imageNearDupPairs(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id", maxHamming = 2)
        .orderBy("id_a", "id_b"),
      Some(imageNearDupSql + " ORDER BY id_a, id_b")),

    // Image dedup closed end-to-end, mirroring the text trio
    // (pairs → clusters → canonical): connected components over the
    // hamming-banded near-dup pairs ([[graft.operators.Components]],
    // large-star/small-star O(log n) rounds), every image labeled with
    // its cluster (= min reachable id, singletons label themselves) and
    // a canonical flag — the per-cluster survivor an image-dedup stage
    // keeps. Oracle walks the SEMANTIC pair graph with a recursive CTE,
    // so a hash match proves banding + contraction reach the same
    // fixpoint.
    Q("mm_image_clusters",
      (s, d) => {
        val imgs = Tables.documents(s, d)
          .filter(col("doc_id") < 100).select("doc_id")
        graft.operators.Components.clusters(
            imgs, "doc_id",
            graft.multimodal.Multimodal
              .imageNearDupPairs(imgs, "doc_id", maxHamming = 2),
            "id_a", "id_b")
          .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
          .orderBy("doc_id")
      },
      Some("WITH RECURSIVE " + bmpAHashCtes.stripPrefix("WITH ") + ", " +
        "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN (CAST(1 AS BIGINT) << CAST(blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash " +
        "FROM bs JOIN g USING (doc_id) GROUP BY doc_id), " +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b " +
        "ON a.doc_id < b.doc_id AND bit_count(xor(a.ahash, b.ahash)) <= 2), " +
        "sym AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs), " +
        "reach(id, r) AS (SELECT doc_id, doc_id FROM sig UNION SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a) " +
        "SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id, " +
        "id = min(r) AS is_canonical FROM reach GROUP BY id ORDER BY doc_id")),

    // REAL audio decode — the WAV twin of mm_pixel_stats: synthesize a
    // deterministic mono PCM16 waveform per doc (sample i of doc k is
    // (31k + 7i² + 13i) mod 65536 − 32768; n = 64 + k%37 samples at
    // 8000 + (k%3)·4000 Hz), round-trip it through the library-free
    // RIFF/WAVE encoder+decoder, and aggregate the DECODED samples:
    // sum, |s| sum, s² sum (the integer RMS proxy), and an 8-bin
    // amplitude histogram. The oracle computes the same integers from
    // the closed-form waveform — it never sees a WAV byte, so a hash
    // match proves the decoder inverts the container exactly (sign,
    // byte order, chunk offsets, fmt fields).
    Q("mm_audio_stats",
      (s, d) => graft.multimodal.Audio
        .syntheticWavStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 64 + doc_id % 37 AS n, 8000 + (doc_id % 3) * 4000 AS rate FROM documents WHERE doc_id < 100), " +
        "sm AS (SELECT doc_id, rate, (31*doc_id + 7*i*i + 13*i) % 65536 - 32768 AS s FROM d, LATERAL unnest(generate_series(0, n - 1)) AS t(i)) " +
        "SELECT doc_id, CAST(any_value(rate) AS BIGINT) AS rate, CAST(count(*) AS BIGINT) AS n_samples, " +
        "CAST(sum(s) AS BIGINT) AS sum_s, CAST(sum(abs(s)) AS BIGINT) AS sum_abs, CAST(sum(s*s) AS BIGINT) AS sum_sq, " +
        (0 until 8).map(i =>
          s"CAST(sum(CASE WHEN (s + 32768) // 8192 = $i THEN 1 ELSE 0 END) AS BIGINT) AS ab$i").mkString(", ") +
        " FROM sm GROUP BY doc_id ORDER BY doc_id")),

    // Nearest-neighbor resample over the REAL WAV codec
    // ([[graft.multimodal.Audio.syntheticWavResample]]) — the audio twin
    // of mm_image_resize: decimate every stream to 48 samples by the
    // floor index mapping (j·n div 48), RE-encode at 8 kHz, decode
    // again, exact integer stats. The oracle computes the same stats
    // closed-form from the waveform formula, never seeing a WAV byte.
    Q("mm_audio_resample",
      (s, d) => graft.multimodal.Audio
        .syntheticWavResample(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id", m = 48, targetRate = 8000)
        .orderBy("doc_id"),
      Some("WITH d AS (SELECT doc_id, 64 + doc_id % 37 AS n, 8000 + (doc_id % 3) * 4000 AS rate FROM documents WHERE doc_id < 100), " +
        "ix AS (SELECT doc_id, n, rate, (j * n) // 48 AS i FROM d, LATERAL unnest(generate_series(0, 47)) AS t(j)), " +
        "sm AS (SELECT doc_id, n, rate, (31*doc_id + 7*i*i + 13*i) % 65536 - 32768 AS s FROM ix) " +
        "SELECT doc_id, CAST(any_value(rate) AS BIGINT) AS src_rate, CAST(any_value(n) AS BIGINT) AS src_n, " +
        "CAST(8000 AS BIGINT) AS rate, CAST(count(*) AS BIGINT) AS n_samples, " +
        "CAST(sum(s) AS BIGINT) AS sum_s, CAST(sum(abs(s)) AS BIGINT) AS sum_abs, CAST(sum(s*s) AS BIGINT) AS sum_sq " +
        "FROM sm GROUP BY doc_id ORDER BY doc_id")),

    // Audio fingerprint over the REAL WAV codec
    // ([[graft.multimodal.Audio.eHash16]]): a 16-bit energy-contour
    // hash from the DECODED samples — 16 equal time windows, bit =
    // window mean energy strictly above stream mean, integer
    // cross-multiply. The audio twin of mm_image_ahash; the oracle
    // computes the hash closed-form without seeing a WAV byte.
    Q("mm_audio_ehash",
      (s, d) => graft.multimodal.Audio
        .syntheticWavEHash(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some(s"$wavEHashCtes " +
        "SELECT doc_id, rate, " +
        "CAST(SUM(CASE WHEN wsum * tn > tsum * wn THEN (CAST(1 AS BIGINT) << CAST(win AS INTEGER)) ELSE 0 END) AS BIGINT) AS ehash, " +
        "CAST(SUM(CASE WHEN wsum * tn > tsum * wn THEN 1 ELSE 0 END) AS BIGINT) AS n_on " +
        "FROM ws JOIN g USING (doc_id) GROUP BY doc_id, rate ORDER BY doc_id")),

    // The eHash's consumer — audio near-dup pairs within hamming 1
    // (one envelope-bit flip — the planted fixture gives 89 distinct
    // contours over 100 docs, so radius 1 is a real near-dup set, not
    // a degenerate blanket) via SimHash pigeonhole banding, exact
    // popcount verify inside buckets; oracle pairs the closed-form
    // hashes with the semantic all-pairs form, proving banding loses
    // no pair. Completes the modality symmetry: text (SimHash), image
    // (aHash), audio (eHash) all share one blocking machine.
    Q("mm_audio_neardup",
      (s, d) => graft.multimodal.Audio
        .audioNearDupPairs(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id", maxHamming = 1)
        .orderBy("id_a", "id_b"),
      Some(audioNearDupSql + " ORDER BY id_a, id_b")),

    // REAL compressed-container metadata — the third modality leg: even
    // ids synthesize an MP4 (ISO BMFF box walk; ids % 4 == 0 take the
    // version-1 64-bit duration path past 2^32 ticks), odd ids an
    // Ogg-Opus stream (CRC-verified page walk + OpusHead). Every output
    // value comes from PARSING the encoded bytes; the oracle recomputes
    // them closed-form from the id without seeing a byte, so a hash match
    // proves both walks invert their layouts (box sizes, 16.16 fixed
    // point, version variants, lacing, CRC, granule math).
    Q("mm_container_meta",
      (s, d) => graft.multimodal.Container
        .syntheticContainerStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'ogg' END AS container, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'isom' END AS brand, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 600 * (1 + doc_id % 5) ELSE 48000 END AS BIGINT) AS timescale, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN (CASE WHEN doc_id % 4 = 0 THEN 4294967296 + 977 * doc_id ELSE 10000 + 977 * doc_id END) ELSE 960 * (50 + doc_id % 300) END AS BIGINT) AS duration_units, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN (CASE WHEN doc_id % 4 = 0 THEN 4294967296 + 977 * doc_id ELSE 10000 + 977 * doc_id END) * 1000 // (600 * (1 + doc_id % 5)) ELSE (960 * (50 + doc_id % 300)) * 1000 // 48000 END AS BIGINT) AS duration_ms, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 16 * (4 + doc_id % 9) END AS BIGINT) AS width, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 16 * (3 + doc_id % 5) END AS BIGINT) AS height, " +
        "CAST(CASE WHEN doc_id % 2 = 1 THEN (CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END) END AS BIGINT) AS channels, " +
        "CAST(CASE WHEN doc_id % 2 = 1 THEN 312 + doc_id % 100 END AS BIGINT) AS preskip, " +
        "CAST(CASE WHEN doc_id % 2 = 1 THEN 8000 * (1 + doc_id % 6) END AS BIGINT) AS sample_rate, " +
        "CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 + doc_id % 4 END AS BIGINT) AS n_parts " +
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id")),

    // Malformed-container audit — the reject corpus: each payload is
    // intact or damaged by one of three deterministic classes (magic
    // clobber, mid-structure truncation, size-overrun / CRC byte flip)
    // and pushed through the REAL parsers. The oracle pins
    // accepted = (mode = 0) closed-form, so a parser that believes a
    // clobbered magic, walks a box past EOF, or skips the Ogg CRC
    // hash-mismatches — malformed-input behavior is now oracle-locked,
    // not just fuzz-survival (ContainerSpec's never-throws).
    Q("mm_container_reject",
      (s, d) => graft.multimodal.Container
        .rejectCorpusStats(
          Tables.documents(s, d).filter(col("doc_id") < 200).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'ogg' END AS container, " +
        "CAST((doc_id // 2) % 4 AS BIGINT) AS mode, " +
        "(doc_id // 2) % 4 = 0 AS accepted, " +
        "CAST(CASE WHEN (doc_id // 2) % 4 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 + doc_id % 4 END) END AS BIGINT) AS n_parts " +
        "FROM documents WHERE doc_id < 200 ORDER BY doc_id")),

    // Opus packet layer (RFC 6716 §3) — the TOC/framing half of the
    // last codec waiver, made real: each id's stream is written with
    // VALID Opus packet framing ([[graft.multimodal.Opus.packetForPlan]]
    // — all 32 TOC configs across the corpus, packing codes 0-3, 1- and
    // 2-byte length coding, CBR/VBR code-3 frames, explicit padding)
    // and TRUE granule positions, then CRC-walked, packet-reassembled
    // from the lacing, and parsed back under the specification's R1-R7
    // validity rules ([[graft.multimodal.Opus.parsePacket]]). The row
    // aggregates what the PARSER recovered; the oracle recomputes every
    // count from the (id, page) plan arithmetic alone, so a hash match
    // proves writer and parser are exact inverses across every packing
    // form — and `accepted` pins the granule range equalling the
    // packet-layer sample total. PCM synthesis (SILK/CELT transform
    // decode) remains the documented waiver (no conformance vectors
    // offline). Scale: fixed-slice corpus, one mapPartitions pass, no
    // shuffle before the output sort — the mm_container family's flat
    // class.
    Q("mm_audio_opus_toc",
      (s, d) => graft.multimodal.Container
        .opusTocStats(
          Tables.documents(s, d).filter(col("doc_id") < 200).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some("WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200), " +
        "dd(d) AS (VALUES (0), (1), (2), (3)), " +
        "pk AS (SELECT id, d, (id * 7 + d * 3) % 32 AS cfg, d % 4 AS code " +
        "FROM ids CROSS JOIN dd WHERE d <= id % 4), " +
        "pe AS (SELECT id, d, cfg, code, " +
        "CASE WHEN cfg < 12 THEN (CASE cfg % 4 WHEN 0 THEN 100 WHEN 1 THEN 200 WHEN 2 THEN 400 ELSE 600 END) " +
        "WHEN cfg < 16 THEN (CASE cfg % 2 WHEN 0 THEN 100 ELSE 200 END) " +
        "ELSE (CASE cfg % 4 WHEN 0 THEN 25 WHEN 1 THEN 50 WHEN 2 THEN 100 ELSE 200 END) END AS dur " +
        "FROM pk), " +
        "pf AS (SELECT id, cfg, code, dur, " +
        "CASE code WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 " +
        "ELSE 1 + (d + id) % LEAST(48, 1200 // dur) END AS frames, " +
        "(code = 2 OR (code = 3 AND (id + d) % 2 = 1)) AS is_vbr, " +
        "(code = 3 AND id % 3 = 0) AS is_pad " +
        "FROM pe) " +
        "SELECT id AS doc_id, " +
        "CAST(count(*) AS BIGINT) AS n_packets, " +
        "CAST(sum(frames) AS BIGINT) AS n_frames, " +
        "CAST(sum(frames * (dur * 48 // 10)) AS BIGINT) AS samples48, " +
        "CAST(sum(CASE WHEN is_vbr THEN 1 ELSE 0 END) AS BIGINT) AS n_vbr, " +
        "CAST(sum(CASE WHEN is_pad THEN 1 ELSE 0 END) AS BIGINT) AS n_padded, " +
        "CAST(sum(CASE WHEN cfg < 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_silk, " +
        "CAST(sum(CASE WHEN cfg >= 12 AND cfg < 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_hybrid, " +
        "CAST(sum(CASE WHEN cfg >= 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_celt, " +
        "TRUE AS accepted " +
        "FROM pf GROUP BY id ORDER BY doc_id")),

    // REAL video decode — the Y4M (YUV4MPEG2) twin of mm_pixel_stats,
    // closing the last modality without a real codec path: synthesize a
    // deterministic multi-frame C444 video per doc, round-trip it
    // through [[graft.multimodal.Video.encodeY4m]] →
    // [[Video.decodeY4m]] (ASCII header-tag parse, FRAME marker walk
    // with per-frame parameter tolerance, full-res plane slicing),
    // sample k=4 evenly-spaced frames (t = j·nf div 4 — the uniform
    // frame-sampling policy of video feature extraction), and reduce
    // each sampled frame to exact integer plane sums plus a
    // position-weighted luma sum (catches plane-order / row-major
    // mistakes). The oracle computes every number from the closed-form
    // pixel function without seeing a Y4M byte, so a hash match proves
    // encoder, container walk, plane slicing, and sampling policy
    // together. Scale: one mapPartitions decode pass, k rows out per
    // video, no shuffle before the output sort.
    Q("mm_video_frames",
      (s, d) => graft.multimodal.Video
        .syntheticY4mFrameStats(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id", k = 4)
        .orderBy("doc_id", "frame_no"),
      Some("WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h, 3 + doc_id % 5 AS nf FROM documents WHERE doc_id < 100), " +
        "fr AS (SELECT doc_id, w, h, nf, j AS frame_no, (j * nf) // 4 AS t FROM d, LATERAL unnest(generate_series(0, 3)) AS a(j)), " +
        "px AS (SELECT doc_id, frame_no, t, w, h, nf, x, y, " +
        "(doc_id + 7*x + 13*y + 29*t) % 256 AS py, " +
        "(2*doc_id + 11*x + 3*y + 19*t) % 256 AS pu, " +
        "(3*doc_id + 5*x + 17*y + 23*t) % 256 AS pv " +
        "FROM fr, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)) " +
        "SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no, CAST(any_value(t) AS BIGINT) AS t, " +
        "CAST(any_value(w) AS BIGINT) AS w, CAST(any_value(h) AS BIGINT) AS h, CAST(any_value(nf) AS BIGINT) AS n_frames, " +
        "CAST(sum(py) AS BIGINT) AS sum_y, CAST(sum(pu) AS BIGINT) AS sum_u, CAST(sum(pv) AS BIGINT) AS sum_v, " +
        "CAST(sum((x + w*y) * py) AS BIGINT) AS wsum_y " +
        "FROM px GROUP BY doc_id, frame_no ORDER BY doc_id, frame_no")),

    // Scene-cut segmentation over the REAL codec ([[graft.multimodal
    // .Video.scenesFromLuma]]) — the shot-boundary step a video
    // curation pipeline runs before per-shot frame sampling: the
    // fixture plants cuts at the doc id's BIT boundaries (+128 luma on
    // frame t iff bit t set, base luma constant in t, so consecutive
    // frames' sums differ by exactly 0 or 128·w·h through the
    // encode→decode round trip), detection is a pure integer compare
    // (threshold 64·w·h), and scenes roll up as maximal cut-free runs.
    // The oracle recomputes the per-frame sums pixel-by-pixel from the
    // closed form and runs the identical lag/cumsum chain — a hash
    // match proves codec, luma reduction, cut rule and run assembly
    // together. Windows partition PER VIDEO (≤10 rows each).
    Q("mm_video_scenes",
      (s, d) => graft.multimodal.Video.scenesFromLuma(
          graft.multimodal.Video.syntheticY4mSceneFrames(
            Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
            "doc_id"),
          "doc_id")
        .orderBy("doc_id", "scene_no"),
      Some("WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h, 6 + doc_id % 5 AS nf FROM documents WHERE doc_id < 100), " +
        "fr AS (SELECT doc_id, w, h, nf, t FROM d, LATERAL unnest(generate_series(0, nf - 1)) AS a(t)), " +
        "px AS (SELECT doc_id, t, w, h, ((doc_id + 7*x + 13*y) % 64) + 128 * ((doc_id >> t) & 1) AS py " +
        "FROM fr, LATERAL unnest(generate_series(0, w - 1)) AS tx(x), LATERAL unnest(generate_series(0, h - 1)) AS ty(y)), " +
        "fs AS (SELECT doc_id, t, w, h, CAST(SUM(py) AS BIGINT) AS sum_y FROM px GROUP BY doc_id, t, w, h), " +
        "ch AS (SELECT doc_id, t, CASE WHEN lag(sum_y) OVER (PARTITION BY doc_id ORDER BY t) IS NULL THEN 0 " +
        "WHEN abs(sum_y - lag(sum_y) OVER (PARTITION BY doc_id ORDER BY t)) >= 64*w*h THEN 1 ELSE 0 END AS cut FROM fs), " +
        "sc AS (SELECT doc_id, t, CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_no FROM ch) " +
        "SELECT doc_id, scene_no, CAST(MIN(t) AS BIGINT) AS start_t, CAST(MAX(t) AS BIGINT) AS end_t, CAST(count(*) AS BIGINT) AS n_frames " +
        "FROM sc GROUP BY doc_id, scene_no ORDER BY doc_id, scene_no")),

    // Video fingerprint over the REAL codec ([[graft.multimodal.Video
    // .vHash16]]): 4 sampled frames × 4 quadrants, bit = cell mean luma
    // strictly above the video mean by 128-bit integer cross-multiply.
    // The fixture plants an id-bit brightness key with a pinned 8/16
    // lit-cell count (complement trick), so the decoded hash provably
    // EQUALS the planted key for every id — simulated closed-form
    // before implementation (the round-11 audio-fixture lesson). The
    // oracle recomputes cell/total sums from the pixel function and
    // packs the same bits, never seeing a Y4M byte.
    Q("mm_video_vhash",
      (s, d) => graft.multimodal.Video
        .syntheticVideoVHash(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id")
        .orderBy("doc_id"),
      Some(y4mVHashCtes +
        " SELECT vh.doc_id, vh.vhash, CAST(bit_count(vh.vhash) AS BIGINT) AS n_bits " +
        "FROM vh ORDER BY doc_id")),

    // Video near-dup pairs — the vHash consumer, completing the
    // modality symmetry: text (SimHash) / image (aHash) / audio (eHash)
    // / video (vHash) all ride the ONE pigeonhole banding machine.
    // Radius 2 over 16 bits = 3 disjoint segments; any pair within the
    // radius agrees exactly on one, so candidates come from segment
    // equi-joins and popcount verifies inside buckets only. The oracle
    // is the semantic all-pairs form — a hash match proves the banding
    // loses no pair.
    Q("mm_video_neardup",
      (s, d) => graft.multimodal.Video
        .videoNearDupPairs(
          Tables.documents(s, d).filter(col("doc_id") < 100).select("doc_id"),
          "doc_id", maxHamming = 2)
        .orderBy("id_a", "id_b"),
      Some(videoNearDupSql + " ORDER BY id_a, id_b")),

    // Per-modality datasheet rollup — report_datacard's missing half:
    // the corpus datasheet now covers the NON-text surface too, one row
    // per modality (image/audio/video) with item volume, near-dup pair
    // count, and how many items sit in at least one near-dup pair (the
    // slice an image/audio dedup stage would drop or link). Composes
    // the three verified fingerprint+banding chains; each pair set is
    // localCheckpoint'd (two consumers), the rollup rows are 1-row
    // scalar aggregates. Oracle embeds the three closed-form pair
    // queries as derived tables (they share CTE names, so they can't
    // share one WITH — the recallMatrixSql pattern).
    Q("report_datacard_mm",
      (s, d) => {
        val items = Tables.documents(s, d)
          .filter(col("doc_id") < 100).select("doc_id").localCheckpoint()
        // the item count stays IN the plan (a 1-row scalar broadcast per
        // modality row) — a driver-side .count() was fine under the
        // fixed slice cap but becomes a blocking extra job the moment
        // the cap lifts (r13 watch-list)
        val nItems = items.agg(count(lit(1)).as("n_items"))
        def row(name: String, pairs0: DataFrame): DataFrame = {
          val pairs = pairs0.localCheckpoint()
          val dups = pairs.select(col("id_a").as("i"))
            .unionByName(pairs.select(col("id_b").as("i")))
          pairs.agg(count(lit(1)).as("n_pairs"))
            .crossJoin(dups.agg(countDistinct(col("i")).as("n_dup_items")))
            .crossJoin(broadcast(nItems))
            .select(lit(name).as("modality"), col("n_items"),
              col("n_pairs"), col("n_dup_items"))
        }
        row("1_image", graft.multimodal.Multimodal
            .imageNearDupPairs(items, "doc_id", maxHamming = 2))
          .unionByName(row("2_audio", graft.multimodal.Audio
            .audioNearDupPairs(items, "doc_id", maxHamming = 1)))
          .unionByName(row("3_video", graft.multimodal.Video
            .videoNearDupPairs(items, "doc_id", maxHamming = 2)))
          .orderBy("modality")
      },
      Some {
        def roll(name: String, pairsSql: String): String =
          s"SELECT '$name' AS modality, " +
            "(SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id < 100) AS n_items, " +
            s"CAST((SELECT count(*) FROM ($pairsSql)) AS BIGINT) AS n_pairs, " +
            s"CAST((SELECT count(DISTINCT i) FROM (SELECT id_a AS i FROM ($pairsSql) UNION ALL SELECT id_b FROM ($pairsSql))) AS BIGINT) AS n_dup_items"
        roll("1_image", imageNearDupSql) +
          " UNION ALL " + roll("2_audio", audioNearDupSql) +
          " UNION ALL " + roll("3_video", videoNearDupSql) +
          " ORDER BY modality"
      }),

    // Cross-modal PAIR CURATION — the image-text alignment filter a
    // LAION/DataComp-style pipeline runs before training on (caption,
    // image) pairs: each doc_id < 100 row is a joint example (caption =
    // text, image = the synthetic BMP the mm_image_* codec rows decode
    // for real), the caption side fingerprints through SimHash16 (low
    // 12 bits) and the image side through the REAL-decode aHash12, and
    // the alignment score is the COSINE of the two ±1 bit-vectors kept
    // as its exact integer numerator — align = matches − mismatches =
    // 12 − 2·hamming ∈ [−12, 12] (÷12 is the cosine; the integer form
    // is hash-exact, no FP threshold needed). Gate: align ≥ 0 (majority
    // bit agreement). Output = the datacard's pair-yield section:
    // per-source pair volume, kept count, summed alignment (pins every
    // pair's score) and 2^20 fixed-point keep rate — the numbers that
    // decide per-source mixing weights for multimodal training. Scale:
    // both fingerprints are linear passes (explode-agg / one
    // mapPartitions decode), the join is id-keyed, the rollup is one
    // grouped agg — no pair ever meets another pair.
    Q("mm_pair_align",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
          .select("doc_id", "source", "text")
        val cap = graft.operators.Dedup
          .simhash(docs, "doc_id", "text", bits = 16)
          .select(col("doc_id"), (col("simhash") % 4096).as("cap12"))
        val img = graft.multimodal.Multimodal
          .syntheticBmpAHash(docs.select("doc_id"), "doc_id")
          .select(col("doc_id"), col("ahash"))
        docs.select("doc_id", "source")
          .join(cap, "doc_id").join(img, "doc_id")
          .select(col("source"),
            (lit(12L) - lit(2L) * bit_count(col("cap12")
              .bitwiseXOR(col("ahash"))).cast("long")).as("align"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("align") >= 0, 1L).otherwise(0L)).as("n_kept"),
            sum(col("align")).as("sum_align"))
          .withColumn("keep_fp20", expr("n_kept * 1048576 div n_pairs"))
          .orderBy("source")
      },
      Some("WITH " + bmpAHashCtes.stripPrefix("WITH ") + ", " +
        "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN bsum * gn > gsum * bn THEN (CAST(1 AS BIGINT) << CAST(blk AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash " +
        "FROM bs JOIN g USING (doc_id) GROUP BY doc_id), " +
        s"sh AS (SELECT * FROM (${simhashSql(16)}) WHERE doc_id < 100), " +
        "al AS (SELECT dd.doc_id, dd.source, 12 - 2 * CAST(bit_count(xor(sh.simhash % 4096, sig.ahash)) AS BIGINT) AS align " +
        "FROM documents dd JOIN sh USING (doc_id) JOIN sig USING (doc_id) WHERE dd.doc_id < 100) " +
        "SELECT source, CAST(count(*) AS BIGINT) AS n_pairs, " +
        "CAST(SUM(CASE WHEN align >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "CAST(SUM(align) AS BIGINT) AS sum_align, " +
        "CAST(SUM(CASE WHEN align >= 0 THEN 1 ELSE 0 END) * 1048576 // count(*) AS BIGINT) AS keep_fp20 " +
        "FROM al GROUP BY source ORDER BY source")),

    // Token-entropy quality signal ([[graft.operators.InfoStats]]): the
    // per-doc Shannon entropy numerator N·qlog2(N) − Σ c·qlog2(c) in
    // 2^-20-bit fixed point (Mitchell log2 — all-integer, hash-exact
    // cross-engine). Distributional-collapse complement of
    // text_repetition's single-n-gram coverage flags.
    Q("text_entropy",
      (s, d) => graft.operators.InfoStats
        .tokenEntropy(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some {
        import graft.functions.ILog
        // SUMs feeding output columns are CAST AS BIGINT (house pattern,
        // q1_agg): DuckDB's SUM(BIGINT) yields HUGEINT, which the
        // verification driver hashes as float64 → hash mismatch.
        "WITH c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM " +
          "(SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents) GROUP BY doc_id, w), " +
          "a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
          s"CAST(SUM(c * ${ILog.qlogSqlDuck("c")}) AS BIGINT) AS s FROM c GROUP BY doc_id) " +
          "SELECT doc_id, n_tokens, " +
          s"n_tokens * ${ILog.qlogSqlDuck("n_tokens")} - s AS ent_fp20, " +
          s"(n_tokens * ${ILog.qlogSqlDuck("n_tokens")} - s) // n_tokens AS avg_fp20 " +
          "FROM a ORDER BY doc_id"
      }),

    // Top-p-by-MASS quality selection: per language, keep the
    // highest-entropy documents that together carry the top ~60% of
    // TOKEN mass (the curation question is "what fraction of training
    // tokens survive", not "what fraction of documents"). The threshold
    // is the token-WEIGHTED p40 of the per-doc entropy score from the
    // mergeable HDR sketch ([[graft.functions.Hdr.quantileEstimates]],
    // weighted variant): bucket counts bound the shuffle at
    // O(tasks × buckets), the per-lang cumulative runs over ≤ a few
    // hundred bucket rows, and selection is a broadcast threshold join +
    // map-side compare — never a per-language sort. The sketch's bucket
    // lower bound makes the cut deterministic and conservative (keeps
    // slightly MORE than the target mass, never less); integer ranks
    // and Mitchell-log scores are bit-identical cross-engine.
    Q("quality_topp",
      (s, d) => {
        import graft.functions.Hdr
        val scored = graft.operators.InfoStats
          .tokenEntropy(Tables.documents(s, d), "doc_id", "text")
          .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
        val th = Hdr.quantileEstimates(scored, Seq("lang"), "avg_fp20", 7,
          Seq((2L, 5L, "t_lb")), Some("n_tokens"))
        scored.join(broadcast(th.select(col("lang"), col("t_lb"))), "lang")
          .select(col("doc_id"), col("lang"), col("avg_fp20"), col("n_tokens"),
            (col("avg_fp20") >= col("t_lb")).as("kept"))
          .orderBy("doc_id")
      },
      Some {
        import graft.functions.{Hdr, ILog}
        val bexp = Hdr.bucketSqlDuck("avg_fp20", 7)
        val lb = Hdr.lowerBoundSqlDuck("b", 7)
        // SUMs are CAST AS BIGINT throughout (house pattern, q1_agg):
        // output columns n_tokens/avg_fp20 must not reach the driver as
        // DuckDB HUGEINT (hashed as float64 → mismatch).
        "WITH c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM " +
          "(SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents) GROUP BY doc_id, w), " +
          "a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
          s"CAST(SUM(c * ${ILog.qlogSqlDuck("c")}) AS BIGINT) AS s FROM c GROUP BY doc_id), " +
          "e AS (SELECT doc_id, n_tokens, " +
          s"(n_tokens * ${ILog.qlogSqlDuck("n_tokens")} - s) // n_tokens AS avg_fp20 FROM a), " +
          "scored AS (SELECT doc_id, lang, avg_fp20, n_tokens FROM e JOIN documents USING (doc_id)), " +
          s"bk AS (SELECT lang, $bexp AS b, n_tokens FROM scored), " +
          "cnt AS (SELECT lang, b, CAST(SUM(n_tokens) AS BIGINT) AS cb FROM bk GROUP BY 1, 2), " +
          "wq AS (SELECT lang, b, CAST(SUM(cb) OVER (PARTITION BY lang ORDER BY b) AS BIGINT) AS cum, CAST(SUM(cb) OVER (PARTITION BY lang) AS BIGINT) AS n FROM cnt), " +
          s"th AS (SELECT lang, CAST(MIN(CASE WHEN cum >= (n * 2 + 4) // 5 THEN $lb END) AS BIGINT) AS t_lb FROM wq GROUP BY lang) " +
          "SELECT doc_id, lang, avg_fp20, n_tokens, avg_fp20 >= t_lb AS kept " +
          "FROM scored JOIN th USING (lang) ORDER BY doc_id"
      }),

    // Multi-signal quality ENSEMBLE (the FineWeb-style vote: no single
    // filter decides): four independent verified signals per doc —
    // the Gopher fixed-threshold gate (text_quality_gate), the NB
    // classifier (quality_nb), top-p entropy selection against the
    // per-lang weighted-HDR threshold (quality_topp), and DSIR
    // target-likeness (dsir_weights, logw ≥ 0) — voted into
    // n_pass with kept = n_pass ≥ 3. Each signal is one linear pass
    // with a broadcast model; the vote is a doc_id-keyed 4-way join of
    // doc-sized frames. The oracle recomputes all four chains
    // end-to-end, so a hash match proves every signal AND the vote.
    Q("quality_ensemble",
      (s, d) => {
        import graft.operators.NbClassifier
        import graft.functions.Hdr
        val docs = Tables.documents(s, d)
        // signal 1: Gopher fixed-threshold gate
        val toks = size(split(lower(col("text")), " ")).cast("long")
        val swRatio = Text.stopwordHits(col("text")).cast("double") / toks
        val cpt = length(col("text")).cast("double") / toks
        val gateKeep = !(toks < 5 || toks > 1000 || swRatio < 0.05 ||
          (Text.punctCount(col("text")).cast("double") / length(col("text"))) > 0.3 ||
          cpt > 12.0)
        val gate = docs.select(col("doc_id"), gateKeep.as("s_gate"))
        // signal 2: NB classifier (the quality_nb model)
        val tok = docs.select(col("doc_id"),
          col("source").isin("src0", "src1", "src2", "src3", "src4").as("is_pos"),
          explode(split(lower(col("text")), " ")).as("w"))
        val train = tok.filter(col("doc_id") % 10 < 8)
        val nb = NbClassifier.score(tok.select("doc_id", "w"),
            NbClassifier.tokenClassCounts(train), NbClassifier.modelScalars(train))
          .select(col("doc_id"), col("pred_pos").as("s_nb"))
        // signal 3: top-p entropy vs the per-lang weighted-HDR threshold
        val scored = graft.operators.InfoStats
          .tokenEntropy(docs, "doc_id", "text")
          .join(docs.select("doc_id", "lang"), "doc_id")
        val th = Hdr.quantileEstimates(scored, Seq("lang"), "avg_fp20", 7,
          Seq((2L, 5L, "t_lb")), Some("n_tokens"))
        val ent = scored.join(broadcast(th.select(col("lang"), col("t_lb"))), "lang")
          .select(col("doc_id"), (col("avg_fp20") >= col("t_lb")).as("s_entropy"))
        // signal 4: DSIR target-likeness (logw >= 0)
        val dsir = graft.operators.Dsir
          .importanceWeights(docs, "doc_id", "text", col("lang") === "en", 256)
          .select(col("doc_id"), (col("logw_fp20") >= 0).as("s_dsir"))
        def b2i(c: Column) = when(c, 1L).otherwise(0L)
        gate.join(nb, "doc_id").join(ent, "doc_id").join(dsir, "doc_id")
          .withColumn("n_pass",
            (b2i(col("s_gate")) + b2i(col("s_nb")) + b2i(col("s_entropy")) +
              b2i(col("s_dsir"))).cast("long"))
          .withColumn("kept", col("n_pass") >= 3)
          .orderBy("doc_id")
      },
      Some {
        import graft.functions.{Hdr, ILog}
        def qd(e: String) = ILog.qlogSqlDuck(e)
        val bexp = Hdr.bucketSqlDuck("avg_fp20", 7)
        val lb = Hdr.lowerBoundSqlDuck("b", 7)
        val dsirB = "CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 256"
        "WITH g AS (SELECT doc_id, NOT (len(string_split(lower(text), ' ')) < 5 OR len(string_split(lower(text), ' ')) > 1000 OR " +
          s"CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ${Text.StopWordsSql})) AS DOUBLE) / len(string_split(lower(text), ' ')) < 0.05 OR " +
          "CAST(len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS DOUBLE) / length(text) > 0.3 OR " +
          "CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) > 12.0) AS s_gate FROM documents), " +
          // NB chain (the quality_nb oracle verbatim, reduced to pred)
          "tokn AS (SELECT doc_id, source IN ('src0','src1','src2','src3','src4') AS is_pos, unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
          "trn AS (SELECT * FROM tokn WHERE doc_id % 10 < 8), " +
          "cln AS (SELECT w, CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS cp, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS cn FROM trn GROUP BY w), " +
          "msn AS (SELECT CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS npos, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS nneg, " +
          "CAST(count(DISTINCT w) AS BIGINT) AS vsz, CAST(count(DISTINCT CASE WHEN is_pos THEN doc_id END) AS BIGINT) AS dpos, CAST(count(DISTINCT CASE WHEN NOT is_pos THEN doc_id END) AS BIGINT) AS dneg FROM trn), " +
          "jn AS (SELECT tokn.doc_id, " +
          s"${qd("(COALESCE(cp, 0) + 1)")} - ${qd("(npos + vsz)")} - ${qd("(COALESCE(cn, 0) + 1)")} + ${qd("(nneg + vsz)")} AS wt, dpos, dneg " +
          "FROM tokn LEFT JOIN cln USING (w) CROSS JOIN msn), " +
          "nb AS (SELECT doc_id, " +
          s"(${qd("dpos")} - ${qd("dneg")} + SUM(wt)) > 0 AS s_nb " +
          "FROM jn GROUP BY doc_id, dpos, dneg), " +
          // entropy + weighted-HDR threshold (the quality_topp oracle)
          "ce AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM " +
          "(SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents) GROUP BY doc_id, w), " +
          "ae AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
          s"CAST(SUM(c * ${qd("c")}) AS BIGINT) AS sN FROM ce GROUP BY doc_id), " +
          "ee AS (SELECT doc_id, n_tokens, " +
          s"(n_tokens * ${qd("n_tokens")} - sN) // n_tokens AS avg_fp20 FROM ae), " +
          "scde AS (SELECT doc_id, lang, avg_fp20, n_tokens FROM ee JOIN documents USING (doc_id)), " +
          s"bke AS (SELECT lang, $bexp AS b, n_tokens FROM scde), " +
          "cnte AS (SELECT lang, b, CAST(SUM(n_tokens) AS BIGINT) AS cb FROM bke GROUP BY 1, 2), " +
          "wqe AS (SELECT lang, b, CAST(SUM(cb) OVER (PARTITION BY lang ORDER BY b) AS BIGINT) AS cum, CAST(SUM(cb) OVER (PARTITION BY lang) AS BIGINT) AS n FROM cnte), " +
          s"the AS (SELECT lang, CAST(MIN(CASE WHEN cum >= (n * 2 + 4) // 5 THEN $lb END) AS BIGINT) AS t_lb FROM wqe GROUP BY lang), " +
          "ent AS (SELECT scde.doc_id, scde.avg_fp20 >= the.t_lb AS s_entropy FROM scde JOIN the USING (lang)), " +
          // DSIR chain (the dsir_weights oracle, reduced to the sign)
          s"fd AS (SELECT doc_id, lang = 'en' AS is_target, $dsirB AS b FROM " +
          "(SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w FROM documents)), " +
          "ctd AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM fd WHERE is_target GROUP BY b), " +
          "crd AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM fd GROUP BY b), " +
          "totd AS (SELECT CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) + 256 AS BIGINT) AS ntb, CAST(count(*) + 256 AS BIGINT) AS nrb FROM fd), " +
          "scd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok, " +
          s"CAST(SUM(${qd("(COALESCE(ct, 0) + 1)")} - ${qd("(COALESCE(cr, 0) + 1)")}) AS BIGINT) AS sd " +
          "FROM fd LEFT JOIN ctd USING (b) LEFT JOIN crd USING (b) GROUP BY doc_id), " +
          "dsr AS (SELECT doc_id, " +
          s"(sd + n_tok * (${qd("nrb")} - ${qd("ntb")})) >= 0 AS s_dsir FROM scd, totd) " +
          "SELECT g.doc_id, s_gate, s_nb, s_entropy, s_dsir, " +
          "CAST((CASE WHEN s_gate THEN 1 ELSE 0 END) + (CASE WHEN s_nb THEN 1 ELSE 0 END) + " +
          "(CASE WHEN s_entropy THEN 1 ELSE 0 END) + (CASE WHEN s_dsir THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, " +
          "((CASE WHEN s_gate THEN 1 ELSE 0 END) + (CASE WHEN s_nb THEN 1 ELSE 0 END) + " +
          "(CASE WHEN s_entropy THEN 1 ELSE 0 END) + (CASE WHEN s_dsir THEN 1 ELSE 0 END)) >= 3 AS kept " +
          "FROM g JOIN nb ON g.doc_id = nb.doc_id JOIN ent ON g.doc_id = ent.doc_id JOIN dsr ON g.doc_id = dsr.doc_id " +
          "ORDER BY g.doc_id"
      }),

    // DSIR hashed-unigram importance weights ([[graft.operators.Dsir]],
    // Xie et al. NeurIPS 2023): score every doc by how target-like its
    // token distribution is (target = the English slice), via two
    // 256-bucket md5-hashed count models, add-1 smoothed, telescoped to
    // an all-integer fixed-point log2 sum. Bucket models broadcast;
    // scoring is map-side + one doc_id agg.
    Q("dsir_weights",
      (s, d) => graft.operators.Dsir
        .importanceWeights(Tables.documents(s, d), "doc_id", "text",
          col("lang") === "en", buckets = 256)
        .orderBy("doc_id"),
      Some {
        import graft.functions.ILog
        val b = "CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 256"
        "WITH f AS (SELECT doc_id, lang = 'en' AS is_target, " + b + " AS b FROM " +
          "(SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w FROM documents)), " +
          "ct AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM f WHERE is_target GROUP BY b), " +
          "cr AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM f GROUP BY b), " +
          "tot AS (SELECT CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) + 256 AS BIGINT) AS ntb, CAST(count(*) + 256 AS BIGINT) AS nrb FROM f), " +
          // sd is CAST AS BIGINT (SUM → HUGEINT otherwise; house
          // pattern, q1_agg), and avg_fp20 uses a sign-explicit
          // TRUNCATING division: logw_fp20 goes negative for
          // off-target docs, and DuckDB's `//` floors on newer
          // releases but truncates on 1.0.0 — the CASE pins
          // truncate-toward-zero (= Spark `div`) on every version.
          "sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok, " +
          s"CAST(SUM(${ILog.qlogSqlDuck("(COALESCE(ct, 0) + 1)")} - ${ILog.qlogSqlDuck("(COALESCE(cr, 0) + 1)")}) AS BIGINT) AS sd " +
          "FROM f LEFT JOIN ct USING (b) LEFT JOIN cr USING (b) GROUP BY doc_id), " +
          "lw AS (SELECT doc_id, n_tok, " +
          s"sd + n_tok * (${ILog.qlogSqlDuck("nrb")} - ${ILog.qlogSqlDuck("ntb")}) AS logw_fp20 " +
          "FROM sc, tot) " +
          "SELECT doc_id, n_tok, logw_fp20, " +
          "CASE WHEN logw_fp20 >= 0 THEN logw_fp20 // n_tok ELSE -((-logw_fp20) // n_tok) END AS avg_fp20 " +
          "FROM lw ORDER BY doc_id"
      }),

    // Model-based quality classifier ([[graft.operators.NbClassifier]]):
    // add-1 multinomial Naive Bayes trained on the curated-vs-rest label
    // (sources src0–src4 stand in for the "wiki-like" positive corpus,
    // the GPT-3/LLaMA quality-filter setup), 80% train slice, EVERY doc
    // scored. All integer qlog2 fixed point — bit-identical engines.
    // Scale: vocab-bounded count table, token-keyed scoring join,
    // doc-keyed sum; scalars ride as 1-row broadcasts.
    Q("quality_nb",
      (s, d) => {
        import graft.operators.NbClassifier
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            col("source").isin("src0", "src1", "src2", "src3", "src4")
              .as("is_pos"),
            explode(split(lower(col("text")), " ")).as("w"))
        val train = tok.filter(col("doc_id") % 10 < 8)
        NbClassifier.score(tok.select("doc_id", "w"),
            NbClassifier.tokenClassCounts(train),
            NbClassifier.modelScalars(train))
          .select(col("doc_id"), (col("doc_id") % 10 >= 8).as("held_out"),
            col("n_tokens"), col("score_fp20"), col("pred_pos"))
          .orderBy("doc_id")
      },
      Some(nbScoreSql)),

    // The classifier's EVALUATION — held-out confusion matrix: the same
    // NB model scored on the 20% slice it never trained on, bucketed by
    // (true label, prediction). The model-quality report that decides
    // whether a filter ships; 4 rows, all integer counts.
    Q("quality_nb_eval",
      (s, d) => {
        import graft.operators.NbClassifier
        val labeled = Tables.documents(s, d)
          .select(col("doc_id"),
            col("source").isin("src0", "src1", "src2", "src3", "src4")
              .as("label"))
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            col("source").isin("src0", "src1", "src2", "src3", "src4")
              .as("is_pos"),
            explode(split(lower(col("text")), " ")).as("w"))
        val train = tok.filter(col("doc_id") % 10 < 8)
        NbClassifier.score(tok.select("doc_id", "w"),
            NbClassifier.tokenClassCounts(train),
            NbClassifier.modelScalars(train))
          .filter(col("doc_id") % 10 >= 8)
          .join(labeled, Seq("doc_id"))
          .groupBy("label", "pred_pos").agg(count(lit(1)).as("n"))
          .orderBy("label", "pred_pos")
      },
      Some {
        "WITH tok AS (SELECT doc_id, source IN ('src0','src1','src2','src3','src4') AS is_pos, unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
          "tr AS (SELECT * FROM tok WHERE doc_id % 10 < 8), " +
          "cl AS (SELECT w, CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS cp, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS cn FROM tr GROUP BY w), " +
          "ms AS (SELECT CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS npos, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS nneg, " +
          "CAST(count(DISTINCT w) AS BIGINT) AS vsz, CAST(count(DISTINCT CASE WHEN is_pos THEN doc_id END) AS BIGINT) AS dpos, CAST(count(DISTINCT CASE WHEN NOT is_pos THEN doc_id END) AS BIGINT) AS dneg FROM tr), " +
          "j AS (SELECT tok.doc_id, tok.is_pos, " +
          s"${ILog.qlogSqlDuck("(COALESCE(cp, 0) + 1)")} - ${ILog.qlogSqlDuck("(npos + vsz)")} - ${ILog.qlogSqlDuck("(COALESCE(cn, 0) + 1)")} + ${ILog.qlogSqlDuck("(nneg + vsz)")} AS wt, dpos, dneg " +
          "FROM tok LEFT JOIN cl USING (w) CROSS JOIN ms), " +
          "sc AS (SELECT doc_id, any_value(is_pos) AS label, " +
          s"(${ILog.qlogSqlDuck("dpos")} - ${ILog.qlogSqlDuck("dneg")} + SUM(wt)) > 0 AS pred_pos " +
          "FROM j WHERE doc_id % 10 >= 8 GROUP BY doc_id, dpos, dneg) " +
          "SELECT label, pred_pos, CAST(count(*) AS BIGINT) AS n FROM sc GROUP BY 1, 2 ORDER BY 1, 2"
      }),

    // The PERSISTED quality classifier — how the NB filter actually
    // deploys at crawl scale: train ONCE on the curated slice, persist
    // the vocab-bounded class counts + 1-row scalars as model tables
    // (ensureNbModel), and score every batch retrain-free — the scoring
    // plan reads the two model tables and the corpus tokens, with ZERO
    // training aggregates (no countDistinct, no is_pos label anywhere —
    // PlanSpec-locked). All-BIGINT model → exact parquet round-trip, so
    // the oracle is quality_nb's verbatim: the hash match proves
    // persisted-model scoring ≡ inline training ≡ closed form.
    Q("quality_nb_persist",
      (s, d) => {
        import graft.operators.NbClassifier
        val (countsT, scalT) = ensureNbModel(s, d)
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("w"))
        NbClassifier.score(tok, s.table(countsT), s.table(scalT))
          .select(col("doc_id"), (col("doc_id") % 10 >= 8).as("held_out"),
            col("n_tokens"), col("score_fp20"), col("pred_pos"))
          .orderBy("doc_id")
      },
      Some(nbScoreSql)),

    // Classifier CALIBRATION — the reliability diagram behind the
    // confusion matrix: held-out docs scored by the PERSISTED model,
    // binned by fixed-width score band (1.0 fp20 units = 2^20, clamped
    // to ±8 — pure integer map + one hash agg, never an ntile window
    // over the corpus), each band reporting observed positives vs
    // predicted positives. The report that decides a filter's
    // THRESHOLD, not just its accuracy: a well-calibrated band near 0
    // is where threshold tuning moves yield. Truncating division is
    // sign-explicit in the oracle (// floors in newer DuckDB releases —
    // the TESTDATA.md version-defensive rule).
    Q("quality_calibration",
      (s, d) => {
        import graft.operators.NbClassifier
        val (countsT, scalT) = ensureNbModel(s, d)
        val labeled = Tables.documents(s, d)
          .select(col("doc_id"),
            col("source").isin("src0", "src1", "src2", "src3", "src4")
              .as("label"))
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("w"))
        NbClassifier.score(tok, s.table(countsT), s.table(scalT))
          .filter(col("doc_id") % 10 >= 8)
          .join(labeled, Seq("doc_id"))
          .withColumn("bin",
            greatest(lit(-8L), least(lit(8L),
              expr("score_fp20 div 1048576"))))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            sum(when(col("label"), 1L).otherwise(0L)).as("n_pos"),
            sum(when(col("pred_pos"), 1L).otherwise(0L)).as("n_pred_pos"))
          .orderBy("bin")
      },
      Some {
        "WITH tok AS (SELECT doc_id, source IN ('src0','src1','src2','src3','src4') AS is_pos, unnest(string_split(lower(text), ' ')) AS w FROM documents), " +
          "tr AS (SELECT * FROM tok WHERE doc_id % 10 < 8), " +
          "cl AS (SELECT w, CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS cp, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS cn FROM tr GROUP BY w), " +
          "ms AS (SELECT CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS npos, CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS nneg, " +
          "CAST(count(DISTINCT w) AS BIGINT) AS vsz, CAST(count(DISTINCT CASE WHEN is_pos THEN doc_id END) AS BIGINT) AS dpos, CAST(count(DISTINCT CASE WHEN NOT is_pos THEN doc_id END) AS BIGINT) AS dneg FROM tr), " +
          "j AS (SELECT tok.doc_id, tok.is_pos, " +
          s"${ILog.qlogSqlDuck("(COALESCE(cp, 0) + 1)")} - ${ILog.qlogSqlDuck("(npos + vsz)")} - ${ILog.qlogSqlDuck("(COALESCE(cn, 0) + 1)")} + ${ILog.qlogSqlDuck("(nneg + vsz)")} AS wt, dpos, dneg " +
          "FROM tok LEFT JOIN cl USING (w) CROSS JOIN ms), " +
          "sc AS (SELECT doc_id, any_value(is_pos) AS label, " +
          s"CAST(${ILog.qlogSqlDuck("dpos")} - ${ILog.qlogSqlDuck("dneg")} + SUM(wt) AS BIGINT) AS score_fp20 " +
          "FROM j WHERE doc_id % 10 >= 8 GROUP BY doc_id, dpos, dneg), " +
          "b AS (SELECT label, score_fp20 > 0 AS pred_pos, " +
          "GREATEST(CAST(-8 AS BIGINT), LEAST(CAST(8 AS BIGINT), " +
          "CASE WHEN score_fp20 < 0 THEN -((-score_fp20) // 1048576) ELSE score_fp20 // 1048576 END)) AS bin FROM sc) " +
          "SELECT bin, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, " +
          "CAST(SUM(CASE WHEN pred_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos " +
          "FROM b GROUP BY bin ORDER BY bin"
      }),

    // Corpus id-encoding — the "apply the trained tokenizer to every
    // document" step that materializes training input: top-200 vocab
    // (text_vocab's two-phase build — distributed top-k, then a window
    // over ≤200 rows assigns contiguous ids), then one token-keyed
    // left join (vocab is bounded → broadcast) maps every corpus token
    // to its id (0 = UNK), and a doc-keyed sort-within-group rebuilds
    // each document as its id sequence. Two shuffles total at any
    // corpus size: the vocab agg and the per-doc reassembly.
    Q("text_encode_ids",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
        val vocab = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(200)
          .select(col("w"),
            row_number().over(Window.orderBy(col("cnt").desc, col("w")))
              .cast("long").as("tid"))
        tok.join(vocab, Seq("w"), "left")
          .withColumn("tid", coalesce(col("tid"), lit(0L)))
          .groupBy("doc_id")
          .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, tid))), x -> cast(x.tid as string)), ',')")
            .as("ids"),
            count(lit(1)).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("WITH tok AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws))) AS t(i)), " +
        "v AS (SELECT word, rn AS tid FROM (SELECT w AS word, row_number() OVER (ORDER BY count(*) DESC, w) AS rn FROM tok GROUP BY w) WHERE rn <= 200), " +
        "j AS (SELECT doc_id, pos, COALESCE(tid, 0) AS tid FROM tok LEFT JOIN v ON tok.w = v.word) " +
        "SELECT doc_id, string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids, CAST(count(*) AS BIGINT) AS n_tokens " +
        "FROM j GROUP BY doc_id ORDER BY doc_id")),

    // Positional phrase query ([[graft.operators.Postings.phraseMatches]]):
    // the quoted-query consumer of a positional index. The token stream
    // is pruned to the phrase's words before any join; successive words
    // intersect on (doc, start) like rarest-first posting-list merges.
    Q("text_phrase_search",
      (s, d) => graft.operators.Postings
        .phraseMatches(Tables.documents(s, d), "doc_id", "text",
          Seq("table", "part"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"))
        .orderBy("doc_id", "pos"),
      Some("WITH tok AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents), LATERAL unnest(generate_series(1, len(ws))) AS t(i)) " +
        "SELECT a.doc_id, CAST(a.pos AS BIGINT) AS pos FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 " +
        "WHERE a.w = 'table' AND b.w = 'part' ORDER BY 1, 2")),

    // URL/host canonicalization + dedup ([[graft.functions.Urls]]) — the
    // C4/CCNet pre-filter that precedes content dedup. Each doc gets a
    // deterministic MESSY url (scheme-case / www / explicit :80 /
    // trailing-slash / tracking-param / param-order / fragment noise,
    // all functions of doc_id), the REAL regex canonicalizer runs over
    // the string, and docs dedup on the canonical form. The oracle
    // computes the canonical url CLOSED-FORM from the mod classes — it
    // never runs a canonicalizer — so a hash match proves the column
    // pipeline strips exactly the noise and nothing else. Scale:
    // canonicalization is map-side codegen inside the scan; the dedup
    // pays one shuffle on the canonical key (the min-window), same as
    // any exact dedup.
    Q("url_canonical_dedup",
      (s, d) => {
        import graft.functions.Urls
        val m = (k: Int) => col("doc_id") % k
        val track = when(m(3) === 1, "utm_source=feed")
          .when(m(5) === 2, "ref=tw").otherwise("")
        val base = concat(lit("id="), m(9))
        val qs = when(track === "", base)
          .when(m(2) === 0, concat(base, lit("&"), track))
          .otherwise(concat(track, lit("&"), base))
        val url = concat(
          when(m(3) === 0, "http").when(m(3) === 1, "HTTP").otherwise("Http"),
          lit("://"),
          when(m(2) === 0, "WWW.").otherwise(""),
          lit("Site"), m(7), lit(".Example.COM"),
          when(m(4) === 0, ":80").otherwise(""),
          lit("/news/"), m(5), when(m(6) === 0, "/").otherwise(""),
          lit("?"), qs,
          when(m(2) === 1, concat(lit("#s"), m(3))).otherwise(lit("")))
        val canon = Tables.documents(s, d).select(col("doc_id"))
          .withColumn("url", url)
          .withColumn("canonical", Urls.canonicalize(col("url")))
        canon
          .withColumn("is_dup", col("doc_id") >
            min("doc_id").over(Window.partitionBy("canonical")))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, " +
        "(CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' ELSE 'Http' END) || '://' || " +
        "(CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) || 'Site' || (doc_id % 7) || '.Example.COM' || " +
        "(CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END) || '/news/' || (doc_id % 5) || " +
        "(CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) || '?' || " +
        "(CASE WHEN doc_id % 3 = 1 THEN (CASE WHEN doc_id % 2 = 0 THEN 'id=' || (doc_id % 9) || '&utm_source=feed' ELSE 'utm_source=feed&id=' || (doc_id % 9) END) " +
        " WHEN doc_id % 5 = 2 THEN (CASE WHEN doc_id % 2 = 0 THEN 'id=' || (doc_id % 9) || '&ref=tw' ELSE 'ref=tw&id=' || (doc_id % 9) END) " +
        " ELSE 'id=' || (doc_id % 9) END) || " +
        "(CASE WHEN doc_id % 2 = 1 THEN '#s' || (doc_id % 3) ELSE '' END) AS url, " +
        "'http://site' || (doc_id % 7) || '.example.com/news/' || (doc_id % 5) || '?id=' || (doc_id % 9) AS canonical, " +
        "doc_id > MIN(doc_id) OVER (PARTITION BY doc_id % 7, doc_id % 5, doc_id % 9) AS is_dup " +
        "FROM documents ORDER BY doc_id")),

    // Beyond-reference: Punkt-style unsupervised abbreviation learning
    // (Kiss & Strunk 2006, type stage) over the derived
    // sentence-structured corpus — closes the C6 sentence-splitting
    // waiver direction with a LEARNED model instead of a closed-form
    // regex. Vocabulary-keyed aggregation + 1-row scalar broadcast:
    // type-space state, scale-free in documents.
    Q("text_punkt_train",
      (s, d) => graft.operators.Punkt.trainAbbrevs(
        graft.operators.Punkt.derivedTokens(
          Tables.documents(s, d).select("doc_id", "text")))
        .orderBy("ty"),
      Some(s"WITH $punktCtes SELECT ty, cnt_total, cnt_period, llr_fp20, score_fp20, is_abbrev FROM pabbr ORDER BY ty")),

    // Sentence segmentation with the learned model: boundary = period +
    // capital successor + NOT a learned abbreviation. The abbrev join
    // broadcasts (vocabulary-bounded); windows partition by doc_id.
    Q("text_sentences",
      (s, d) => {
        import graft.operators.Punkt
        // materialized once per invocation: the trainer and the segmenter
        // each re-evaluate the derived token stream (posexplode + two
        // doc_id windows) — checkpointing halves the token-stream passes;
        // recomputed from parquet on every invocation, nothing memoized
        val toks = Punkt.derivedTokens(
          Tables.documents(s, d).select("doc_id", "text")).localCheckpoint()
        Punkt.sentenceStats(toks,
          Punkt.trainAbbrevs(toks).filter(col("is_abbrev")))
          .orderBy("doc_id")
      },
      Some(punktSentSql)),

    // Token-stage frequent-sentence-starter model (the Kiss & Strunk
    // refinement): Dunning llr of "starts sentences at rate >= 1/4" vs
    // the base rate, trained on UNAMBIGUOUS boundaries — which requires
    // the learned abbreviation set first (stage composition).
    Q("text_punkt_starters",
      (s, d) => {
        import graft.operators.Punkt
        // one materialization feeds both trainers (the text_sentences note)
        val toks = Punkt.derivedTokens(
          Tables.documents(s, d).select("doc_id", "text")).localCheckpoint()
        Punkt.trainStarters(toks,
          Punkt.trainAbbrevs(toks).filter(col("is_abbrev")))
          .orderBy("ty")
      },
      Some(s"WITH $punktCtes SELECT ty, cnt_total, cnt_start, llr_fp20, is_starter FROM pstart ORDER BY ty")),

    // Full segmentation: abbreviation AND starter models — a learned
    // starter re-opens the boundary after an abbreviation.
    Q("text_sentences_full",
      (s, d) => {
        import graft.operators.Punkt
        // one materialization feeds both trainers AND the segmenter —
        // three token-stream passes become one (the text_sentences note)
        val toks = Punkt.derivedTokens(
          Tables.documents(s, d).select("doc_id", "text")).localCheckpoint()
        val ab = Punkt.trainAbbrevs(toks).filter(col("is_abbrev"))
        Punkt.sentenceStatsFull(toks, ab,
          Punkt.trainStarters(toks, ab).filter(col("is_starter")))
          .orderBy("doc_id")
      },
      Some(s"WITH $punktCtes SELECT doc_id, n_tokens, n_sentences, max_sent_tokens FROM psent2 ORDER BY doc_id")),

    // Same segmentation against the PERSISTED model table — the shared
    // oracle hash-pins persisted ≡ inline (quality_nb_persist pattern).
    Q("text_punkt_persist",
      (s, d) => {
        import graft.operators.Punkt
        val mt = ensurePunktModel(s, d)
        Punkt.sentenceStats(
          Punkt.derivedTokens(Tables.documents(s, d).select("doc_id", "text")),
          s.table(mt).filter(col("is_abbrev")))
          .orderBy("doc_id")
      },
      Some(punktSentSql)))


  val all: Seq[Q] = textual
}
