package graft.operators

import graft.SparkSpec

/** MERGE-as-a-plan semantics. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("updates replace by key, unmatched base survives, new keys insert") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "name", "v")
    val updates = Seq((2L, "B", 99), (4L, "d", 40)).toDF("k", "name", "v")
    val got = Upsert(base, updates, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got === Array(
      (1L, "a", 10),   // untouched
      (2L, "B", 99),   // replaced wholesale
      (3L, "c", 30),   // untouched
      (4L, "d", 40)))  // inserted
  }

  test("upsert is idempotent: applying the same updates twice is a no-op") {
    val base = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "name", "v")
    val updates = Seq((2L, "B", 99)).toDF("k", "name", "v")
    val once = Upsert(base, updates, "k")
    val twice = Upsert(once, updates, "k")
    assert(once.orderBy("k").collect() === twice.orderBy("k").collect())
  }

  test("schema mismatch is rejected") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val bad = Seq((1L, 5)).toDF("k", "v")
    intercept[IllegalArgumentException](Upsert(base, bad, "k"))
  }

  test("applyChanges: tombstones delete, delete wins over same-batch upsert") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val changes = Seq(
      (2L, "B", false),  // update
      (3L, "dead", true), // delete existing
      (3L, "zombie", false), // same-batch upsert for a deleted key → delete wins
      (4L, "d", false),  // insert
      (9L, "ghost", true)) // delete absent key → no-op
      .toDF("k", "name", "is_delete")
    val got = Upsert.applyChanges(base, changes, "k", "is_delete")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got === Array((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("null-valued update columns still replace (whole-row semantics)") {
    val base = Seq((1L, Some("a"))).toDF("k", "name")
    val updates = Seq((1L, Option.empty[String])).toDF("k", "name")
    val got = Upsert(base, updates, "k").collect().head
    assert(got.isNullAt(1))
  }

  test("latestByKey collapses a multi-version feed deterministically") {
    val feed = Seq(
      (1L, 10L, "v1"), (1L, 30L, "v3"), (1L, 20L, "v2"),
      (2L, 5L, "x"), (2L, 5L, "y")) // tie on ts → later remaining cols win
      .toDF("k", "ts", "name")
    val got = Upsert.latestByKey(feed, "k", "ts")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got === Array((1L, "v3"), (2L, "y")))
    // the full-outer fan-out the raw feed would cause is gone
    val base = Seq((1L, 0L, "base")).toDF("k", "ts", "name")
    assert(Upsert(base, Upsert.latestByKey(feed, "k", "ts"), "k").count() === 2)
  }

  test("readAt reconstructs every version of a versioned store (time travel)") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val ledger = Seq(
      // version 1: update 2, delete 3
      (2L, "b2", false, 1L), (3L, null.asInstanceOf[String], true, 1L),
      // version 2: re-admit 3 with new content, delete 1, insert 4
      (3L, "c2", false, 2L), (1L, null.asInstanceOf[String], true, 2L),
      (4L, "d", false, 2L))
      .toDF("k", "name", "is_delete", "version")
    def at(v: Long) = Upsert.readAt(base, ledger, "k", "is_delete", "version", v)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    // read-at-0 ≡ the base snapshot
    assert(at(0L) === Array((1L, "a"), (2L, "b"), (3L, "c")))
    // intermediate version: 3 is deleted, 2 carries v1's content
    assert(at(1L) === Array((1L, "a"), (2L, "b2")))
    // delete-then-re-upsert across versions resurrects with new content
    assert(at(2L) === Array((2L, "b2"), (3L, "c2"), (4L, "d")))
    // read-at-latest ≡ the current store (the changes applied in order)
    val v1 = Upsert.applyChanges(base,
      ledger.filter($"version" === 1L).drop("version"), "k", "is_delete")
    val cur = Upsert.applyChanges(v1,
      ledger.filter($"version" === 2L).drop("version"), "k", "is_delete")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(at(2L) === cur)
  }

  test("readAt property: one-window reconstruction ≡ batch-by-batch replay (generated ledgers)") {
    // the operator's entire claim is that latest-change-≤-v-per-key
    // equals folding applyChanges version by version — check it against
    // the replay reference on generated multi-version ledgers (fixed
    // seeds, deterministic CI)
    import org.scalacheck.{Gen, rng}
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, rng.Seed(seed))
    val ledgerGen: Gen[List[(Long, String, Boolean, Long)]] =
      Gen.listOfN(60, Gen.zip(
        Gen.chooseNum(0L, 12L),                  // key with collisions
        Gen.alphaLowerStr.map(_.take(4)),        // payload
        Gen.prob(0.3),                           // tombstone?
        Gen.chooseNum(1L, 5L)))                  // version
    (1 to 4).foreach { seed =>
      val base = Seq((0L, "b0"), (3L, "b3"), (7L, "b7"), (11L, "b11"))
        .toDF("k", "name")
      // one change per (key, version): a changeset is a keyed dict —
      // collapse the raw feed deterministically first
      val raw = sample(ledgerGen, seed).distinct
        .groupBy(r => (r._1, r._4)).map(_._2.maxBy(r => (r._2, r._3)))
        .toSeq
      val ledger = raw.toDF("k", "name", "is_delete", "version")
      (0L to 5L).foreach { v =>
        val got = Upsert.readAt(base, ledger, "k", "is_delete", "version", v)
          .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        val replay = (1L to v).foldLeft(base) { (acc, ver) =>
          Upsert.applyChanges(acc,
            ledger.filter($"version" === ver).drop("version"), "k", "is_delete")
        }.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(got === replay, s"seed=$seed v=$v")
      }
    }
  }

  test("checkpointAt: every version ≥ cutoff reconstructs exactly from the compacted pair") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val ledger = Seq(
      (2L, "b2", false, 1L), (3L, null.asInstanceOf[String], true, 1L),
      (3L, "c2", false, 2L), (1L, null.asInstanceOf[String], true, 2L),
      (4L, "d", false, 2L),
      (2L, null.asInstanceOf[String], true, 3L))
      .toDF("k", "name", "is_delete", "version")
    val (ckpt, tail) =
      Upsert.checkpointAt(base, ledger, "k", "is_delete", "version", 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // the checkpoint IS the state at the cutoff
    assert(rows(ckpt) ===
      rows(Upsert.readAt(base, ledger, "k", "is_delete", "version", 1L)))
    // the ledger tail kept only post-cutoff versions — the folded slice
    // (and the old base) are reclaimable
    assert(tail.agg(org.apache.spark.sql.functions.min("version"))
      .head().getLong(0) > 1L)
    assert(tail.count() === 4L)
    // the retention contract: every v ≥ cutoff reads identically from
    // the compacted pair; v < cutoff is unreadable by design
    (1L to 3L).foreach { v =>
      assert(
        rows(Upsert.readAt(ckpt, tail, "k", "is_delete", "version", v)) ===
          rows(Upsert.readAt(base, ledger, "k", "is_delete", "version", v)),
        s"v=$v")
    }
  }

  test("latestByKey tolerates non-orderable columns (maps skip the tie-break)") {
    // a map column in the feed must not fail the Window's orderBy
    // analysis when orderCol alone is decisive
    val feed = Seq(
      (1L, 10L, Map("a" -> 1)), (1L, 30L, Map("b" -> 2)),
      (2L, 5L, Map("c" -> 3)))
      .toDF("k", "ts", "props")
    val got = Upsert.latestByKey(feed, "k", "ts")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Array((1L, 30L), (2L, 5L)))
  }
}
