package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Smoke: the driver contract — entry() has rows; every catalog query
  * executes at sf0.001; every oracle key exists in queries.
  */
class CatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("every catalog query executes at sf0.001") {
    val failures = Catalog.all.flatMap { q =>
      try { q.run(spark, sf).count(); None }
      catch { case e: Throwable => Some(q.name -> e.getMessage.take(120)) }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("rows-only queries produce rows at sf0.001") {
    Seq("dedup_simhash", "sim_lsh_ann").foreach { name =>
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, name)
    }
  }

  test("every query has an oracle (the full-coverage invariant)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("query count matches docs (README / COVERAGE.md cite this number)") {
    // Update README.md and COVERAGE.md when this changes — the docs cite
    // this spec as the authoritative count so they can't silently drift.
    assert(Catalog.all.size === 263, s"catalog has ${Catalog.all.size} queries")
  }

  test("catalog names are unique (a dup would silently shadow in the Map)") {
    val names = Catalog.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog names: $dups")
  }
}
