package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-style invariants over generated data (SURVEY §5 test plan #3):
  * top-k ≡ full-sort prefix, pagination partitions exactly, dedup
  * invariants, union-all cardinality, and the cents-trick determinism
  * assumption. Uses ScalaCheck generators with fixed seeds (deterministic
  * CI) driven through Spark plans.
  */
class PropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(300, Gen.zip(
      Gen.chooseNum(0L, 80L),       // key with collisions
      Gen.chooseNum(-1000L, 1000L), // rank value, ties likely
      Gen.chooseNum(-1e6, 1e6)))    // arbitrary double

  test("top-k via orderBy/limit equals the prefix of the full sort") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val data = sample(rowsGen, seed)
      val df = data.toDF("id", "rank", "v")
      val topk = df.orderBy(desc("rank"), asc("id"), asc("v")).limit(17)
        .collect().map(_.toSeq).toSeq
      val full = df.orderBy(desc("rank"), asc("id"), asc("v"))
        .collect().map(_.toSeq).toSeq.take(17)
      assert(topk === full, s"seed=$seed")
    }
  }

  test("pagination partitions the ordered result: no gaps, no overlap") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    (1 to 3).foreach { seed =>
      val df = sample(rowsGen, seed + 10).toDF("id", "rank", "v")
      val w = Window.orderBy(desc("rank"), asc("id"), asc("v"))
      val numbered = df.withColumn("rn", row_number().over(w))
      val pageSize = 23
      val pages = (1 to (300 + pageSize - 1) / pageSize).flatMap { p =>
        numbered.filter(col("rn").between((p - 1) * pageSize + 1, p * pageSize))
          .orderBy("rn").collect().map(_.getLong(0))
      }
      val full = numbered.orderBy("rn").collect().map(_.getLong(0)).toSeq
      assert(pages === full, s"seed=$seed")
    }
  }

  test("dedup: survivor count equals distinct key count; keys preserved") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val df = sample(rowsGen, seed + 20).toDF("id", "rank", "v")
      val deduped = df.dropDuplicates("id")
      assert(deduped.count() === df.select("id").distinct().count(), s"seed=$seed")
      assert(deduped.select("id").distinct().count() === deduped.count(), s"seed=$seed")
    }
  }

  test("union-all cardinality is additive; distinct union bounded by sum") {
    import spark.implicits._
    val df = sample(rowsGen, 42).toDF("id", "rank", "v")
    val a = df.filter(col("rank") > 0)
    val b = df.filter(col("v") > 0)
    assert(a.unionByName(b).count() === a.count() + b.count())
    assert(a.select("id").union(b.select("id")).distinct().count()
      <= a.count() + b.count())
  }

  test("cents trick: Spark floor(x*100+0.5) equals JVM arithmetic bit-for-bit") {
    import spark.implicits._
    val xs = sample(Gen.listOfN(2000, Gen.chooseNum(-1e7, 1e7)), 7)
    val sparkCents = xs.toDF("x")
      .select(floor(col("x") * 100 + lit(0.5)).as("c"))
      .collect().map(_.getLong(0)).toSeq
    val jvmCents = xs.map(x => math.floor(x * 100 + 0.5).toLong)
    assert(sparkCents === jvmCents)
  }

  test("chunking with stride == size losslessly reconstructs every document") {
    import spark.implicits._
    val words = Gen.listOfN(97, Gen.oneOf("a", "bb", "ccc", "dddd", "x1"))
    (1 to 3).foreach { seed =>
      val ws = sample(words, seed + 40)
      val df = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
      val rebuilt = graft.operators.Chunk
        .chunkTokens(df, "doc_id", "text", size = 10, stride = 10)
        .orderBy("chunk_id").collect().map(_.getString(2))
        .mkString(" ")
      assert(rebuilt === ws.mkString(" "), s"seed=$seed")
    }
  }

  test("sampling monotonicity: for any rates r1 <= r2, sample(r1) ⊆ sample(r2)") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val rates = Gen.listOfN(4, Gen.chooseNum(0.0, 1.0))
    (1 to 3).foreach { seed =>
      val rs = sample(rates, seed + 50).sorted
      val sets = rs.map(r => graft.operators.Sampling.bernoulli(df, "id", r)
        .collect().map(_.getLong(0)).toSet)
      sets.sliding(2).foreach {
        case Seq(lo, hi) => assert(lo.subsetOf(hi), s"seed=$seed rates=$rs")
        case _ =>
      }
    }
  }

  test("splitByGroup partitions: every row exactly one split, function of group only") {
    import spark.implicits._
    val rows = Gen.listOfN(300, Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(0L, 40L)))
    (1 to 3).foreach { seed =>
      val df = sample(rows, seed + 60).toDF("id", "grp")
      val s = graft.operators.Sampling.splitByGroup(df, "grp",
        Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      assert(s.count() === df.count(), s"seed=$seed")
      val multi = s.groupBy("grp").agg(countDistinct("split").as("k"))
        .filter(col("k") > 1).count()
      assert(multi === 0, s"seed=$seed")
    }
  }

  test("upsert algebra: upsert(b, u) has keys(b) ∪ keys(u); u rows win") {
    import spark.implicits._
    val rows = Gen.listOfN(80, Gen.zip(Gen.chooseNum(0L, 60L), Gen.chooseNum(-99L, 99L)))
    (1 to 3).foreach { seed =>
      val b = sample(rows, seed + 70).distinctBy(_._1).toDF("k", "v")
      val u = sample(rows, seed + 170).distinctBy(_._1).toDF("k", "v")
      val merged = graft.operators.Upsert(b, u, "k").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bm = b.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val um = u.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(merged === bm ++ um, s"seed=$seed")
    }
  }

  test("minhash signature is a pure function of the token multiset order") {
    import spark.implicits._
    val words = Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    (1 to 3).foreach { seed =>
      val ws = sample(words, seed + 30)
      val df = Seq((1L, ws.mkString(" ")), (2L, ws.mkString(" "))).toDF("doc_id", "text")
      val sig = graft.operators.Dedup.minhashSignatures(df, "doc_id", "text", 4)
        .collect().map(r => (1 to 4).map(r.getString)).distinct
      assert(sig.length === 1, s"seed=$seed") // identical docs → identical signature
    }
  }
}
