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
