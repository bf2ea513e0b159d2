package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Text, Vectors}

/** One driver-verifiable query per operator in SURVEY.md §2 (names carry the
  * operator ids), plus the beyond-reference training-data-pipeline operators
  * (dedup / similarity / text analysis / multimodal plumbing).
  *
  * Every query is written twice: once as a Spark DataFrame plan and once as
  * DuckDB SQL for the driver's oracle diff. Cross-engine determinism rules
  * used throughout:
  *
  *  - every result has a total-order `ORDER BY` (ties broken by a key);
  *  - no raw timestamps in outputs (formatted to strings; engines disagree
  *    on ns-precision and tz-awareness in parquet round-trips);
  *  - no FP aggregation of non-integer-valued doubles: money-like sums go
  *    through the "cents trick" `floor(x*100 + 0.5)` — identical IEEE ops in
  *    both engines, then exact integer sums;
  *  - per-row double arithmetic (a fixed expression tree of IEEE ops) is
  *    deterministic and allowed;
  *  - FP thresholds are chosen inside empirically-verified wide gaps of the
  *    data's value distribution, so 1e-12 summation noise cannot flip a row.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])


object Catalog {

  /** Per-family query files (same package), composed in the original
    * registration order. CatalogSpec pins the total count and name
    * uniqueness, so a drift here fails the build.
    */
  val all: Seq[Q] =
    CoreRelational.all ++ AggScalarQueries.all ++ TextMultimodalQueries.all ++
      DedupCoreQueries.all ++ VectorQueries.all ++ ClusterPipelineQueries.all ++
      StreamingQueries.all ++ TrainingQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
