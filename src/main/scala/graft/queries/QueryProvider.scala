package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query plus (optionally) an equivalent ANSI-SQL oracle
  * that DuckDB can run against the same parquet tables.
  *
  * Conventions (driver contract, see SparkEntry):
  *  - column names in the Spark result and the oracle SQL must match;
  *  - every query ends in a deterministic ORDER BY on a unique key so the
  *    written parquet and the oracle result sort identically;
  *  - floating aggregates are rounded on BOTH sides so double summation
  *    order cannot flip the hash.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the per-round Bench headline set */
    bench: Boolean = false,
    /** include in the driver's correctness gate (SparkEntry.queries).
      * Set false for queries that are verifiable only in-process (e.g.
      * an iterative float solver whose internals no SQL engine can
      * replay) — they stay first-class in the bench/stress tiers via
      * SparkEntry.allQueries, but don't surface as a permanent
      * `no_oracle` row in every driver correctness artifact. */
    gate: Boolean = true)

trait QueryProvider {
  def all: Seq[Q]
}
