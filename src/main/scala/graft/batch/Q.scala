package graft.batch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One correctness-gated query: a Spark DataFrame program plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet.
  *
  * Conventions that make the hash-compare deterministic:
  *   - every float aggregate is `dec4(...)` (round 4 → DECIMAL(18,4)) on BOTH
  *     sides, so double summation-order noise can't flip a bit;
  *   - every query ends in a total ORDER BY over its output columns;
  *   - aggregate/computed columns carry identical aliases on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  /** Rows-only checked query (no SQL-expressible oracle). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Deterministic float: round to 4 dp (both engines then hold the nearest
    * double to the same 4-dp decimal — bitwise-identical, and DOUBLE on both
    * sides so the pandas-level compare sees matching dtypes; DECIMAL would
    * come back from DuckDB's `.df()` as float64 but from Spark parquet as
    * `Decimal` objects). */
  def dec4(c: Column): Column = round(c, 4)

  /** SQL twin of [[dec4]] for the DuckDB side. */
  def sqlDec4(expr: String): String = s"round($expr, 4)"
}
