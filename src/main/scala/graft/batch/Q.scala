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
    * `Decimal` objects).
    *
    * VALID ONLY when the group's accumulated fp error is far below the 4-dp
    * boundary width (small groups of ~unit-magnitude values). For large
    * groups or large magnitudes use [[exactSum]]/[[exactAvg]]: round-after-
    * sum broke at sf0.1 on q5 (6e9 revenue over 600k rows — double ulp at
    * 6e9 is ~1e-6, so partial-sum ORDER noise crosses 4-dp boundaries). */
  def dec4(c: Column): Column = round(c, 4)

  /** SQL twin of [[dec4]] for the DuckDB side. */
  def sqlDec4(expr: String): String = s"round($expr, 4)"

  /** Order-free float SUM: quantize each ADDEND to 6 dp (one deterministic
    * fp op per row), sum EXACTLY as DECIMAL(38,6) (integer arithmetic;
    * partial-agg order cannot matter), return DOUBLE.
    *
    * Why 6 dp: the quantization must sit BELOW the data's intrinsic decimal
    * precision. Prices are 2-dp decimals, so 2/3-factor products are exact
    * at ≤6 dp — a 4-dp quantization puts ~1% of rows on an exact .xxxx50
    * TIE, where Spark (BigDecimal shortest-repr, HALF_UP) and DuckDB
    * (binary-double rounding) disagree (observed: q1 sum_charge). At 6 dp
    * the addend double is within ~1e-13 of a 6-dp decimal — never within
    * 5e-7 of a tie — and full-precision (non-decimal) data hits a 6-dp tie
    * with probability ~ulp/5e-7 ≈ 0. Both engines therefore round every
    * addend to the SAME decimal, and the decimal sum is exact. */
  def exactSum(e: String): Column =
    expr(s"cast(sum(cast(round($e, 6) as decimal(38,6))) as double)")

  /** SQL twin of [[exactSum]]. */
  def sqlExactSum(e: String): String =
    s"CAST(sum(CAST(round($e, 6) AS DECIMAL(38,6))) AS DOUBLE)"

  /** Order-free float AVG: [[exactSum]] / COUNT — one double division on an
    * exact numerator. */
  def exactAvg(e: String): Column =
    expr(s"cast(sum(cast(round($e, 6) as decimal(38,6))) as double) / count(*)")

  /** SQL twin of [[exactAvg]]. */
  def sqlExactAvg(e: String): String =
    s"(CAST(sum(CAST(round($e, 6) AS DECIMAL(38,6))) AS DOUBLE) / count(*))"
}
