package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, the single latest right
  * row with the same key and right.ts <= left.ts — the lookup a crawl/event
  * pipeline needs for "state as of this fetch" questions (latest snapshot
  * before a fetch, latest click before an error, latest robots before a
  * request).
  *
  * Spark has no native as-of operator. The two obvious encodings both fail
  * at scale: an inequality (theta) join explodes to O(|L|·|R|) candidate
  * pairs per key before its per-left max, and a correlated subquery
  * re-scans the right side per left row. The shape that survives 100 TB is
  * a SINGLE sorted pass: tag both sides, union, and run one last-non-null
  * window per key ordered by (ts, side) — right rows sort before left rows
  * at equal ts, so "at-or-before" is inclusive. One shuffle on the key,
  * O(|L|+|R|) rows through it, no pair blow-up, per-key cost bounded by the
  * sort (never a product). This is the standard streaming/kdb as-of
  * algorithm expressed as a Spark window.
  */
object AsOf {

  /** Left as-of join.
    *
    * The matched right row is carried as ONE struct through a single
    * `last(_, ignoreNulls)` window — never per-column carries, which could
    * stitch values from different right rows when some carried columns are
    * null. Ties inside the right side (two right rows at the same key+ts)
    * resolve to the row whose carried struct sorts last — deterministic at
    * any parallelism.
    *
    * @param left      left rows; every column is preserved
    * @param right     right rows
    * @param key       equi-join key column name (present on both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right columns to carry, as (rightName -> outputName);
    *                  all null when no right row is at-or-before
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carry = rightCols.toSeq.sortBy(_._2)
    // side=0 sorts right rows BEFORE left rows at equal ts → inclusive
    // at-or-before
    // a right row with a NULL timestamp is at-or-before nothing — and asc
    // ordering sorts nulls FIRST, so left un-dropped it would become the
    // "match" for every left row that should have none
    val rTagged = right.filter(col(rightTs).isNotNull)
      .select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"),
      struct(carry.map { case (src, dst) => col(src).as(dst) }: _*).as("_rrow"))
    val lTagged = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"),
      struct(leftCols.map(left(_)): _*).as("_lrow"))
    val unioned = rTagged
      .withColumn("_lrow", lit(null).cast(lTagged.schema("_lrow").dataType))
      .unionByName(lTagged.withColumn("_rrow",
        lit(null).cast(rTagged.schema("_rrow").dataType)))
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"), col("_rrow"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_lrow").getField(c).as(c)) ++
        carry.map { case (_, dst) => col("_asof").getField(dst).as(dst) }: _*)
  }
}
