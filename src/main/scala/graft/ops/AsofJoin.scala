package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — an operator Spark's relational surface lacks.
  * For each left row, attach the closest right row at-or-before (backward)
  * or at-or-after (forward) its timestamp, per join key: the canonical
  * "state at event time" lookup (price as of trade time, last profile
  * update before a click, ...).
  *
  * Implementation is the single-shuffle union-scan, NOT a range join:
  * both sides are tagged and unioned, clustered by key, and sorted by
  * (time, side); `last(_, ignoreNulls)` over the running frame carries the
  * most recent right payload onto each left row. Cost is one shuffle + one
  * in-partition sort — the same class as a sort-merge join — with NO
  * candidate-pair expansion, so it scales to 100 TB the way an
  * interval/range formulation (every left × every in-range right) cannot.
  * Ties on (key, time): right rows sort before left rows, so an exactly
  * simultaneous right row IS visible to the left row (inclusive bound), and
  * among equal-time right rows the payload struct's ordering picks a
  * deterministic winner (callers wanting a specific winner dedup first —
  * see the `asof_*` queries).
  */
object AsofJoin {

  // the union-scan's scratch columns, named ONCE so the clash guard and the
  // implementation body can never drift apart (a scratch column added to
  // the body but not the guard would silently shadow a caller's column)
  private val T = "_t"
  private val Side = "_side"
  private val L = "_l"
  private val R = "_r"
  private val M = "_m"
  private val Reserved = Set(T, Side, L, R, M)

  /** @param rightPayload right columns to attach, renamed `prefix`+name.
    * @param forward false = latest right at-or-before (backward, the
    *   default direction); true = earliest right at-or-after. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      prefix: String = "matched_", forward: Boolean = false): DataFrame = {
    // the union-scan introduces scratch columns; a caller frame already
    // using one of these names would be silently shadowed in the tagged
    // projection rather than erroring
    val clash = (left.columns ++ right.columns).filter(Reserved).distinct
    require(clash.isEmpty,
      s"asof: input columns ${clash.mkString(", ")} collide with the " +
        s"operator's scratch names (${Reserved.mkString(", ")}) — " +
        "rename them first")
    require(keys.nonEmpty,
      "asof: need at least one join key (a keyless as-of would funnel both " +
        "sides through one global window partition)")
    val leftCols = left.columns.toSeq
    val keyCols = keys.map(col)
    val lStruct = struct(leftCols.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct.as(L)).schema(L).dataType
    val rType = right.select(rStruct.as(R)).schema(R).dataType
    val lSide = left.select(
      keyCols :+ col(leftTime).as(T) :+ lit(1).as(Side) :+
        lStruct.as(L) :+ lit(null).cast(rType).as(R): _*)
    val rSide = right.select(
      keyCols :+ col(rightTime).as(T) :+ lit(0).as(Side) :+
        lit(null).cast(lType).as(L) :+ rStruct.as(R): _*)
    // forward = backward on reversed time: scan descending, so "last right
    // seen" is the smallest right time >= the left time. _side stays ASC in
    // both directions (right first at equal times = inclusive bound); _r in
    // the sort makes equal-time right rows deterministically ordered.
    val timeOrder =
      if (forward) Seq(col(T).desc, col(Side).asc, col(R).asc)
      else Seq(col(T).asc, col(Side).asc, col(R).asc)
    val w = Window.partitionBy(keyCols: _*).orderBy(timeOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .withColumn(M, last(col(R), ignoreNulls = true).over(w))
      .where(col(Side) === 1)
      .select(leftCols.map(c => col(s"$L.$c").as(c)) ++
        rightPayload.map(p => col(s"$M.$p").as(prefix + p)): _*)
  }
}
