package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal join family [SURVEY §2.3 ext — absent in the reference,
  * which has only equi-joins via foreign keys]. Public API form of the
  * shapes the battery queries exercise inline (j5), so a library user
  * gets them as operators rather than recipes.
  *
  * Scale posture: the as-of join is the union+window form — both sides
  * shuffle ONCE on (keys) and sort by time inside each partition; no
  * range-condition join (which Spark would plan as a broadcast nested
  * loop or cartesian) ever appears, so the shape survives arbitrarily
  * large sides as long as a single key-partition's rows fit a task —
  * the same contract as any window query, with key salting as the
  * documented escape hatch for pathological single-key skew. */
object Joins {

  private def nullAs(name: String, schema: StructType): Column =
    lit(null).cast(schema(name).dataType).as(name)

  /** Backward as-of join: attach to each `left` row the payload of the
    * single LATEST `right` row with `rightTime` <= `leftTime`, matched
    * within equal `keys` (null payloads where no right row qualifies —
    * left rows are always preserved).
    *
    * Mechanics: tag both sides, union by name, and run
    * `last(payload_struct, ignoreNulls)` over a running
    * (unbounded-preceding) window ordered by (time, is_point) per key —
    * right rows sort BEFORE left rows at equal time, so an anchor
    * exactly at the left timestamp is eligible (<=, not <). Every
    * `right` column that is neither a key nor `rightTime` is carried as
    * payload. All payload columns ride in ONE struct, so the join is
    * ROW-ATOMIC: the attached values always come from the same right
    * row, and a right row whose payload value is legitimately NULL
    * still wins the window (the struct wrapper is non-null) and
    * delivers its NULL — per-column `last(ignoreNulls)` would instead
    * skip it and silently substitute an older anchor's value.
    *
    * Determinism: among right rows sharing (keys, time), the LAST row
    * under `extraOrder` wins — and it wins WHOLE (row atomicity above).
    * Among left rows the payload is order-independent (their struct
    * slot is null), but pass the left's unique id in `extraOrder` when
    * downstream consumers need a fully deterministic window order (the
    * battery's j5 does). If `right` can hold duplicate (keys, time)
    * rows, supply an `extraOrder` that totally orders them — otherwise
    * the surviving payload row is partitioning-dependent.
    *
    * `leftTime`/`rightTime` may share a name; keys must not contain
    * either time column. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               extraOrder: Seq[Column] = Nil): DataFrame = {
    require(!keys.contains(leftTime) && !keys.contains(rightTime),
      s"time columns ($leftTime, $rightTime) must not be join keys ($keys)")
    val leftOnly = left.columns.toSeq.diff(keys)
    val payloads = right.columns.toSeq.diff(keys :+ rightTime)
    require(payloads.nonEmpty, "right side carries no payload columns")
    require(leftOnly.intersect(payloads).isEmpty,
      s"left/right column name collision: ${leftOnly.intersect(payloads)}")
    // one nullable struct carries the whole right payload row: non-null
    // iff the row IS a right row, so last(ignoreNulls) means "latest
    // qualifying anchor ROW", never "latest non-null value per column"
    val plType = StructType(payloads.map(p => right.schema(p).copy(nullable = true)))
    val lTagged = left.select(
      keys.map(col) ++ leftOnly.map(col) ++ Seq(col(leftTime).as("__t")) ++
        Seq(lit(null).cast(plType).as("__pl"), lit(1).as("__is_point")): _*)
    val rTagged = right.select(
      keys.map(col) ++ leftOnly.map(c => nullAs(c, left.schema)) ++
        Seq(col(rightTime).as("__t"),
          struct(payloads.map(col): _*).as("__pl"),
          lit(0).as("__is_point")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__is_point").asc +: extraOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__pl", last(col("__pl"), ignoreNulls = true).over(w))
      .filter(col("__is_point") === 1)
      .select(keys.map(col) ++ leftOnly.map(col) ++
        payloads.map(p => col("__pl").getField(p).as(p)): _*)
  }

  /** Point-in-interval (range) join via coarse bins: each interval
    * EXPLODES to the bins it covers (`binsOf(start, end)` — an array
    * expression the caller shapes to the domain: month bins for dates,
    * fixed-width buckets for numerics), each point maps to its single
    * bin (`binOf`), candidates come from the bin EQUI-join, and the
    * exact half-open predicate `start <= point < end` refines them.
    *
    * Why: a naive range join is a cross product + filter (Spark plans
    * the inequality condition as broadcast-nested-loop or cartesian).
    * Here candidate count is |points| × (intervals sharing the point's
    * bin) — proportional to temporal/spatial locality, never
    * |points|·|intervals|. `broadcastIntervals` (default) is right
    * whenever the interval set is dimension-sized; set it false to
    * shuffle both sides on the bin instead.
    *
    * Contract: `binsOf` must cover every bin the interval's half-open
    * range touches, and `binOf(p)` must land in one of them whenever
    * start <= p < end — bins may overshoot (the refine discards), never
    * undershoot. Column names must be disjoint across the two inputs
    * (points keep their name-space; interval columns are carried). */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          pointCol: String, startCol: String, endCol: String,
                          binOf: Column => Column,
                          binsOf: (Column, Column) => Column,
                          broadcastIntervals: Boolean = true): DataFrame = {
    require(points.columns.intersect(intervals.columns).isEmpty,
      s"column collision: ${points.columns.toSeq.intersect(intervals.columns.toSeq)}")
    val binned = intervals.withColumn("__bin",
      explode(binsOf(col(startCol), col(endCol))))
    val side = if (broadcastIntervals) broadcast(binned) else binned
    points.withColumn("__bin", binOf(col(pointCol)))
      .join(side, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join — [[pointInIntervalJoin]]'s shape
    * with both sides spanning ranges: each side explodes to its bins,
    * candidate pairs come from the bin equi-join, pairs dedup
    * (`distinct` over the carried columns — a pair sharing k bins
    * appears k times before it) and then the exact strict-overlap
    * predicate `aStart < bEnd AND bStart < aEnd` (half-open ranges)
    * refines. Candidates ∝ locality, never |A|·|B|. Both inputs' column
    * sets must be disjoint and must identify their rows (the dedup is
    * by value); keep an id column on each side. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          aStart: String, aEnd: String,
                          bStart: String, bEnd: String,
                          binsOf: (Column, Column) => Column,
                          broadcastB: Boolean = true): DataFrame = {
    require(a.columns.intersect(b.columns).isEmpty,
      s"column collision: ${a.columns.toSeq.intersect(b.columns.toSeq)}")
    val ab = a.withColumn("__bin", explode(binsOf(col(aStart), col(aEnd))))
    val bb = b.withColumn("__bin", explode(binsOf(col(bStart), col(bEnd))))
    ab.join(if (broadcastB) broadcast(bb) else bb, Seq("__bin"))
      .drop("__bin")
      .distinct()
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
  }
}
