package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-STORE consistent cuts — the stretch form of the r16 verdict's
  * atomicity note: each [[AtomicPublish]] store (the warehouse's
  * maintained views, the ANN index, the retrieval index) commits
  * atomically and exactly-once ON ITS OWN, but nothing relates their
  * versions, so a reader resolving two stores independently can
  * observe the warehouse at batch N beside the index at batch N−1.
  *
  * The fix is the catalog pattern (Iceberg's REST-catalog multi-table
  * commit, a lakehouse metastore's transaction log): a COORDINATOR
  * root — itself a plain [[AtomicPublish]] store — whose one tiny
  * table records a CUT, `(store, version)` for every member. One
  * committed coordinator version IS one consistent cross-store
  * snapshot: readers resolve the cut once ([[currentCut]] /
  * [[cutAt]]) and pin every member read to its recorded version
  * (the members' version dirs are immutable and vacuum-protected by
  * retention, exactly like any time-travel read).
  *
  * Write protocol per batch: advance each member store through its
  * OWN exactly-once commit (IncrementalAgg.applyOnceMulti, the ANN
  * store's append/delete — unchanged), then [[commitCut]] the new
  * version pair(s). Failure analysis:
  *   - crash BETWEEN member commits: members that committed are
  *     invisible to coordinator readers (the cut still names the old
  *     versions) — stale but CONSISTENT, never mixed;
  *   - recovery: re-run the batch — every member's own ledger makes
  *     its replay a no-op, the re-run reaches commitCut, and the cut
  *     lands; a batch that advanced only SOME members before dying is
  *     therefore self-healing, which is exactly why the members'
  *     exactly-once ledgers stay where they are instead of moving
  *     into the coordinator;
  *   - concurrent coordinators: commitCut pins `expectedBase` by
  *     default to the cut it read at entry, so two racing batches
  *     surface as [[java.util.ConcurrentModificationException]]
  *     (AtomicPublish's claim/CAS protocol), never a lost cut.
  *
  * Scale: a cut is |stores| rows — the coordinator's cost per batch
  * is one tiny parquet write + one pointer swap, independent of data
  * size; retention/vacuum of member stores must keep every version
  * any RETAINED cut references (same contract as their own time
  * travel — prune coordinator versions first, then members).
  */
object Coordinator {

  /** The coordinator's single table: (store, version) rows. */
  val StoresT = "stores"

  /** Commit a new cut. `cut` must name every member the coordinator
    * tracks (a cut is a complete snapshot, not a delta — carry
    * forward unchanged members' versions from [[currentCut]]).
    * `expectedBase`: `None` (default) pins the coordinator version
    * read at entry — a concurrent cut commit surfaces as a publish
    * conflict; pass `Some(base)` to pin an earlier read. Returns the
    * committed coordinator version. */
  def commitCut(spark: SparkSession, root: String, cut: Map[String, Long],
                expectedBase: Option[Option[Long]] = None): Long = {
    import spark.implicits._
    require(cut.nonEmpty, "a cut must name at least one store")
    AtomicPublish.publish(spark, root,
      Seq(StoresT -> cut.toSeq.sorted.toDF("store", "version")),
      expectedBase)
  }

  private def decode(spark: SparkSession,
                     snap: AtomicPublish.Snapshot): Map[String, Long] =
    snap.table(spark, StoresT).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The current committed cut — resolve ONCE per job and pin every
    * member read to it ([[graft.etl.IncrementalAgg.readView]]'s /
    * [[graft.ops.AnnIndexStore.load]]'s `version` argument). */
  def currentCut(spark: SparkSession, root: String): Map[String, Long] =
    decode(spark, AtomicPublish.snapshot(spark, root))

  /** Time travel for the PAIRING itself: the cut a retained
    * coordinator version recorded — "the warehouse AND the index as
    * of batch N", one consistent historical read across stores. */
  def cutAt(spark: SparkSession, root: String, version: Long): Map[String, Long] =
    decode(spark, AtomicPublish.snapshotAt(spark, root, version))
}
