package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.etl.{AtomicPublish, ChangeFeed, IncrementalAgg}

/** The exactly-once crash window of st14's CDC consumer, rehearsed
  * DETERMINISTICALLY: foreachBatch commits its publish, then the driver
  * "crashes" BEFORE the checkpoint records the batch (simulated by
  * throwing after applyOnce returns — offsets commit only after
  * foreachBatch completes, so this is byte-for-byte the
  * crash-after-publish-before-checkpoint window). The restarted stream
  * REPLAYS that batch id from the durable checkpoint; the applied
  * ledger — committed atomically WITH the state it describes — makes
  * the replay a no-op, and the final state equals a from-scratch
  * recompute. A timing-based SIGKILL probe would exercise the same
  * window only probabilistically; the injected throw pins it exactly. */
class CdcReplayCrashSpec extends SparkSuite {
  import spark.implicits._

  private val grp = Seq("g")
  private val sums = Seq("total" -> "x")

  private def df(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "g", "x")

  test("a batch replayed after crash-between-publish-and-checkpoint is a " +
    "no-op: final state equals the recompute, ledger holds each batch once") {
    val base = "/root/repo/target/test-sink/cdc_replay_crash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val feedDir = s"$base/feeds"
    val root = s"$base/mv"
    val chk = s"$base/chk" // DURABLE across the two stream runs — the point

    val v0 = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
    val v1 = Seq((1L, "a", 1.0), (3L, "b", 9.0), (4L, "c", 4.0))
    val v2 = Seq((1L, "b", 1.5), (3L, "b", 9.0), (4L, "c", 4.0))
    val v3 = Seq((3L, "b", 9.0), (4L, "c", 5.0), (5L, "a", 7.0))
    val chain = Seq(v0, v1, v2, v3)
    chain.sliding(2).zipWithIndex.foreach { case (pair, i) =>
      ChangeFeed.diff(df(pair.head), df(pair.last), Seq("id"))
        .repartition(1).write.mode("overwrite").parquet(s"$feedDir/f$i")
    }
    IncrementalAgg.publishInitial(spark, root, df(v0), grp, sums)

    val feedSchema = df(v0).schema.add("_change_type", "string", nullable = false)
    val appliedLog = scala.collection.mutable.ArrayBuffer[(Long, Boolean)]()
    def run(crashAfterBatch: Option[Long]): Either[Throwable, Unit] = {
      val q = spark.readStream.schema(feedSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$feedDir/*")
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (!batch.isEmpty) {
            val applied = IncrementalAgg.applyOnce(
              spark, root, batch, batchId, grp, sums)
            appliedLog.synchronized { appliedLog += ((batchId, applied)): Unit }
            if (crashAfterBatch.contains(batchId))
              throw new RuntimeException(
                s"injected crash AFTER batch $batchId published, " +
                  "BEFORE its checkpoint commit")
          }
        }
        .option("checkpointLocation", chk)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(); Right(()) }
      catch { case e: Throwable => Left(e) }
    }

    // run 1: crashes after batch 1's publish — batches 0 and 1 are
    // PUBLISHED, but batch 1's offsets never reach the checkpoint
    val crashed = run(crashAfterBatch = Some(1L))
    assert(crashed.isLeft, "the injected crash must abort the stream")
    assert(crashed.swap.toOption.get.getMessage.contains("injected crash") ||
      crashed.swap.toOption.get.getCause != null &&
        crashed.swap.toOption.get.getCause.getMessage.contains("injected crash"))

    // run 2: restart from the SAME checkpoint — batch 1 replays
    assert(run(crashAfterBatch = None).isRight, "restarted stream must finish")

    val replays = appliedLog.filter(_._1 == 1L).map(_._2)
    assert(replays === Seq(true, false),
      s"batch 1 must publish once then no-op on replay, saw $replays")

    val finalState = IncrementalAgg.readState(spark, root)
      .as[(String, Long, BigDecimal)].collect().toSet
    val recompute = IncrementalAgg.aggregate(df(v3), grp, sums)
      .as[(String, Long, BigDecimal)].collect().toSet
    assert(finalState === recompute,
      "state after crash+replay diverged from the from-scratch recompute")

    val ledger = AtomicPublish.snapshot(spark, root)
      .table(spark, IncrementalAgg.AppliedT)
      .as[Long].collect().toSeq.sorted
    assert(ledger === ledger.distinct, s"ledger holds duplicates: $ledger")
    assert(ledger.size === 3, s"expected 3 applied batches, ledger=$ledger")
  }
}
