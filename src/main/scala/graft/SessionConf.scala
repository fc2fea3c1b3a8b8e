package graft

import org.apache.spark.sql.SparkSession

/** Shared env-driven session configuration for [[Verify]] and [[Bench]]:
  *
  *   - `SPARK_GRAFT_PROFILE=<name>` — a NAMED conf profile applied
  *     first (currently `tight-memory`, SCALE.md's memory-density
  *     recipe as one flag instead of five loose keys);
  *   - `SPARK_GRAFT_CONF="k=v;k=v"` — explicit entries, applied after
  *     the profile so they OVERRIDE it.
  *
  * A malformed entry or unknown profile fails FAST with a message
  * naming the offender — previously a bare `scala.MatchError` killed
  * the whole verify/bench run with no hint which fragment of the env
  * var was at fault. */
object SessionConf {
  def parse(raw: String): Seq[(String, String)] =
    raw.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => (k.trim, v)
        case _ => throw new IllegalArgumentException(
          s"malformed SPARK_GRAFT_CONF entry '$kv' — expected key=value " +
            s"(full value: '$raw')")
      }
    }

  /** The single-session tight-memory recipe (SCALE.md round-13 final
    * form), promoted from prose to code so a density rehearsal is one
    * env flag, not five remembered keys:
    *
    *   - 256 shuffle partitions with AQE coalescing OFF — partition-
    *     count scaling is the memory control, and the 64 MB coalesce
    *     advisory counts compressed bytes, not aggregation state;
    *   - materialized intermediates go to TABLES (`matDir`), not the
    *     block cache — a corpus-sized cached intermediate crowds the
    *     storage pool until an unrelated allocation becomes the
    *     last-straw OOM;
    *   - periodic driver GC every 45 s — the ContextCleaner reaps dead
    *     broadcasts only when the driver GCs, and the 30-min default
    *     lets them crowd executor MemoryStores across a long battery;
    *   - Hadoop vectored IO off — its async read buffers are untracked
    *     by Spark's memory manager and pile up at extreme density.
    *
    * `spark.executor.memory` is deliberately NOT here: it is the
    * deployment's real heap and must be set explicitly (the
    * local-cluster worker-capacity pitfall, SCALE.md) — pass it via
    * SPARK_GRAFT_CONF. Pair with `SPARK_GRAFT_RETRY=25` at the
    * orchestration layer for worker-loss collateral. */
  def tightMemoryProfile(matDir: String): Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> "256",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.cleaner.periodicGC.interval" -> "45s",
    "spark.hadoop.parquet.hadoop.vectored.io.enabled" -> "false",
    "graft.materialize.dir" -> matDir)

  /** Resolve a profile name to its entries; `matDir` backs the
    * materialize-dir entry (env `SPARK_GRAFT_MAT_DIR` overrides the
    * default `target/materialize` in [[applyEnv]]). */
  def profile(name: String, matDir: String): Seq[(String, String)] =
    name match {
      case "tight-memory" => tightMemoryProfile(matDir)
      case other => throw new IllegalArgumentException(
        s"unknown SPARK_GRAFT_PROFILE '$other' (known: tight-memory)")
    }

  /** Apply SPARK_GRAFT_PROFILE (if set), then every SPARK_GRAFT_CONF
    * entry (if set) — explicit entries override profile entries. */
  def applyEnv(builder: SparkSession.Builder): SparkSession.Builder = {
    val fromProfile = sys.env.get("SPARK_GRAFT_PROFILE").toSeq.flatMap(p =>
      profile(p, sys.env.getOrElse("SPARK_GRAFT_MAT_DIR",
        "target/materialize")))
    val fromConf = sys.env.get("SPARK_GRAFT_CONF").toSeq.flatMap(parse)
    (fromProfile ++ fromConf).foldLeft(builder) {
      case (b, (k, v)) => b.config(k, v)
    }
  }
}
