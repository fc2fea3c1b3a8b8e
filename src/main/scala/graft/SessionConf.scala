package graft

import org.apache.spark.sql.SparkSession

/** Shared parser for the `SPARK_GRAFT_CONF="k=v;k=v"` rehearsal knob
  * honored by both [[Verify]] and [[Bench]]. A malformed entry (no '=',
  * empty key) fails FAST with a message naming the entry — previously a
  * bare `scala.MatchError` killed the whole verify/bench run with no
  * hint which fragment of the env var was at fault. */
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

  /** Apply every SPARK_GRAFT_CONF entry (if set) to the builder. */
  def applyEnv(builder: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_CONF").fold(builder)(raw =>
      parse(raw).foldLeft(builder) { case (b, (k, v)) => b.config(k, v) })
}
