package graft.events

import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.{Det, GraftQuery}
import graft.streaming.EventStreams

/** Event-table queries: JSON extraction and the batch runs of the shared
  * streaming transforms ([[graft.streaming.EventStreams]]) — the batch
  * side of the batch/stream parity contract.
  */
object EventQueries {

  /** JSON scalar extraction (`props` is a JSON string) + per-type rollup. */
  val jsonRollup: GraftQuery = GraftQuery(
    "events_json_rollup",
    "get_json_object extraction + groupBy event_type rollup",
    EventOracle.jsonRollupSql) { (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")) / count(col("k"))).as("avg_k"),
        (sum(Det.quantize(col("value"))) / lit(Det.pow10(4))).as("sum_value"))
      .orderBy("event_type")
  }

  /** Tumbling 10-minute event-time windows (batch parity of the streaming
    * transform; wstart/wend are epoch-aligned on both engines).
    */
  val tumbling: GraftQuery = GraftQuery(
    "events_tumbling_10min",
    "event-time tumbling window agg (batch parity of streaming transform)",
    EventOracle.tumblingSql) { (s, d) =>
    EventStreams.tumblingCounts(Tables.events(s, d))
      .orderBy("wstart", "event_type")
  }

  /** Session windows per user, 6h gap (batch parity; oracle is the
    * gaps-and-islands formulation).
    */
  val sessions: GraftQuery = GraftQuery(
    "events_user_sessions",
    "session_window per user, 6h inactivity gap (batch parity)",
    EventOracle.sessionsSql) { (s, d) =>
    EventStreams.userSessions(Tables.events(s, d))
      .orderBy("user_id", "session_start")
  }

  def all: Seq[GraftQuery] = Seq(jsonRollup, tumbling, sessions)
}
