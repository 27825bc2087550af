package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization as a custom stateful operator
  * (`flatMapGroupsWithState`) — the typed twin of
  * [[graft.operators.Sessionize]] (window/lag version).
  *
  * The same function runs in BOTH execution modes:
  *  - batch: each user's events arrive as one group, state starts
  *    empty — with `emitOpen=true` output is identical to the
  *    window-based operator (checked against the same DuckDB oracle);
  *  - streaming: the open session is carried in [[GroupState]] across
  *    micro-batches and finalized on processing-time timeout
  *    (`emitOpen=false`), giving continuous sessionization the
  *    reference's CDC loop cannot express (SURVEY.md §2.8 notes the
  *    reference has no event-time machinery at all).
  *
  * State is one tiny case class per user — at 100 TB of events the
  * state store scales with |users|, not |events|.
  */
object StatefulSessionize {

  case class Event(user_id: Long, ts_us: Long, event_id: Long)
  case class OpenSession(index: Long, start_us: Long, end_us: Long, n: Long)
  case class Session(user_id: Long, session_index: Long, n_events: Long,
      start_us: Long, end_us: Long, duration_us: Long)

  /** Fold sorted events into sessions, starting from `carry`. Returns
    * (closed sessions, open session).
    */
  private def fold(userId: Long, evs: Seq[Event], carry: Option[OpenSession],
      gapUs: Long): (Seq[Session], Option[OpenSession]) = {
    var closed = Vector.empty[Session]
    var open = carry
    evs.foreach { e =>
      open match {
        case Some(o) if e.ts_us - o.end_us <= gapUs =>
          open = Some(o.copy(end_us = e.ts_us, n = o.n + 1))
        case Some(o) =>
          closed :+= Session(userId, o.index, o.n, o.start_us, o.end_us,
            o.end_us - o.start_us)
          open = Some(OpenSession(o.index + 1, e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(OpenSession(1, e.ts_us, e.ts_us, 1))
      }
    }
    (closed, open)
  }

  def statefulFn(gapUs: Long, timeoutMs: Long, emitOpen: Boolean)(
      userId: Long, it: Iterator[Event], state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val o = state.get
      state.remove()
      Iterator.single(Session(userId, o.index, o.n, o.start_us, o.end_us,
        o.end_us - o.start_us))
    } else {
      val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val (closed, open) = fold(userId, evs, state.getOption, gapUs)
      open match {
        case Some(o) if !emitOpen =>
          state.update(o)
          if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
          closed.iterator
        case Some(o) =>
          state.remove()
          (closed :+ Session(userId, o.index, o.n, o.start_us, o.end_us,
            o.end_us - o.start_us)).iterator
        case None => closed.iterator
      }
    }
  }

  /** Batch entry point: identical results to the window-based
    * sessionizer (same oracle). */
  def sessionsBatch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val typed: Dataset[Event] = events.select(
      col(userCol).cast("long").as("user_id"),
      unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
      col(idCol).cast("long").as("event_id")).as[Event]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        statefulFn(gapUs, 0L, emitOpen = true))
      .toDF()
      .withColumnRenamed("session_index", "session_index")
  }

  /** Streaming entry point: open sessions carried across micro-batches
    * and closed by later events; with `timeoutMs > 0` they are also
    * finalized after that much processing-time silence. */
  def sessionsStream(events: Dataset[Event], gapUs: Long,
      timeoutMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        statefulFn(gapUs, timeoutMs, emitOpen = false))
  }
}
