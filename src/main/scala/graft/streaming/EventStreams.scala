package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the `events` table (SURVEY.md §2.2: the
  * reference is strictly batch — two-phase barrier at `src/master.h:259-267` —
  * so all of this is north-star extension).
  *
  * Design: every streaming computation is a plan builder that also accepts a
  * batch DataFrame, so batch queries (driver-verified against the DuckDB
  * oracle) and streaming queries (tested with the memory sink) share one
  * definition — the Structured Streaming model's batch/stream unification.
  *
  * Scale: windowed aggregation states are bounded by watermark horizon ×
  * group cardinality; sessionization state is one small record per active
  * user. Both shuffle on the group key only.
  */
object EventStreams {

  /** Raw schema of events.parquet as read with nanosAsLong (see
    * [[graft.sources.Tables.events]]): ts arrives as epoch-nanos long.
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Streaming source over an events parquet directory. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(RawSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Tumbling 1-hour window × event_type counts and value sums. Works on both
    * batch and streaming inputs; streaming callers add `withWatermark`.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value")
      )
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))

  /** Watermarked streaming variant of [[windowedAgg]]. */
  def streamingWindowedAgg(events: DataFrame): DataFrame =
    windowedAgg(events.withWatermark("ts", "10 minutes"))

  /** Streaming exact dedup by event_id: watermark-bounded state, the
    * streaming twin of the batch dedup tier. Duplicates older than the
    * watermark horizon are expired from state — at 100 TB/day the state held
    * is horizon × arrival rate, not the full history.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicates("event_id")

  /** Session gap: a new session starts when a user is idle > 30 minutes. */
  val SessionGapMicros: Long = 30L * 60 * 1000 * 1000

  final case class EventRec(event_id: Long, tsMicros: Long, user_id: Long)
  final case class SessionRec(
      user_id: Long,
      sess_id: Long,
      n_events: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp
  )

  /** Core sessionizer: split a user's time-sorted events on >gap idle periods.
    * Shared by the batch typed path and the streaming stateful path, so both
    * provably implement the same semantics. Sessions are numbered 1..n in
    * time order (matching the window-function formulation's cumulative-sum id).
    */
  def splitSessions(userId: Long, sorted: Seq[EventRec]): Seq[SessionRec] = {
    if (sorted.isEmpty) return Seq.empty
    val out = Seq.newBuilder[SessionRec]
    var sessId = 0L
    var start = 0L
    var last = 0L
    var n = 0L
    def flush(): Unit = if (n > 0) {
      out += SessionRec(userId, sessId, n, micToTs(start), micToTs(last))
    }
    for (e <- sorted) {
      if (n == 0 || e.tsMicros - last > SessionGapMicros) {
        flush(); sessId += 1; start = e.tsMicros; n = 0
      }
      last = e.tsMicros; n += 1
    }
    flush()
    out.result()
  }

  private def micToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** Batch typed sessionization: groupByKey + flatMapGroups over the shared
    * core (the reference's reduce-UDF shape — `src/worker.h:105-106` — typed).
    */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), unix_micros(col("ts")).as("tsMicros"), col("user_id"))
      .as[EventRec]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        splitSessions(uid, it.toSeq.sortBy(e => (e.tsMicros, e.event_id)))
      }
      .toDF()
  }

  /** Streaming stateful sessionization with flatMapGroupsWithState: buffers a
    * user's open session in state, emits a session once the gap passes (or on
    * final flush in tests via a long watermark). State is one record per
    * active user — bounded, watermark-expirable.
    */
  def sessionizeStream(events: DataFrame): Dataset[SessionRec] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), unix_micros(col("ts")).as("tsMicros"), col("user_id"))
      .as[EventRec]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, SessionRec](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()
      ) { (uid, it, state) =>
        val buffered = state.getOption.map(_.pending).getOrElse(Seq.empty)
        val all = (buffered ++ it.map(e => (e.tsMicros, e.event_id))).sorted
        val recs = all.map { case (ts, id) => EventRec(id, ts, uid) }
        val sessions = splitSessions(uid, recs)
        if (sessions.isEmpty) Iterator.empty
        else {
          // Emit all closed sessions; keep the open (last) one in state.
          val closed = sessions.init
          val open = sessions.last
          val baseId = state.getOption.map(_.emitted).getOrElse(0L)
          val openEvents = all.takeRight(open.n_events.toInt)
          state.update(SessionBuf(openEvents, baseId + closed.size))
          closed.iterator.map(s => s.copy(sess_id = baseId + s.sess_id))
        }
      }
  }

  final case class SessionBuf(pending: Seq[(Long, Long)], emitted: Long)
}
