package graft.streaming

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming analytics over the events table (SURVEY §2.10 — surface
  * beyond the batch-only reference): watermarked tumbling-window
  * aggregation in append mode, and gap-rule sessionization as custom
  * state via `flatMapGroupsWithState`. Both run as real Structured
  * Streaming queries (file source -> state store -> sink) and, drained
  * with `Trigger.AvailableNow`, produce results equal to their batch
  * equivalents — which is what the Verify oracle and StreamOpsSpec gate.
  *
  * Append-mode window emission is one-batch-lagged: a batch evicts and
  * emits a window using the watermark derived from the PREVIOUS batch's
  * max event time. [[stageChronological]] therefore stages two trailing
  * flush files — the first advances the watermark past every real
  * window, the second triggers the batch in which they all emit. The
  * same trailing files carry one far-future sentinel row per user
  * (event_id = -1), which is what closes each session group's state
  * (data-driven flush — no reliance on timeout firing semantics under
  * AvailableNow). At production scale neither trick is needed: a live
  * stream advances the watermark forever; sentinels are only how a
  * FINITE drain reproduces the infinite-stream steady state. */
object StreamOps {

  /** Per-user session state: last event time (ms), closed+open session
    * count, event count. Public top-level so Dataset encoders resolve. */
  final case class SessState(lastTs: Long, sessions: Long, events: Long)

  /** Stage the static events table as a chronological file stream:
    * `chunks` flat parquet files sorted by (ts, event_id) with strictly
    * increasing modification times (the file source's processing order),
    * plus two trailing flush files (see class doc). Returns the staged
    * stream directory. */
  def stageChronological(spark: SparkSession, eventsParquet: String,
      streamDir: String, chunks: Int): String = {
    import spark.implicits._
    val dir = Paths.get(streamDir)
    Files.createDirectories(dir)
    val ev = spark.read.parquet(eventsParquet)
      .select($"event_id", $"ts".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value", $"props")
    val rows = ev.orderBy($"ts", $"event_id").collect()
    val n = rows.length
    require(n > 0, s"no events in $eventsParquet")
    val schema = ev.schema
    val users = rows.map(_.getLong(2)).distinct.sorted
    val maxTs = rows.last.getTimestamp(1).getTime
    def writeChunk(name: String, part: Array[org.apache.spark.sql.Row],
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("stream_chunk").toString
      spark.createDataFrame(
          java.util.Arrays.asList(part: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val partFile = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = dir.resolve(name)
      Files.move(partFile.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(mtime)
      ()
    }
    val per = math.max(1, (n + chunks - 1) / chunks)
    val base = System.currentTimeMillis() - 1000L * (chunks + 4)
    rows.grouped(per).zipWithIndex.foreach { case (part, i) =>
      writeChunk(f"c$i%03d.parquet", part.toArray, base + i * 1000L)
    }
    // flush 1: one generic far-future row (advances the watermark)
    def sentinel(ts: Long, uid: Long) = org.apache.spark.sql.Row(
      -1L, new java.sql.Timestamp(ts), uid, "zz_flush", 0.0, null)
    writeChunk("f001.parquet", Array(sentinel(maxTs + 864000000L, -1L)),
      base + (chunks + 1) * 1000L)
    // flush 2: one sentinel per user (emits windows lagged one batch;
    // closes every session group)
    writeChunk("f002.parquet",
      users.map(u => sentinel(maxTs + 867600000L, u)) :+
        sentinel(maxTs + 867600000L, -1L),
      base + (chunks + 2) * 1000L)
    streamDir
  }

  /** Watermarked 1-hour tumbling-window counts per event type, append
    * mode: readStream -> withWatermark -> groupBy(window) -> memory sink.
    * Returns the emitted (closed) windows — with the staged flush files,
    * exactly the real windows; sentinel windows never close and the
    * `zz_flush` type is filtered out defensively. */
  def windowedEventCounts(spark: SparkSession, streamDir: String,
      checkpoint: String, queryName: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(streamDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("long")).as("value_cents"))
      .select(unix_millis($"window.start").as("w_start"), $"event_type",
        $"n", $"value_cents")
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName).filter($"event_type" =!= "zz_flush")
      .orderBy($"w_start", $"event_type")
  }

  /** Gap-rule sessionization (new session when > `gapMs` since the
    * user's previous event) as CUSTOM STREAMING STATE: groupByKey ->
    * flatMapGroupsWithState carrying (lastTs, sessions, events) per user
    * across micro-batches; a user's sentinel row (event_id = -1) closes
    * the state and emits the final (user_id, n_sessions, n_events) —
    * equal to the batch window-function sessionization (q4). */
  def sessionize(spark: SparkSession, streamDir: String,
      checkpoint: String, queryName: String,
      gapMs: Long = 1800000L): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(streamDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir)
      .select($"user_id", unix_millis($"ts".cast("timestamp")).as("ts_ms"),
        $"event_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long)], state: GroupState[SessState]) =>
          // in-batch order is not guaranteed; (ts, event_id) is the rule's
          // order. Across batches the staged chunks are chronological.
          val rows = it.toArray.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          var finals = List.empty[(Long, Long, Long)]
          rows.foreach { case (_, tsMs, eid) =>
            if (eid == -1L) { // sentinel: close and emit
              if (st.events > 0) finals = (uid, st.sessions, st.events) :: finals
              state.remove()
              st = SessState(Long.MinValue, 0L, 0L)
            } else {
              val newSess = st.lastTs == Long.MinValue || tsMs - st.lastTs > gapMs
              st = SessState(tsMs, st.sessions + (if (newSess) 1L else 0L),
                st.events + 1L)
            }
          }
          if (st.events > 0) state.update(st)
          finals.iterator
      }
      .toDF("user_id", "n_sessions", "n_events")
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(queryName).filter($"user_id" >= 0)
      .orderBy($"user_id")
  }
}
