package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analogs of the reference's streaming-shaped
  * constructs (SURVEY §2.6):
  *
  *  - C1 `background_search_loop` (1 Hz batch kNN appending metric rows,
  *    /root/reference/dynamic_script_faiss.py:31-43): a streaming query
  *    over a query-batch stream, `foreachBatch` running kNN against the
  *    current snapshot held in an [[AtomicReference]] — the snapshot swap
  *    (C2) is the batch engine's isolation model carried over.
  *  - The interval metric log as an event-time stream: watermarked windowed
  *    aggregation, plus a stateful sessionizer
  *    (`flatMapGroupsWithState`) for gap-based sessions — the streaming
  *    form of [[graft.operators.MetricsAnalytics.sessionize]].
  */
object StreamingMetrics {

  /** Watermarked tumbling-window aggregation over a metric/event stream:
    * (ts, key, value) → per-window per-key count/avg/sum. Works on both
    * batch and streaming DataFrames (same plan). */
  def windowedAgg(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // integer cents: exact for 2-decimal inputs, engine-order immune
        round(sum(col("value") * 100)).cast("long").as("sum_cents"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Hopping (sliding) windows: every event contributes to
    * windowDur / slideDur overlapping windows. Spark expands the row
    * per window BEFORE the keyed shuffle (the `window` generator), so
    * state stays per-(window, key) — the standard trend-smoothing /
    * rate-over-trailing-interval shape, batch and streaming alike. */
  def hoppingWindowAgg(events: DataFrame, windowDur: String, slideDur: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value") * 100)).cast("long").as("sum_cents"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Drive [[windowedAgg]] through the actual streaming engine over the
    * events parquet — `Trigger.AvailableNow` processes the backlog as a
    * bounded stream (micro-batched, stateful aggregation, then
    * self-terminates), the pattern for replaying history through the
    * exact pipeline that then keeps running on live data. Complete-mode
    * memory sink: the final state IS the batch answer, which is what the
    * DuckDB oracle checks. */
  /** Run `body` with `spark.sql.shuffle.partitions` = n, restoring the
    * previous value after. Every stateful streaming operator allocates
    * one state store PER SHUFFLE PARTITION; at fixture key cardinality
    * (hundreds of users / a handful of windows) 4 stores cut the fixed
    * per-query store setup 8× with zero parallelism loss (A/B'd 4 vs 8
    * at sf0.1: every stream query flat-to-faster, the stream-stream
    * join -0.5 s warm). At real scale the key space, not the store
    * count, sizes this — which is why it is a per-query conf, not a
    * global. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Measured fixture optimum for the per-query state-store count
    * (A/B'd 4 vs 8 over two rounds at sf0.1: every stream query
    * flat-to-faster) — the FLOOR of the sizing rule below, covering the
    * regime where fixed store setup dominates. */
  val FixtureStateStores = 4

  /** Target distinct keys per state store at scale: HDFS-backed stores
    * hold their keyed state in executor memory per partition, so the
    * store count must grow with key cardinality — ~100k keys × O(100 B)
    * of state each keeps a store's partition in the tens of MB. */
  val KeysPerStore = 100000L

  /** Ceiling: beyond this, per-partition checkpoint/commit overhead and
    * tiny-task scheduling dominate; shard the QUERY (e.g. by key range)
    * before sharding stores further. */
  val MaxStateStores = 4096

  /** The state-store sizing RULE: stores = clamp(⌈keys / KeysPerStore⌉,
    * FixtureStateStores, MaxStateStores). Stateful operators allocate
    * one state store per shuffle partition, so this is what
    * `spark.sql.shuffle.partitions` should be inside a streaming query,
    * derived from the operator's KEY CARDINALITY — a constant is only
    * correct at one scale. Callers pass the best cheap estimate they
    * have (an approx_count_distinct census, a window-bucket count from
    * the event-time span, a corpus row count); 0 (= "no keyed state /
    * batch-sized work") yields the fixture floor. */
  def statePartitionsFor(distinctKeys: Long): Int = {
    // overflow-safe ceil: `keys + KeysPerStore - 1` wraps negative for
    // keys near Long.MaxValue, collapsing the result to the fixture
    // floor instead of the MaxStateStores cap (ADVICE r7)
    val ceil = distinctKeys / KeysPerStore +
      (if (distinctKeys % KeysPerStore == 0) 0L else 1L)
    math.min(MaxStateStores.toLong, math.max(FixtureStateStores.toLong, ceil)).toInt
  }

  def availableNowWindowedAgg(spark: SparkSession, dir: String,
      windowDur: String, watermark: String, stateKeys: Long = 0L): DataFrame =
    withStatePartitions(spark, statePartitionsFor(stateKeys)) {
      availableNowWindowedAggImpl(spark, dir, windowDur, watermark)
    }

  private def availableNowWindowedAggImpl(spark: SparkSession, dir: String,
      windowDur: String, watermark: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // glob, not the bare file path: for a non-glob path FileStreamSource
    // force-sets basePath to that path, which must then be a directory —
    // a glob keeps basePath auto-derived from the matched files' parent
    val raw = spark.readStream.schema(schema).parquet(s"$dir/events*.parquet")
    val events = graft.sources.Tables.normalizeEventTs(raw)
    val sink = "stream_wagg_" + java.lang.Integer.toHexString(dir.hashCode)
    val q = windowedAgg(events, windowDur, watermark)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  /** LATE-DATA semantics end-to-end, across a checkpointed RESTART —
    * the two event-time behaviors the rest of the streaming suite
    * deliberately sidesteps with generous watermarks:
    *
    *   1. phase A streams the on-time 90% of events (one file), the
    *      append-mode day-window aggregation emits every window the
    *      watermark (max event time − `delay`) has closed, and state +
    *      watermark land in the CHECKPOINT;
    *   2. the query restarts against the same checkpoint with the held-
    *      back 10% appended as a second file — the recovered watermark
    *      now drops every late row whose window already closed, while
    *      rows for still-open windows merge into the recovered state.
    *
    * The union of both runs' emissions is the final answer. Everything
    * is deterministic — the phase split is the Knuth id-hash, file
    * batching is the checkpoint's processed-file log, the watermark is
    * exact ms arithmetic — so a SQL oracle replays drop and emission
    * decisions row for row. Restart recovery (the 100 TB operational
    * property: a killed job resumes without re-emitting or double-
    * counting) falls out of the same construction. */
  def lateDataAudit(spark: SparkSession, events: DataFrame, root: String,
      windowDur: String = "1 day", delay: String = "36 hours",
      stateKeys: Long = 0L): DataFrame = {
    import graft.operators.Sampling
    val fs = new java.io.File(root)
    if (fs.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(fs)
    }
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    // phase split, all deterministic: the trailing 2 days arrive late
    // (they land in windows the 36 h watermark still holds open →
    // ACCEPTED on restart), plus 1-in-50 of the older rows (their
    // windows closed in phase A → DROPPED on restart). Both behaviors
    // exercised, both replayable.
    val maxMs = events.agg(max(unix_millis(col("ts")))).first().getLong(0)
    val cut = maxMs - 2L * 86400000L
    val ms = unix_millis(col("ts"))
    val oldBucket = Sampling.idBucket(col("event_id"), 50)
    val onTime = events.filter(ms <= cut && oldBucket =!= 0)
    val late = events.filter(ms > cut || oldBucket === 0)
    // file sink, not memory: only a durable sink supports restarting
    // from the checkpoint, and it happens to give the union for free —
    // both phases append their emissions to the same output directory
    val outDir = s"$root/out"
    def runPhase(phase: DataFrame): Unit = {
      phase.coalesce(1).write.mode("append").parquet(srcDir)
      val schema = spark.read.parquet(srcDir).schema
      val agg = spark.readStream.schema(schema).parquet(srcDir)
        .withWatermark("ts", delay)
        .groupBy(window(col("ts"), windowDur))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("window.start")).as("window_start_ms"), col("n"))
      val q = agg.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    withStatePartitions(spark, statePartitionsFor(stateKeys)) {
      runPhase(onTime)
      runPhase(late)
    }
    spark.read.parquet(outDir)
  }

  /** Streaming exact dedup: watermarked dropDuplicates on a fingerprint
    * column — the streaming form of [[graft.text.Dedup.exact]] for
    * continuous ingestion (state bounded by the watermark horizon). */
  def streamingDedup(docs: DataFrame, fpCol: String, watermark: String): DataFrame =
    docs.withWatermark("ts", watermark).dropDuplicates(fpCol)

  /** Watermarked stream-stream interval join: rows of `left` pair with
    * `right` rows of the same `key` whose timestamp lies in
    * `[leftTs + lowerMs, leftTs + upperMs]`. Both sides carry the same
    * watermark and the join condition bounds event time in BOTH
    * directions, so Spark can size the join state and evict rows past
    * the horizon — the requirement for an append-mode stream-stream
    * inner join (and for state not growing unboundedly at 100 TB/day
    * ingest). The same plan runs on batch frames, where the condition
    * degenerates to a plain range join — parity is tested in
    * StreamingSpec. Output columns: key, leftTs, rightTs plus the two
    * value columns, disambiguated by the given aliases. */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      watermark: String, lowerMs: Long, upperMs: Long): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermark) else left).alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, watermark) else right).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") + expr(s"INTERVAL '$lowerMs' MILLISECOND") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL '$upperMs' MILLISECOND"))
  }

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class SessionState(sessionId: Long, lastMs: Long)
  final case class SessionOut(user_id: Long, event_id: Long, session_id: Long)

  /** Stateful gap-based sessionization via flatMapGroupsWithState —
    * KeyValueGroupedDataset custom state (C1's stateful form). Events must
    * arrive in event-time order per key within a batch (sorted inside). */
  def sessionizeStream(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = sorted.map { e =>
            val ms = e.ts.getTime
            val sid =
              if (st.lastMs == Long.MinValue || ms - st.lastMs > gapMs) st.sessionId + 1
              else st.sessionId
            st = SessionState(sid, ms)
            SessionOut(uid, e.event_id, sid)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class DocIn(doc_id: Long, text: String)
  final case class NearDupHit(id_a: Long, id_b: Long, jaccard_bp: Long)
  final case class BandState(docs: List[(Long, Array[String])])

  /** Streaming MinHash near-dup: continuous ingestion where every new doc
    * is checked against all previously seen docs that share a banded
    * signature bucket — the streaming form of
    * [[graft.text.Dedup.minHashNearDup]], with the band bucket as the
    * state key (`flatMapGroupsWithState`): state per (band, hash) bucket
    * is just the docs that landed there, so memory tracks bucket
    * occupancy, not the corpus. Uses the SAME portable hash pipeline as
    * the batch operator (PolyHash + mixed affine seeds + mod-P band
    * fold), so batch and stream find identical pairs; a pair colliding in
    * multiple bands may be emitted once per band (dedupe downstream if
    * exact-once matters). Verification is exact Jaccard on the stored
    * shingle sets, in integer basis points. */
  def nearDupStream(docs: Dataset[DocIn], shingleSize: Int = 3, numHashes: Int = 16,
      numBands: Int = 4, threshold: Double = 0.5): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    import graft.text.Dedup
    val minBp = (threshold * 10000).toLong
    docs
      .flatMap { d =>
        val sh = Dedup.shingleSet(d.text, shingleSize)
        val sig = Dedup.minHashSigScala(sh, numHashes)
        Dedup.bandHashesScala(sig, numBands).zipWithIndex.map {
          case (h, b) => (b, h, d.doc_id, sh)
        }
      }
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BandState, NearDupHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Array[String])],
            state: GroupState[BandState]) =>
          var known = state.getOption.getOrElse(BandState(Nil)).docs
          val out = scala.collection.mutable.ListBuffer.empty[NearDupHit]
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sh) =>
            known.foreach { case (oid, osh) =>
              if (oid != id) {
                val inter = sh.intersect(osh).length
                val jac = inter * 10000L / (sh.length + osh.length - inter)
                if (jac >= minBp)
                  out += NearDupHit(math.min(id, oid), math.max(id, oid), jac)
              }
            }
            known = (id, sh) :: known
          }
          state.update(BandState(known))
          out.iterator
      }
  }

  final case class CdcIn(user_id: Long, event_id: Long, ms: Long, op: String,
      cents: Long)
  final case class CdcState(ms: Long, eventId: Long, op: String, cents: Long)
  final case class CdcOut(user_id: Long, event_id: Long, ms: Long, op: String,
      cents: Long)

  /** CDC changelog apply run BY the streaming engine — the continuous
    * MERGE INTO: per-key state holds the current winner (arg-max by
    * (ms, event_id), delete-coded ops included), each micro-batch folds
    * its rows in and emits the key's refreshed winner (Update mode).
    * State is one fixed-size record per live key however long the
    * changelog, and the sink sees ≤ one row per touched key per batch —
    * the snapshot-from-changelog fold of the batch `cdc_apply` query,
    * kept incrementally. The final winner per key is monotone in
    * (ms, event_id), so an arg-max over the update log reproduces the
    * batch answer exactly. */
  def cdcApplyStream(changes: Dataset[CdcIn]): Dataset[CdcOut] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcState, CdcOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[CdcIn], state: GroupState[CdcState]) =>
          var st = state.getOption.orNull
          rows.foreach { r =>
            if (st == null || r.ms > st.ms ||
                (r.ms == st.ms && r.event_id > st.eventId))
              st = CdcState(r.ms, r.event_id, r.op, r.cents)
          }
          state.update(st)
          Iterator.single(CdcOut(uid, st.eventId, st.ms, st.op, st.cents))
      }
  }

  /** D1 as a streaming sink: every micro-batch of rows is
    * existence-guarded upserted ([[graft.operators.Snapshots.insert]]
    * `dedupe=true` — the Redis HSET-if-absent pattern,
    * `/root/reference/dynamic_script_redis.py:49-55`) into the shared
    * snapshot, and the new snapshot published atomically for concurrent
    * readers ([[knnSearchLoop]] reads the same [[AtomicReference]]).
    * Together the two queries reproduce the reference's
    * search-during-update experiment as continuous ingestion.
    *
    * Each published snapshot is `localCheckpoint`ed: without it, batch
    * N's plan chains N unions + N anti-joins and planning cost grows
    * linearly with stream lifetime. Superseded checkpoint blocks are
    * released by the ContextCleaner once the old snapshot DataFrame is
    * unreachable, so steady-state memory is one snapshot + one in-flight
    * batch. Returns the started query. */
  def upsertSink(rows: DataFrame, snapshot: AtomicReference[DataFrame],
      idCol: String = "vec_id") = {
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val updated = graft.operators.Snapshots
          .insert(snapshot.get(), batch, idCol, dedupe = true)
          .localCheckpoint()
        snapshot.set(updated)
        (): Unit
      }
      .start()
  }

  /** C1/C2: the background search loop as a streaming query. Each incoming
    * micro-batch of queries is answered with exact kNN against the snapshot
    * current at that micro-batch (atomic read — the reference's
    * accidental-snapshot semantics made explicit); results are handed to
    * `sink` (a collector in tests, any writer in production). Returns the
    * started query. */
  def knnSearchLoop(queryStream: DataFrame, snapshot: AtomicReference[DataFrame],
      k: Int)(sink: (DataFrame, Long) => Unit) = {
    queryStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val queries = batch.select(col("query_id"), col("q_embedding"))
        sink(graft.operators.Knn.exact(queries, snapshot.get(), k), batchId)
        (): Unit
      }
      .start()
  }
}
