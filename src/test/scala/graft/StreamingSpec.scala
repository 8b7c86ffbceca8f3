package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** TTL probe processor (VERDICT r10 #7): two ValueStates over the same
  * keys — 1 s vs 10 min TTL — each bumped per batch; emits a running
  * batch ordinal plus whether each state EXISTED before this batch's
  * update, so a test can pin both directions: short-TTL state is gone
  * after the TTL elapses between batches, long-TTL state survives the
  * identical gap. At 100 TB this is the state-size lever for unbounded
  * key spaces (per-key state that self-evicts instead of growing until
  * the job OOMs or needs manual timer-based cleanup). */
class TtlProbeProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Boolean, Boolean)] {
  @transient private var fast: ValueState[Long] = _
  @transient private var slow: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    fast = getHandle.getValueState("fast", Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofSeconds(8)))
    slow = getHandle.getValueState("slow", Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMinutes(10)))
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[(Long, Long, Boolean, Boolean)] = {
    val n = rows.size.toLong
    val f = fast.exists(); val sl = slow.exists()
    val ordinal = (if (sl) slow.get() else 0L) + n
    fast.update((if (f) fast.get() else 0L) + n)
    slow.update(ordinal)
    Iterator((key, ordinal, f, sl))
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val sf = SparkFixture.sf001

  test("state TTL: short-TTL ValueState expires between batches, long-TTL survives") {
    // Three batches pin BOTH directions of the fast TTL (r13 ADVICE:
    // the old two-batch form couldn't distinguish "expired" from
    // "never persisted"): run 2 fires back-to-back (gap ≪ 8 s fast
    // TTL) and must SEE the fast state — the positive persistence
    // assertion; run 3 fires after a 10 s sleep (> 8 s) and must see
    // it expired. Margins are wide on both sides (back-to-back gap is
    // ~1 s on a warmed session vs the 8 s TTL; expiry is evaluated
    // against the batch timestamp, so a slow host only widens the
    // run-3 gap). The slow state is the non-vacuity control — same
    // key, same batches, same store; only the TTL differs, so a false
    // "expired" from state loss would trip the slow assertion.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // Two single-batch Trigger.Once runs over ONE checkpoint, not one
    // long-lived query: in TimeMode.ProcessingTime every committed
    // batch REQUIRES a follow-up batch (timer/TTL evaluation), so an
    // open-ended query never quiesces — processAllAvailable hangs and
    // even AvailableNow loops no-data batches forever (observed: 2300+
    // commits). Trigger.Once runs exactly one micro-batch and stops,
    // bounded by construction; the 3 s gap sits between the runs and
    // run 2's batch timestamp (what TTL expiry is evaluated against)
    // lands past the fast TTL. The sink is foreachBatch → parquet
    // because only a recovery-capable sink may resume a checkpoint
    // (the memory sink refuses); the emitted ordinal (1 = first
    // batch's state write, 2 = resumed-on-top) keys the assertions.
    val cp = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_ttl_").toString
    val ms = MemoryStream[(Long, Long)] // ONE source: its offsets span both runs
    def runBatch(data: (Long, Long)*): Unit = {
      ms.addData(data)
      val out = ms.toDS().groupByKey(_._1)
        .transformWithState(new TtlProbeProcessor,
                            TimeMode.ProcessingTime(), OutputMode.Update())
        .toDF("user_id", "ordinal", "fast_existed", "slow_existed")
      val q = out.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(outDir)
        }
        .outputMode("update").trigger(Trigger.Once(): @annotation.nowarn)
        .option("checkpointLocation", cp).start()
      q.awaitTermination()
    }
    runBatch((1L, 1L))
    runBatch((1L, 2L))       // back-to-back: inside the 8 s fast TTL
    Thread.sleep(10000)      // > fast TTL, << slow TTL
    runBatch((1L, 3L))
    val rows = s.read.parquet(outDir).collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toSeq.sortBy(_._1)
    assert(rows == Seq((1L, false, false), (2L, true, true),
                       (3L, false, true)),
      s"expected run1 fresh, run2 fast-alive (persistence), " +
      s"run3 fast-expired/slow-alive, got: $rows")
  }

  test("watermark drops the 3-hour-late row (SURVEY §2.I stream_late_drop)") {
    val rows = SparkEntry.queries("stream_late_drop")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t0win = 1699999200000000L // hour-floor of the crafted t0
    assert(rows(t0win) == 1L,
           s"late duplicate leaked into the t0 window: ${rows(t0win)}")
    assert(rows.values.forall(_ == 1L), s"unexpected counts: $rows")
    assert(rows.size == 5, s"expected 5 appended windows, got ${rows.keySet}")
  }

  test("append-mode eviction actually withholds the trailing open windows") {
    // The DuckDB oracles for stream_append_final / stream_session_append
    // encode the watermark boundary — but they would pass VACUOUSLY if
    // the fixture's boundary excluded nothing. Assert the withheld sets
    // are non-empty: append emits strictly fewer windows than the
    // complete-mode / batch twins.
    val nTumbling = SparkEntry.queries("stream_tumbling")(spark, sf).count()
    val nAppend = SparkEntry.queries("stream_append_final")(spark, sf).count()
    assert(nAppend < nTumbling,
           s"no window was withheld: append=$nAppend complete=$nTumbling")
    val nSessAll = SparkEntry.queries("win_sessionize")(spark, sf).count()
    val nSessApp =
      SparkEntry.queries("stream_session_append")(spark, sf).count()
    assert(nSessApp < nSessAll,
           s"no session was withheld: append=$nSessApp batch=$nSessAll")
  }

  test("typed TWS state read back by name equals the processor's sink output") {
    // The state source's typed read path must surface EXACTLY the values
    // the processor emitted: same rows, independently of which surface
    // (checkpointed ValueState vs drained memory sink) is consulted.
    val viaState = SparkEntry.queries("stream_state_read_tws")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val viaSink = SparkEntry.queries("stream_stateful_tws")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(viaState.nonEmpty, "state read returned no rows")
    assert(viaState == viaSink,
           s"state read diverges from sink output:\n  state=${viaState.take(3)}\n  sink=${viaSink.take(3)}")
  }

  test("bootstrapped state equals full-history streaming state") {
    // Two fully independent execution paths — batch backfill seeding
    // initial state + streaming only the live tail, vs streaming the
    // whole table — must land on identical per-user final state. The
    // split boundary being unobservable IS the bootstrap guarantee.
    val boot = SparkEntry.queries("stream_state_bootstrap")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val full = SparkEntry.queries("stream_state_read_tws")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(boot.nonEmpty, "bootstrap state read returned no rows")
    assert(boot == full,
           s"bootstrap diverges from full-history state:\n  boot=${boot.take(3)}\n  full=${full.take(3)}")
    // Non-vacuity: some users must have NO events past the boundary —
    // their state exists ONLY because handleInitialState seeded it and
    // is reachable ONLY through the state source (the update-mode sink
    // never re-emits a key the stream didn't touch).
    val ev = graft.Tables.events(spark, sf)
      .agg(min(col("ts_us")), max(col("ts_us"))).head
    val bd = graft.streaming.Streaming.bootstrapBoundary(
      ev.getLong(0), ev.getLong(1))
    val backfillOnly = graft.Tables.events(spark, sf)
      .groupBy("user_id").agg(max(col("ts_us")).as("mx"))
      .filter(col("mx") < bd).count()
    assert(backfillOnly > 0,
           "fixture left no backfill-only users; the state-source claim is vacuous")
  }

  test("timer-driven sessions equal the built-in session_window set") {
    // Hand-rolled event-time timers (ListState + registerTimer +
    // handleExpiredTimer) and the built-in session_window in append
    // mode are entirely different mechanisms; emitting the IDENTICAL
    // closed-session set is the evidence the timer path is correct.
    val timers = SparkEntry.queries("stream_timer_sessions")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val builtin = SparkEntry.queries("stream_session_append")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(timers.nonEmpty, "timer path emitted no sessions")
    assert(timers == builtin,
           s"timer sessions diverge from session_window:\n  timer=${timers.take(3)}\n  builtin=${builtin.take(3)}")
  }

  test("timer sessions conserve: emitted + pending list state = all sessions") {
    // The emitted (closed) set and the checkpoint's pending ListState
    // are two surfaces of one run; together they must account for every
    // gaps-and-islands session exactly once — no session lost between
    // the timer path and state, none double-counted.
    val closed = SparkEntry.queries("stream_timer_sessions")(spark, sf)
      .select("user_id", "sess_start_us").collect().map(_.toSeq).toSet
    val pending = SparkEntry.queries("stream_state_read_list")(spark, sf)
      .select("user_id", "sess_start_us").collect().map(_.toSeq).toSet
    assert(pending.nonEmpty, "no pending sessions; the complement is vacuous")
    assert((closed & pending).isEmpty,
           s"sessions in BOTH surfaces: ${(closed & pending).take(3)}")
    val all = SparkEntry.queries("win_sessionize")(spark, sf)
      .select("user_id", "sess_start_us").collect().map(_.toSeq).toSet
    assert(closed ++ pending == all,
           s"conservation broken: closed=${closed.size} pending=${pending.size} all=${all.size}")
  }

  test("drained tumbling stream equals its batch twin (batch-equivalence)") {
    val streamed = SparkEntry.queries("stream_tumbling")(spark, sf).collect()
    val batch = Tables.eventsTs(spark, sf)
      .groupBy(unix_micros(date_trunc("hour", col("ts_ts"))).as("win_us"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           Tables.d(sum(Tables.dec(col("value")))).as("sum_value"))
      .orderBy("win_us", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("foreachBatch sink is exactly-once under micro-batch replay") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_eo_").toString
    val batch = Seq((1L, 10L, 1.5), (2L, 20L, 2.5), (3L, 30L, 3.5))
      .toDF("event_id", "user_id", "value")
    val write = streaming.Streaming.exactlyOnceBatchWrite(out) _
    // Replay case 1: a PARTIAL first attempt (data landed, no commit
    // marker — the crash-mid-write shape) must be overwritten, not
    // appended to.
    batch.limit(1).write.mode("overwrite").parquet(s"$out/batch_id=7")
    write(batch, 7L)
    // Replay case 2: a COMMITTED batch re-delivered (driver restart
    // replaying the checkpoint) must be skipped.
    write(batch, 7L)
    write(batch, 7L)
    val got = spark.read.parquet(out).select("event_id", "user_id", "value")
    assert(got.count() == 3, s"replay duplicated rows: ${got.count()}")
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("AvailableNow + checkpoint is incremental: run 2 writes only new files' rows") {
    val rows = SparkEntry.queries("stream_incremental")(spark, sf).collect()
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
    assert(rows.length == signups.count(), "final table != batch filter")
    // The exactly-once sink partitions output by micro-batch; generation
    // 2 (odd event_ids) must live entirely in batches AFTER generation
    // 1's — proving the checkpoint skipped the already-processed files.
    val out = spark.read
      .parquet(streaming.Streaming.incrStem(sf) + "/out")
      .select(col("batch_id").cast("long").as("batch_id"), col("event_id"))
    val maxGen1Batch = out.filter(col("event_id") % 2 === 0)
      .agg(max("batch_id")).collect()(0).getLong(0)
    val minGen2Batch = out.filter(col("event_id") % 2 === 1)
      .agg(min("batch_id")).collect()(0).getLong(0)
    assert(minGen2Batch > maxGen1Batch,
           s"gen2 rows landed in gen1's batches ($minGen2Batch <= $maxGen1Batch)")
  }

  test("streaming dedup halves a doubled input back to the original set") {
    val deduped = SparkEntry.queries("stream_dedup")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val original = Tables.load(spark, sf, "events").count()
    assert(deduped == original)
  }

  test("mid-batch crash + checkpoint resume is exactly-once (file sink)") {
    // VERDICT r13 #4: kill a file-sink query MID-BATCH — not between
    // batches — and resume from the checkpoint. A fault UDF throws
    // while processing the marked slice (so the batch dies after the
    // sink may have begun writing task files), then the flag clears
    // and the SAME query restarts on the same checkpoint: the replayed
    // batch must land exactly once — the file sink's _spark_metadata
    // transaction log is what hides any orphan files from the failed
    // attempt, which is the exactly-once mechanism a 100 TB job relies
    // on every time an executor or driver dies mid-write. Ordering-
    // agnostic: whichever micro-batch hits the marked slice first dies;
    // the assertions only need SOME committed prefix strictly smaller
    // than the total, then the exact total after recovery.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2")
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_crash_")
    val (inDir, outDir, cp) =
      (s"$base/in", s"$base/out", s"$base/cp")
    // three input files → three micro-batches (maxFilesPerTrigger=1)
    Seq(Seq(1L, 2L, 3L), Seq(101L, 102L), Seq(201L, 202L, 203L))
      .zipWithIndex.foreach { case (ids, i) =>
        ids.toDF("id").coalesce(1).write.parquet(s"$inDir/f$i")
      }
    CrashGate.armed = true
    val fault = udf { (id: Long) =>
      if (CrashGate.armed && id >= 100L && id < 200L)
        throw new RuntimeException("injected mid-batch fault")
      id
    }
    def start() = s.readStream
      .schema("id LONG").option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
      .select(fault(col("id")).as("id"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    // run 1: dies inside the batch that carries the 1xx slice
    val crashed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start().awaitTermination()
    }
    assert(crashed.getMessage.contains("injected mid-batch fault") ||
           Option(crashed.getCause).exists(_.getMessage != null &&
             crashed.getCause.getMessage.contains("injected")),
           s"query died for the wrong reason: ${crashed.getMessage}")
    val committed = s.read.parquet(outDir).count()
    assert(committed < 8, s"crash committed everything ($committed rows)?")
    // run 2: same checkpoint, fault cleared — replays the failed batch,
    // finishes the rest; output must be the exact input set, once each
    CrashGate.armed = false
    start().awaitTermination()
    val got = s.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 101L, 102L, 201L, 202L, 203L),
           s"exactly-once violated after resume: $got")
  }
}

/** Executor-visible fault switch for the crash-recovery test (local
  * mode: one JVM, so a @volatile static is executor-visible). */
object CrashGate { @volatile var armed = false }
