package graft.pipeline

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Encoders, Row}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's aloc_sink abort-rules matrix ported rule by rule onto
  * [[ConnectorSocketSink]] (VERDICT r12 #3). The reference runs six
  * serial tests, each injecting exactly ONE fault at phase 1 of one
  * transaction via a `("txnid-regexp", regexp, vote, close-before,
  * close-after)` rule (testing/correctness/tests/aloc_sink/
  * README.abort-rules.md, aloc_sink.abort-rules.{1..6}.initializer — all
  * six target `:c_id=3`; here `:c_id=1$` so every test exercises commit →
  * fault → recover → commit). One spec per rule config, plus the
  * replayed-phase-2 / lost-link window after a durable peer commit
  * (connector_sink.pony:1293-1356 reconnect reconciliation).
  *
  * Every spec drives the REAL engine path end-to-end: the expected final
  * state is always "every batch's payloads committed exactly once" — the
  * 1-to-1 discipline of the effectively-once harness — plus the exact
  * abort count the rule's recovery shape implies.
  */
class AbortRulesMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def awaitCond(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  private def addFile(dir: String, vals: Range): Unit = {
    spark.createDataset(vals.map(_.toLong))(Encoders.scalaLong)
      .toDF("v").coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(60) // distinct mod-times keep file→batch order deterministic
  }

  /** Four single-file micro-batches (epochs 0-3), 20 rows each. */
  private def stage(tag: String): (String, String) = {
    val inDir = Files.createTempDirectory(s"abort_${tag}_in").toString
    val ckpt = Files.createTempDirectory(s"abort_${tag}_ckpt").toString
    (0 until 4).foreach(k => addFile(inDir, k * 20 until (k + 1) * 20))
    (inDir, ckpt)
  }

  private def startQuery(receiver: ProtocolPeers.TwoPcReceiver,
      inDir: String, ckpt: String): SinkHandle = {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    Graft.source("abort-src", ParquetReplaySource[Long](inDir,
        (r: Row) => r.getLong(0), (r: Row) => r.getLong(0),
        maxFilesPerTrigger = 1)(Encoders.scalaLong))
      .toSink(ConnectorSocketSink[Long]("127.0.0.1",
        receiver.server.getLocalPort,
        (v: Long) => s"v-$v".getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        checkpointLocation = Some(ckpt))
  }

  private def assertExactlyOnce(receiver: ProtocolPeers.TwoPcReceiver,
      n: Int): Unit = {
    val got = receiver.committed.asScala.toVector
    assert(got.distinct.size == got.size, s"duplicate payloads committed: $got")
    assert(got.toSet == (0 until n).map(v => s"v-$v").toSet,
      s"committed set != all $n rows exactly-once (got ${got.size})")
  }

  private def queryFailed(h: SinkHandle): Boolean =
    h.query.exists(_.exception.isDefined)

  // --- Rule 1: (":c_id=1", vote=False, close=none) — a clean abort vote.
  // The engine must phase-2-abort the txn immediately (not leave it
  // dangling in doubt), fail the batch loudly, and a restart must replay
  // the same epoch to a committed end — exactly once, exactly one abort.
  test("rule 1: phase-1 abort vote — fail, replay, exactly-once") {
    val receiver = new ProtocolPeers.TwoPcReceiver(rules = Seq(
      new ProtocolPeers.AbortRule(":c_id=1$", vote = false,
        closeBefore = false, closeAfter = false)))
    val (inDir, ckpt) = stage("r1")
    val h1 = startQuery(receiver, inDir, ckpt)
    assert(awaitCond(30000)(queryFailed(h1)),
      "query kept running past the abort vote")
    h1.stop()
    // the engine resolved its own aborted txn at the vote — no dangling
    // in-doubt entry for a future reconnect to mis-resolve
    assert(awaitCond(5000)(receiver.aborts == 1),
      s"expected the engine's immediate phase-2 abort, got ${receiver.aborts}")
    assert(!receiver.inDoubt.containsKey("graft:c_id=1"),
      s"aborted txn left dangling: ${receiver.inDoubt.keySet()}")
    val h2 = startQuery(receiver, inDir, ckpt)
    h2.processAllAvailable()
    h2.stop()
    assert(awaitCond(10000)(receiver.committed.size == 80))
    assertExactlyOnce(receiver, 80)
    assert(receiver.aborts == 1, s"no further aborts on replay, got ${receiver.aborts}")
    receiver.close()
  }

  // --- Rule 2: (":c_id=1", vote=False, close-before) — the reply is
  // LOST and the connection drops. The engine's in-batch retry loop must
  // reconnect, abort the in-doubt replay-pending txn via recovery, and
  // rewrite it — no query failure, no duplicate, exactly one abort.
  test("rule 2: abort vote dropped by close-before — in-batch reconnect recovers") {
    val receiver = new ProtocolPeers.TwoPcReceiver(rules = Seq(
      new ProtocolPeers.AbortRule(":c_id=1$", vote = false,
        closeBefore = true, closeAfter = false)))
    val (inDir, ckpt) = stage("r2")
    val h = startQuery(receiver, inDir, ckpt)
    h.processAllAvailable()
    assert(!queryFailed(h),
      s"lost phase-1 reply must be retried in-batch, not fail: ${h.query.flatMap(_.exception)}")
    h.stop()
    assert(awaitCond(10000)(receiver.committed.size == 80))
    assertExactlyOnce(receiver, 80)
    assert(receiver.aborts == 1,
      s"recovery must abort exactly the replayed in-doubt txn, got ${receiver.aborts}")
    receiver.close()
  }

  // --- Rule 3: (":c_id=1", vote=False, close-after) — abort vote
  // delivered, then the link dies before the engine's phase-2 abort can
  // arrive. The txn stays in doubt at the peer; the RESTART's recovery
  // conversation must abort it (epoch about to re-run), then commit the
  // replay.
  test("rule 3: abort vote then close-after — restart recovery aborts the in-doubt txn") {
    val receiver = new ProtocolPeers.TwoPcReceiver(rules = Seq(
      new ProtocolPeers.AbortRule(":c_id=1$", vote = false,
        closeBefore = false, closeAfter = true)))
    val (inDir, ckpt) = stage("r3")
    val h1 = startQuery(receiver, inDir, ckpt)
    assert(awaitCond(30000)(queryFailed(h1)),
      "query kept running past the abort vote")
    h1.stop()
    assert(receiver.inDoubt.containsKey("graft:c_id=1"),
      s"peer must still hold the txn in doubt (phase-2 abort was lost), " +
        s"have ${receiver.inDoubt.keySet()}")
    val h2 = startQuery(receiver, inDir, ckpt)
    h2.processAllAvailable()
    h2.stop()
    assert(awaitCond(10000)(receiver.committed.size == 80))
    assertExactlyOnce(receiver, 80)
    assert(receiver.aborts == 1,
      s"restart recovery aborts the in-doubt txn exactly once, got ${receiver.aborts}")
    receiver.close()
  }

  // --- Rule 4: (":c_id=1", vote=True, close=none) — the reference's
  // control row ("True, False, False does not abort the 2PC txn",
  // abort-rules.4.initializer). The forced vote is what would have been
  // voted anyway; the rule must fire and nothing may abort or fail.
  test("rule 4: forced commit vote, no close — control: commits clean") {
    val rule = new ProtocolPeers.AbortRule(":c_id=1$", vote = true,
      closeBefore = false, closeAfter = false)
    val receiver = new ProtocolPeers.TwoPcReceiver(rules = Seq(rule))
    val (inDir, ckpt) = stage("r4")
    val h = startQuery(receiver, inDir, ckpt)
    h.processAllAvailable()
    assert(!queryFailed(h))
    h.stop()
    assert(awaitCond(10000)(receiver.committed.size == 80))
    assertExactlyOnce(receiver, 80)
    assert(rule.hits.get() == 1, "the rule must have fired on epoch 1")
    assert(receiver.aborts == 0, s"control run may not abort, got ${receiver.aborts}")
    receiver.close()
  }

  // --- Rule 5: (":c_id=1", vote=True, close-before) — the peer voted
  // COMMIT internally but the reply was lost with the link. On the wire
  // this is indistinguishable from rule 2, and that is the point: the
  // engine must NOT assume any vote it never received — reconnect, abort
  // the in-doubt txn, rewrite. A peer that had (wrongly) applied on its
  // lost commit vote would now hold the data twice; exactly-once proves
  // the discipline end to end.
  test("rule 5: commit vote dropped by close-before — treated as no vote") {
    val receiver = new ProtocolPeers.TwoPcReceiver(rules = Seq(
      new ProtocolPeers.AbortRule(":c_id=1$", vote = true,
        closeBefore = true, closeAfter = false)))
    val (inDir, ckpt) = stage("r5")
    val h = startQuery(receiver, inDir, ckpt)
    h.processAllAvailable()
    assert(!queryFailed(h),
      s"lost reply must be retried in-batch, not fail: ${h.query.flatMap(_.exception)}")
    h.stop()
    assert(awaitCond(10000)(receiver.committed.size == 80))
    assertExactlyOnce(receiver, 80)
    assert(receiver.aborts == 1,
      s"recovery must abort the in-doubt txn whose vote was lost, got ${receiver.aborts}")
    receiver.close()
  }

  // --- Rule 6: (":c_id=1", vote=True, close-after) — the commit vote IS
  // delivered, then the link dies. The engine holds the txn
  // phase-1-complete (pendingCommit) and only discovers the dead socket
  // at the next epoch's head — where its phase 2 for c_id=1 cannot be
  // delivered. The reconnect recovery must COMMIT the in-doubt txn (its
  // checkpoint entry is durable by then: batch 2 only runs after batch
  // 1's commit-log write), resync offsets via the second NOTIFY, and
  // replay epoch 2 — zero aborts, zero failures, exactly once.
  test("rule 6: commit vote then close-after — recovery commits the in-doubt txn") {
    val receiver = new ProtocolPeers.TwoPcReceiver(rules = Seq(
      new ProtocolPeers.AbortRule(":c_id=1$", vote = true,
        closeBefore = false, closeAfter = true)))
    val (inDir, ckpt) = stage("r6")
    val h = startQuery(receiver, inDir, ckpt)
    h.processAllAvailable()
    assert(!queryFailed(h),
      s"dead link at phase 2 must be recovered in-batch, not fail: ${h.query.flatMap(_.exception)}")
    h.stop()
    assert(awaitCond(10000)(receiver.committed.size == 80))
    assertExactlyOnce(receiver, 80)
    assert(receiver.aborts == 0,
      s"a durably-checkpointed txn must be recovery-COMMITTED, never aborted, " +
        s"got ${receiver.aborts} aborts")
    receiver.close()
  }

  // --- Replayed phase 2 / lost link AFTER the peer applied the commit:
  // the peer resolves c_id=1 and the connection dies immediately — the
  // engine cannot know whether its phase 2 landed. On reconnect the
  // txn is no longer in the in-doubt list and the NOTIFY_ACK carries the
  // post-commit offset; the engine must not re-deliver c_id=1's bytes
  // (the peer already applied them) nor mis-base epoch 2's offsets.
  test("replayed phase 2 window: link dies after the peer applies the commit") {
    val receiver = new ProtocolPeers.TwoPcReceiver(
      closeAfterPhase2 = _ == "graft:c_id=1")
    val (inDir, ckpt) = stage("rp2")
    val h = startQuery(receiver, inDir, ckpt)
    h.processAllAvailable()
    assert(!queryFailed(h),
      s"lost link after a landed phase 2 must be recovered in-batch: ${h.query.flatMap(_.exception)}")
    h.stop()
    assert(awaitCond(10000)(receiver.committed.size == 80))
    assertExactlyOnce(receiver, 80)
    assert(receiver.aborts == 0, s"nothing to abort, got ${receiver.aborts}")
    receiver.close()
  }
}
