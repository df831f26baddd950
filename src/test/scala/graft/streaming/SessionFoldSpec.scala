package graft.streaming

import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the sessionize state fold itself (TestGroupState) —
  * the early-session bridging cases can't be reached through the full
  * query with watermark delay == gap (any would-be early event is already
  * sub-watermark), but the fold must stay batch-equivalent for
  * configurations where the delay exceeds the gap. */
class SessionFoldSpec extends AnyFunSuite {

  private def min(m: Long): Long = m * 60000L
  private def ev(m: Long, v: Double) = SessionEvent(7L, new Timestamp(min(m)), v)

  private def stateOf(s: Option[SessionState], watermarkMin: Long) =
    TestGroupState.create[SessionState](
      s.map(Optional.of[SessionState]).getOrElse(Optional.empty[SessionState]()),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(min(watermarkMin))), false)

  test("a backward-extending event bridges the early session into the open one") {
    // Open [100,100], gap 30, batch {60, 80}: 60 is >1 gap before 100 and
    // folds into `early`; 80 backward-extends the open session to 80;
    // batch q_sessionize merges 60-80-100 into ONE session — the fold
    // must too, not close 60 alone.
    val st = stateOf(Some(SessionState(min(100), min(100), 1, 1.0)), 0)
    val out = EventStreams.updateSessions(7L,
      Iterator(ev(60, 2.0), ev(80, 4.0)), st).toSeq
    assert(out.isEmpty, s"nothing should close, got $out")
    assert(st.get == SessionState(min(60), min(100), 3, 7.0))
  }

  test("a mid-batch close still bridges the early session first") {
    // Open [100,100], gap 30, batch {60, 80, 200}: 60 → early; 80
    // backward-extends the open session to [80,100]; 200 exceeds the gap
    // and closes it MID-batch — the close must merge 60-80-100 first
    // (batch emits ONE session [60,100]), leaving 200 open.
    val st = stateOf(Some(SessionState(min(100), min(100), 1, 1.0)), 0)
    val out = EventStreams.updateSessions(7L,
      Iterator(ev(60, 2.0), ev(80, 4.0), ev(200, 8.0)), st).toSeq
    assert(out.map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events)) ==
      Seq((min(60), min(100), 3L)), s"got $out")
    assert(st.get == SessionState(min(200), min(200), 1, 8.0))
  }

  test("an early session beyond one gap of the final open session still closes") {
    // Open [100,100], batch {20, 80}: 80 extends the open session back to
    // 80; 20 remains >1 gap below 80 — separate session, closed.
    val st = stateOf(Some(SessionState(min(100), min(100), 1, 1.0)), 0)
    val out = EventStreams.updateSessions(7L,
      Iterator(ev(20, 2.0), ev(80, 4.0)), st).toSeq
    assert(out.map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events)) ==
      Seq((min(20), min(20), 1L)))
    assert(st.get == SessionState(min(80), min(100), 2, 5.0))
  }

  test("chained early events merge with each other before the bridge check") {
    // Open [200,200], batch {10, 30, 180}: 10+30 chain into one early
    // session [10,30]; 180 extends the open session back to 180; 180-30
    // is 5 gaps — early closes on its own.
    val st = stateOf(Some(SessionState(min(200), min(200), 1, 1.0)), 0)
    val out = EventStreams.updateSessions(7L,
      Iterator(ev(10, 1.0), ev(30, 1.0), ev(180, 1.0)), st).toSeq
    assert(out.map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events)) ==
      Seq((min(10), min(30), 2L)))
    assert(st.get == SessionState(min(180), min(200), 2, 2.0))
  }

  test("sub-watermark events are dropped before the fold") {
    val st = stateOf(Some(SessionState(min(100), min(100), 1, 1.0)), 90)
    val out = EventStreams.updateSessions(7L,
      Iterator(ev(60, 2.0), ev(95, 4.0)), st).toSeq
    assert(out.isEmpty)
    assert(st.get == SessionState(min(95), min(100), 2, 5.0))
  }

  test("leaderboard folds a late-but-valid event into a still-open window") {
    // Window [0, 60min), watermark at 30 min: an event at 10 min is below
    // the watermark but its window cannot have emitted (emission needs
    // wm >= window end) — it must count, or the final leaderboard
    // diverges from the batch top-k.
    val st = TestGroupState.create[LeaderboardState](
      Optional.empty[LeaderboardState](), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(min(30))), false)
    val out = EventStreams.updateLeaderboard((0L, "view"),
      Iterator(ScoredEvent(1L, new Timestamp(min(10)), "view", 5.0)), st).toSeq
    assert(out.isEmpty)
    assert(st.get.scores == Map(1L -> 5.0))
  }

  test("leaderboard never resurrects state for a closed window") {
    // Window [0, 60min) with the watermark already at 70 min: its final
    // leaderboard may have fired — a straggler must not re-create state.
    val st = TestGroupState.create[LeaderboardState](
      Optional.empty[LeaderboardState](), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(min(70))), false)
    val out = EventStreams.updateLeaderboard((0L, "view"),
      Iterator(ScoredEvent(1L, new Timestamp(min(10)), "view", 5.0)), st).toSeq
    assert(out.isEmpty)
    assert(!st.exists)
  }

  test("nearDupPairs fold bounds per-bucket state to the newest BucketCap entries") {
    val st = TestGroupState.create[BucketState](
      Optional.empty[BucketState](), GroupStateTimeout.EventTimeTimeout,
      0L, Optional.of(java.lang.Long.valueOf(0L)), false)
    // Distinct fingerprints far apart — no pairs, pure state pressure.
    val rows = (1 to EventStreams.BucketCap + 50).map { i =>
      (i.toLong, new Timestamp(i * 1000L), i.toLong << 4, "0:0")
    }
    EventStreams.updateNearDups(EventStreams.BucketCap)("0:0", rows.iterator, st).length
    assert(st.get.docs.length == EventStreams.BucketCap)
    // Newest entries survive (recency window, not drop-the-key).
    assert(st.get.docs.head._1 == (EventStreams.BucketCap + 50).toLong)
  }

  test("packSequences fold: budget boundaries, straddling docs, carry-over") {
    import graft.streaming.PackState
    val st = TestGroupState.create[PackState](
      Optional.empty[PackState](), GroupStateTimeout.NoTimeout,
      0L, Optional.empty[Long](), false)
    // budget 10: doc1 (4 toks) -> seq 0; doc2 (8) starts at cum=4 -> seq 0
    // (straddles the boundary, stays in the sequence its first token
    // lands in); doc3 (2) starts at cum=12 -> seq 1. Unsorted arrival
    // order must not matter within a batch.
    val out1 = EventStreams.packFold(10L)(0,
      Iterator((3L, 2L), (1L, 4L), (2L, 8L)), st).toSeq
    assert(out1.map(p => (p.doc_id, p.seq_id)) == Seq((1L, 0L), (2L, 0L), (3L, 1L)))
    assert(st.get.cumTokens == 14L)
    // Next micro-batch resumes from the carried count: doc4 (1) at
    // cum=14 -> seq 1; doc5 (9) at cum=15 -> seq 1; doc6 at cum=24 -> seq 2.
    val out2 = EventStreams.packFold(10L)(0,
      Iterator((4L, 1L), (5L, 9L), (6L, 3L)), st).toSeq
    assert(out2.map(p => (p.doc_id, p.seq_id)) == Seq((4L, 1L), (5L, 1L), (6L, 2L)))
    assert(st.get.cumTokens == 27L)
  }

  test("nearDupPairs timeout evicts the idle bucket") {
    val st = TestGroupState.create[BucketState](
      Optional.of(BucketState(List((1L, 0L)), 0L)),
      GroupStateTimeout.EventTimeTimeout,
      0L, Optional.of(java.lang.Long.valueOf(0L)), true)
    assert(EventStreams.updateNearDups(EventStreams.BucketCap)("0:0", Iterator.empty, st).isEmpty)
    assert(!st.exists)
  }
}
