package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The observability buffer's own failure modes (VERDICT r16 item 4): the
  * surface built to kill silent decisions must not fail silently one level
  * up — a clipped buffer plants a sentinel, the cap holds strictly, and
  * clear() releases the session's records.
  */
class RuleDiagSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestHarness.spark

  test("past MaxRecords the buffer clips WITH a sentinel, and the cap holds strictly") {
    val s = spark.newSession()
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(s)
    try {
      val plan = s.range(1).queryExecution.logical
      // MaxRecords + 50 DISTINCT records (distinct reasons — the dedup
      // key includes the reason, so every call is a new record)
      (1 to RuleDiag.MaxRecords + 50).foreach(i =>
        RuleDiag.record("t", "fired", s"r$i", plan))
      val recs = RuleDiag.records(s)
      val real = recs.filterNot(_._1 == "_buffer")
      assert(real.map(_._4).sum == RuleDiag.MaxRecords.toLong,
        s"cap not strict: ${real.map(_._4).sum} real records")
      assert(recs.contains(("_buffer", "clipped", "max-records", 1L)),
        s"clipped buffer carries no sentinel: ${recs.take(5)}")
      // the frame surfaces the sentinel too — the operator-facing read
      val frame = RuleDiag.frame(s).collect()
      assert(frame.exists(r => r.getString(0) == "_buffer" &&
        r.getString(1) == "clipped" && r.getString(2) == "max-records"))
    } finally {
      RuleDiag.clear(s)
      prev match {
        case Some(p) => SparkSession.setActiveSession(p)
        case None => SparkSession.clearActiveSession()
      }
    }
    assert(RuleDiag.records(s).isEmpty, "clear() left records behind")
  }

  test("a session's buffer is weakly keyed — no recording happens without an active session") {
    // the defensive no-active-session path: record() must be a no-op, not
    // an NPE (rules only run inside withActive, but the buffer is public
    // surface via Graft.enableRuleDiagnostics)
    val s = spark.newSession()
    // build the probe plan BEFORE clearing the active session (DataFrame
    // construction re-activates its own session internally)
    val plan = spark.range(1).queryExecution.logical
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    try {
      RuleDiag.record("t", "fired", "no-session", plan)
      assert(RuleDiag.records(s).isEmpty)
    } finally prev.foreach(SparkSession.setActiveSession)
  }
}
