package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{OaiRunResult, ParsedPage}
import graft.streaming.OffsetStateMachine

/** Table-driven test of every ST2/ST3 branch (mirrors the scenarios of
  * reference `OaiHarvesterTest.java:348-716`). */
class OffsetStateMachineSpec extends AnyFunSuite {

  private val start  = Timestamp.valueOf("2024-03-01 10:00:00")
  private val backup = Timestamp.valueOf("2024-02-01 00:00:00")

  private def last(token: Option[String]) = OaiRunResult(
    id = 7L, timestampOfRun = Timestamp.valueOf("2024-03-01 09:00:00"),
    responseDate = Timestamp.valueOf("2024-03-01 09:00:01"),
    resumptionToken = token, resumptionTokenExpirationDate = None,
    nextFromTimestamp = Some(backup))

  private def page(token: Option[String], errors: Map[String, String] = Map.empty) =
    ParsedPage(Some(start), token, None, errors)

  // (name, lastToken, respToken, errors, fc3, expected)
  private val cases: Seq[(String, Option[String], Option[String], Map[String, String], Boolean, Option[Timestamp])] = Seq(
    ("no token, last blank → advance",
      None, None, Map.empty, false, Some(start)),
    ("no token, last empty-string → advance",
      Some(""), None, Map.empty, false, Some(start)),
    ("no token, last real, FC3 → advance (FC3 missing-empty-token bug)",
      Some("tok"), None, Map.empty, true, Some(start)),
    ("no token, last real, strict → keep backup (spec violation)",
      Some("tok"), None, Map.empty, false, Some(backup)),
    ("empty token, last blank → keep backup (spec violation)",
      None, Some(""), Map.empty, false, Some(backup)),
    ("empty token after real token → advance (end of list)",
      Some("tok"), Some(""), Map.empty, false, Some(start)),
    ("real token → carry backup (pagination continues)",
      Some("tok"), Some("tok2"), Map.empty, false, Some(backup)),
    ("whitespace-only token treated as blank last",
      Some("   "), None, Map.empty, false, Some(start)),
    ("noRecordsMatch error → success, advance",
      Some("tok"), None, Map("noRecordsMatch" -> "m"), false, Some(start)),
    ("badResumptionToken error → replay from backup",
      Some("tok"), None, Map("badResumptionToken" -> "m"), false, Some(backup)),
    ("unknown error → hold offset",
      Some("tok"), None, Map("badArgument" -> "m"), false, Some(backup)),
    ("multiple unknown errors → hold offset",
      None, None, Map("badVerb" -> "m", "badArgument" -> "m"), false, Some(backup))
  )

  cases.foreach { case (name, lastTok, respTok, errors, fc3, expected) =>
    test(s"ST2: $name") {
      assert(OffsetStateMachine.nextFromTimestamp(
        last(lastTok), page(respTok, errors), start, fc3) == expected)
    }
  }

  test("advance() carries the current response token + expiration") {
    val exp = Timestamp.valueOf("2024-03-02 00:00:00")
    val next = OffsetStateMachine.advance(
      last(Some("old")),
      ParsedPage(Some(start), Some("new-token"), Some(exp), Map.empty),
      start, fc3CompatibilityMode = true)
    assert(next.resumptionToken.contains("new-token"))
    assert(next.resumptionTokenExpirationDate.contains(exp))
    assert(next.id == 8L)
    assert(next.timestampOfRun == start)
    assert(next.nextFromTimestamp.contains(backup)) // real token → carry backup
  }

  test("ST1: wait policy — first run 0, pagination min-wait, normal interval-elapsed, error full") {
    val now = 1000000L
    val poll = 360000L
    val minW = 1000L
    assert(OffsetStateMachine.waitMillis(None, lastRunFailed = false, now, poll, minW) == 0L)
    val paging = last(Some("tok"))
    assert(OffsetStateMachine.waitMillis(Some(paging), lastRunFailed = false, now, poll, minW) == minW)
    val normal = last(None).copy(timestampOfRun = new Timestamp(now - 100000L))
    assert(OffsetStateMachine.waitMillis(Some(normal), lastRunFailed = false, now, poll, minW) == poll - 100000L)
    assert(OffsetStateMachine.waitMillis(Some(normal), lastRunFailed = true, now, poll, minW) == poll)
  }
}
