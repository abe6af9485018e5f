package graft.streaming

import java.sql.Timestamp

import graft.model.{OaiRunResult, ParsedPage}

/** ST2 — the harvest checkpoint-advance decision table, the reference's
  * hardest semantics (spec `doc/HarvesterResumptionLogic.xlsx`;
  * implementation `OaiHarvester.java:334-444`).
  *
  * This is sequential scalar state — one checkpoint row per poll — so it
  * lives in the driver as a pure, table-driven-testable function (SURVEY.md
  * §7.1), not as a distributed operator. Structured Streaming's
  * offset-commit protocol plays the role of the reference's
  * "persist headers before run-result" ordering (ST4).
  */
object OffsetStateMachine {

  /** OAI-PMH error codes with dedicated policies (ST3;
    * reference `OaiHarvester.java:63-66`). */
  val NoRecordsMatch     = "noRecordsMatch"
  val BadResumptionToken = "badResumptionToken"

  /** Decide the next `from` offset given the previous checkpoint and the
    * page just parsed.
    *
    * Branches (reference `OaiHarvester.java:351-440`):
    *  - no errors, no token in response:
    *      - last token blank        → advance to `startOfCurrentRun`
    *      - last token present      → FC3 mode: advance (FC3 omits the
    *        closing empty token — a known server bug, `:364-369`);
    *        otherwise: spec violation, keep backed-up offset (`:371-378`)
    *  - no errors, *empty* token (end of paginated list):
    *      - last token blank        → spec violation, keep backup (`:381-393`)
    *      - last token present      → advance to `startOfCurrentRun` (`:395-399`)
    *  - no errors, real token       → pagination continues, carry the old
    *    backup so an aborted pagination can be replayed (`:401-409`)
    *  - `noRecordsMatch` error      → success; advance (`:415-421`)
    *  - `badResumptionToken` error  → replay from backup (`:423-430`)
    *  - any other error             → hold offset (`:432-439`)
    */
  def nextFromTimestamp(
      last: OaiRunResult,
      page: ParsedPage,
      startOfCurrentRun: Timestamp,
      fc3CompatibilityMode: Boolean): Option[Timestamp] = {

    def lastTokenBlank = !last.hasResumptionToken
    def backup         = last.nextFromTimestamp

    if (page.errors.isEmpty) {
      page.resumptionToken match {
        case None =>
          if (lastTokenBlank) Some(startOfCurrentRun)
          else if (fc3CompatibilityMode) Some(startOfCurrentRun)
          else backup
        case Some(t) if t.trim.isEmpty =>
          if (lastTokenBlank) backup
          else Some(startOfCurrentRun)
        case Some(_) =>
          backup
      }
    } else if (page.errors.contains(NoRecordsMatch)) {
      Some(startOfCurrentRun)
    } else {
      // badResumptionToken and unknown errors both hold the backed-up
      // offset; they differ only in logging/alerting.
      backup
    }
  }

  /** Assemble the full next checkpoint row (reference
    * `OaiHarvester.java:442-443`): the new row always carries the *current*
    * response's token and expiration; only `nextFromTimestamp` follows the
    * decision table. `id` is assigned by the append sink (U3).
    */
  def advance(
      last: OaiRunResult,
      page: ParsedPage,
      startOfCurrentRun: Timestamp,
      fc3CompatibilityMode: Boolean): OaiRunResult =
    OaiRunResult(
      id = last.id + 1,
      timestampOfRun = startOfCurrentRun,
      responseDate = page.responseDate.getOrElse(startOfCurrentRun),
      resumptionToken = page.resumptionToken,
      resumptionTokenExpirationDate = page.resumptionTokenExpirationDate,
      nextFromTimestamp =
        nextFromTimestamp(last, page, startOfCurrentRun, fc3CompatibilityMode))

  /** The "no previous run" checkpoint (reference
    * `OaiRunResult.EMPTY_OAI_RUN_RESULT` analog): blank token, no offset —
    * the first request harvests the full repository. */
  val initial: OaiRunResult =
    OaiRunResult(0L, new Timestamp(0L), new Timestamp(0L), None, None, None)

  /** Columnar form of [[nextFromTimestamp]] — the same decision table as a
    * Catalyst expression, for batch-advancing checkpoints of *many*
    * independent feeds at once (one row per feed). `respTokenState` is the
    * P2 tri-state column: 'absent' | 'empty' | 'value'.
    */
  def nextFromColumn(
      lastToken: org.apache.spark.sql.Column,
      respTokenState: org.apache.spark.sql.Column,
      errorCode: org.apache.spark.sql.Column,
      backupFrom: org.apache.spark.sql.Column,
      startOfRun: org.apache.spark.sql.Column,
      fc3Mode: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val lastBlank = lastToken.isNull || trim(lastToken) === ""
    when(errorCode.isNull,
      when(respTokenState === "absent",
        when(lastBlank, startOfRun)
          .when(fc3Mode, startOfRun)
          .otherwise(backupFrom))
        .when(respTokenState === "empty",
          when(lastBlank, backupFrom).otherwise(startOfRun))
        .otherwise(backupFrom))
      .when(errorCode === NoRecordsMatch, startOfRun)
      .otherwise(backupFrom)
  }

  /** ST1 — wait-time policy in milliseconds (reference
    * `OaiHarvester.java:201-237`): first run → 0; pagination pending →
    * `minWaitMs`; clean run → poll interval minus elapsed; error or clock
    * skew → full interval. */
  def waitMillis(
      last: Option[OaiRunResult],
      lastRunFailed: Boolean,
      nowMs: Long,
      pollIntervalMs: Long,
      minWaitMs: Long): Long = last match {
    case None if !lastRunFailed => 0L
    case Some(l) if l.hasResumptionToken && !lastRunFailed => minWaitMs
    case Some(l) if !lastRunFailed =>
      val lastMs = l.timestampOfRun.getTime
      if (lastMs <= nowMs) math.max(0L, pollIntervalMs - (nowMs - lastMs))
      else pollIntervalMs // clock went backwards — be conservative
    case _ => pollIntervalMs
  }
}
