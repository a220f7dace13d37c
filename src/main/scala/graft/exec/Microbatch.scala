package graft.exec

import java.time.{Instant, ZoneOffset, ZonedDateTime}

import graft.core.BatchSize

/** Microbatch window arithmetic — semantics match the reference's
  * MicrobatchBuilder (core/dbt/materializations/incremental/
  * microbatch.py:12-181) exactly, re-expressed over java.time:
  *
  *  - offsets apply to the TRUNCATED timestamp, not the origin;
  *  - a checkpoint sitting exactly on a batch boundary increases the
  *    lookback by one (boundary-straddle correction, microbatch.py:69-74);
  *  - the final batch is clamped to the exact end time.
  *
  * All driver-side; per-batch execution filters upstream DataFrames on
  * [start, end) and overwrites that event-time window (the Spark
  * analogue of the reference's per-batch replace).
  */
object Microbatch {
  /** reference truncate_timestamp (microbatch.py:142-170). */
  def truncate(ts: Instant, bs: BatchSize): Instant = {
    val z = ts.atZone(ZoneOffset.UTC)
    val t = bs match {
      case BatchSize.Hour => ZonedDateTime.of(z.getYear, z.getMonthValue, z.getDayOfMonth, z.getHour, 0, 0, 0, ZoneOffset.UTC)
      case BatchSize.Day => ZonedDateTime.of(z.getYear, z.getMonthValue, z.getDayOfMonth, 0, 0, 0, 0, ZoneOffset.UTC)
      case BatchSize.Month => ZonedDateTime.of(z.getYear, z.getMonthValue, 1, 0, 0, 0, 0, ZoneOffset.UTC)
      case BatchSize.Year => ZonedDateTime.of(z.getYear, 1, 1, 0, 0, 0, 0, ZoneOffset.UTC)
    }
    t.toInstant
  }

  /** reference offset_timestamp (microbatch.py:100-139): truncate, then
    * step whole batch periods.
    */
  def offset(ts: Instant, bs: BatchSize, n: Int): Instant = {
    val truncated = truncate(ts, bs).atZone(ZoneOffset.UTC)
    val out = bs match {
      case BatchSize.Hour => truncated.plusHours(n.toLong)
      case BatchSize.Day => truncated.plusDays(n.toLong)
      case BatchSize.Month => truncated.plusMonths(n.toLong)
      case BatchSize.Year => truncated.plusYears(n.toLong)
    }
    out.toInstant
  }

  /** reference build_start_time (microbatch.py:43-76). */
  def buildStartTime(
      checkpoint: Option[Instant],
      isIncremental: Boolean,
      begin: Option[Instant],
      bs: BatchSize,
      lookback: Int,
      eventTimeStart: Option[Instant] = None): Instant = {
    eventTimeStart match {
      case Some(s) => truncate(s, bs)
      case None =>
        if (!isIncremental || checkpoint.isEmpty) {
          val b = begin.getOrElse(
            throw new IllegalArgumentException("microbatch model requires a 'begin' configuration"))
          truncate(b, bs)
        } else {
          val cp = checkpoint.get
          // boundary-straddle correction (microbatch.py:69-74)
          val lb = if (cp == truncate(cp, bs)) lookback + 1 else lookback
          offset(cp, bs, -lb)
        }
    }
  }

  /** reference build_end_time (microbatch.py:39-41). */
  def buildEndTime(eventTimeEnd: Option[Instant], now: Instant): Instant =
    eventTimeEnd.getOrElse(now)

  /** reference build_batches (microbatch.py:78-98): half-open windows,
    * last batch clamped to `end`.
    */
  def buildBatches(start: Instant, end: Instant, bs: BatchSize): Seq[(Instant, Instant)] = {
    val batches = scala.collection.mutable.ListBuffer[(Instant, Instant)]()
    var curStart = start
    var curEnd = offset(curStart, bs, 1)
    batches += ((curStart, curEnd))
    while (curEnd.isBefore(end)) {
      curStart = curEnd
      curEnd = offset(curStart, bs, 1)
      batches += ((curStart, curEnd))
    }
    batches.update(batches.length - 1, (batches.last._1, end))
    batches.toSeq
  }

  /** reference format_batch_start (microbatch.py:172-181): batch id for
    * logging/artifacts.
    */
  def formatBatchStart(start: Instant, bs: BatchSize): String = {
    val z = start.atZone(ZoneOffset.UTC)
    if (bs == BatchSize.Hour)
      z.toLocalDateTime.toString.replace('T', ' ')
    else z.toLocalDate.toString
  }
}
