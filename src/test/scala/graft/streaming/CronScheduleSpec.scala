package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.time.ZoneOffset

/** Schedule grammar parity with the reference's pg_cron strings
  * (extensions.sql:29-57): interval form and 5-field cron, including
  * steps, ranges, names, the 7=Sunday alias, and the vixie dom/dow OR
  * rule. Pure — no Spark.
  */
class CronScheduleSpec extends AnyFunSuite {

  private def cron(s: String) = Schedule.parse(s).asInstanceOf[Schedule.Cron]

  /** epoch ms of a UTC instant */
  private def utc(y: Int, mo: Int, d: Int, h: Int, mi: Int): Long =
    java.time.LocalDateTime.of(y, mo, d, h, mi)
      .toInstant(ZoneOffset.UTC).toEpochMilli

  test("interval grammar: the reference default '1 seconds' and friends") {
    assert(Schedule.parse("1 seconds") === Schedule.Every(1000L))
    assert(Schedule.parse("30 seconds") === Schedule.Every(30000L))
    assert(Schedule.parse("5 minutes") === Schedule.Every(300000L))
    assert(Schedule.parse("2 hours") === Schedule.Every(7200000L))
  }

  test("5-field cron parses steps, ranges, lists, and names") {
    val c = cron("*/15 2-4 1,15 jan,jul mon-fri")
    assert(c.minute === Set(0, 15, 30, 45))
    assert(c.hour === Set(2, 3, 4))
    assert(c.dom === Set(1, 15))
    assert(c.month === Set(1, 7))
    assert(c.dow === Set(1, 2, 3, 4, 5))
    assert(!c.domStar && !c.dowStar)
  }

  test("7 is an alias for Sunday") {
    assert(cron("0 0 * * 7").dow === Set(0))
  }

  test("next fire: every-15-minutes rounds up to the next slot") {
    val c = cron("*/15 * * * *")
    assert(c.nextAfter(utc(2026, 8, 12, 10, 7)) === utc(2026, 8, 12, 10, 15))
    // strictly after: AT a slot boundary the next slot wins
    assert(c.nextAfter(utc(2026, 8, 12, 10, 15)) === utc(2026, 8, 12, 10, 30))
    assert(c.nextAfter(utc(2026, 8, 12, 10, 50)) === utc(2026, 8, 12, 11, 0))
  }

  test("next fire: weekday-at-9 skips the weekend") {
    val c = cron("0 9 * * 1-5")
    // 2026-08-14 is a Friday; after its 09:00 the next is Monday the 17th
    assert(c.nextAfter(utc(2026, 8, 14, 9, 0)) === utc(2026, 8, 17, 9, 0))
  }

  test("vixie rule: restricted dom OR dow fires on either") {
    val c = cron("0 0 13 * fri") // 13th of the month OR any Friday
    // from Wed 2026-08-12: Thursday the 13th matches dom
    assert(c.nextAfter(utc(2026, 8, 12, 1, 0)) === utc(2026, 8, 13, 0, 0))
    // from the 13th: Friday the 14th matches dow
    assert(c.nextAfter(utc(2026, 8, 13, 1, 0)) === utc(2026, 8, 14, 0, 0))
  }

  test("month rollover and sparse months step coarsely, not minute-by-minute") {
    val c = cron("30 6 1 dec *")
    assert(c.nextAfter(utc(2026, 8, 12, 0, 0)) === utc(2026, 12, 1, 6, 30))
  }

  test("vixie star flag: '*/2' dom is star-flagged AND restricted") {
    val c = cron("0 0 */2 * mon")
    assert(c.domStar, "*/2 must keep the star flag (vixie first-char rule)")
    // star-flagged dom + restricted dow → AND: the next midnight that
    // is BOTH a Monday and an odd day-of-month. From Wed 2026-08-12
    // that is Monday Aug 17 — under the (incorrect) OR rule it would
    // have been Thu Aug 13 (odd dom alone).
    assert(c.nextAfter(utc(2026, 8, 12, 1, 0)) === utc(2026, 8, 17, 0, 0))
  }

  test("malformed schedules are rejected") {
    intercept[IllegalArgumentException](Schedule.parse("whenever"))
    intercept[IllegalArgumentException](Schedule.parse("61 * * * *"))
    intercept[IllegalArgumentException](Schedule.parse("* * * * * *"))
    intercept[IllegalArgumentException](Schedule.parse("0 25 * * *"))
  }

  test("CronRunner fires on virtual-time ticks and stops cleanly") {
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    val vclock = new java.util.concurrent.atomic.AtomicLong(utc(2026, 8, 12, 10, 0))
    val runner = CronRunner(cron("* * * * *"), () => fired.incrementAndGet(),
      clock = () => vclock.get(),
      sleeper = ms => { vclock.addAndGet(ms); Thread.sleep(1) })
    runner.start()
    val deadline = System.currentTimeMillis() + 10000
    while (fired.get() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(5)
    runner.stop()
    assert(fired.get() >= 3, s"runner fired only ${fired.get()} times")
  }
}
