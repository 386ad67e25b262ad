package graft.streaming

import java.time.{Instant, ZoneId, ZoneOffset}

/** The reference's push-mode schedule grammar (extensions.sql:29-57
  * passes `v_schedule` straight to `cron.schedule`): either a pg_cron
  * interval string (`'30 seconds'`) or a standard 5-field cron
  * expression (`'0-59/2 * * * *'`, `'0 9 * * mon-fri'`). Parsed here into
  * a [[Schedule]] the push layer maps onto Spark: intervals become
  * `Trigger.ProcessingTime`, cron expressions drive a [[CronRunner]]
  * computing exact next-fire times (Structured Streaming has no cron
  * trigger; a driver-side timer firing one pull+post per tick is
  * exactly what pg_cron does with the reference's scheduled statement).
  */
sealed trait Schedule
object Schedule {

  /** Fixed-interval schedule (`'N seconds'` / minutes / hours). */
  final case class Every(ms: Long) extends Schedule

  /** 5-field cron: sets of admissible values per field, plus whether
    * day-of-month/day-of-week were written as `*` — vixie/pg_cron
    * semantics say a restricted dom and dow combine with OR, while an
    * unrestricted one imposes nothing.
    */
  final case class Cron(minute: Set[Int], hour: Set[Int], dom: Set[Int],
                        month: Set[Int], dow: Set[Int],
                        domStar: Boolean, dowStar: Boolean) extends Schedule {

    private def matches(t: java.time.ZonedDateTime): Boolean = {
      // vixie rule: the star FLAGS pick AND vs OR, the value SETS
      // always apply — '*/2' is star-flagged AND restricted, so
      // '0 0 */2 * mon' means (odd dom) AND (monday), while
      // '0 0 13 * fri' (neither star) means (13th) OR (friday)
      val d = dom(t.getDayOfMonth)
      val w = dow(t.getDayOfWeek.getValue % 7) // java MON=1..SUN=7 → cron SUN=0
      val dayOk = if (domStar || dowStar) d && w else d || w
      minute(t.getMinute) && hour(t.getHour) && month(t.getMonthValue) && dayOk
    }

    /** First fire time strictly after `epochMs`, minute resolution. */
    def nextAfter(epochMs: Long, zone: ZoneId = ZoneOffset.UTC): Long = {
      var t = Instant.ofEpochMilli(epochMs).atZone(zone)
        .withSecond(0).withNano(0).plusMinutes(1)
      var steps = 0
      val maxSteps = 5 * 366 * 24 * 60 // 5 years of minutes — any valid cron fires by then
      while (!matches(t)) {
        // skip in coarse units when a coarse field already excludes the
        // candidate, so sparse schedules don't walk minute-by-minute
        if (!month(t.getMonthValue))
          t = t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
        else if (!hour(t.getHour)) t = t.plusHours(1).withMinute(0)
        else t = t.plusMinutes(1)
        steps += 1
        if (steps > maxSteps)
          throw new IllegalArgumentException(s"cron expression never fires: $this")
      }
      t.toInstant.toEpochMilli
    }
  }

  private val IntervalRe = """(?i)\s*(\d+)\s+(second|minute|hour)s?\s*""".r
  private val monthNames = Seq("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec").zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
  private val dowNames = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    .zipWithIndex.toMap

  def parse(s: String): Schedule = s match {
    case IntervalRe(n, unit) =>
      val ms = unit.toLowerCase match {
        case "second" => n.toLong * 1000L
        case "minute" => n.toLong * 60000L
        case "hour"   => n.toLong * 3600000L
      }
      require(ms > 0, s"schedule interval must be positive: '$s'")
      Every(ms)
    case _ =>
      val fields = s.trim.split("""\s+""")
      require(fields.length == 5,
        s"schedule must be 'N seconds|minutes|hours' or 5-field cron, got: '$s'")
      def field(raw: String, lo: Int, hi: Int,
                names: Map[String, Int] = Map.empty): (Set[Int], Boolean) = {
        // vixie sets the star flag for ANY field beginning with '*'
        // (including '*/n') — the dom/dow OR rule keys off this, so
        // '0 0 */2 * mon' must fire Mondays-on-odd-days (AND), not
        // every odd day OR Monday
        val star = raw == "*" || raw.startsWith("*/")
        def atom(a: String): Int = names.getOrElse(a.toLowerCase,
          a.toIntOption.getOrElse(
            throw new IllegalArgumentException(s"bad cron atom '$a' in '$s'")))
        val vals = raw.split(",").flatMap { item =>
          val (rangePart, step) = item.split("/") match {
            case Array(r)     => (r, 1)
            case Array(r, st) => (r, st.toIntOption.getOrElse(
              throw new IllegalArgumentException(s"bad cron step '$st' in '$s'")))
            case _ => throw new IllegalArgumentException(s"bad cron item '$item' in '$s'")
          }
          val (a, b) = rangePart match {
            case "*" => (lo, hi)
            case r if r.contains("-") =>
              val Array(x, y) = r.split("-", 2); (atom(x), atom(y))
            case r => val v = atom(r); if (step == 1) (v, v) else (v, hi)
          }
          require(a >= lo && b <= hi && a <= b,
            s"cron value out of range [$lo,$hi] in '$item' ('$s')")
          (a to b by step).toSeq
        }.toSet
        require(vals.nonEmpty, s"empty cron field '$raw' in '$s'")
        (vals, star)
      }
      val (mi, _)        = field(fields(0), 0, 59)
      val (h, _)         = field(fields(1), 0, 23)
      val (dm, dmStar)   = field(fields(2), 1, 31)
      val (mo, _)        = field(fields(3), 1, 12, monthNames)
      // 7 = Sunday alias: normalize to 0
      val (dwRaw, dwStar) = field(fields(4), 0, 7, dowNames)
      val dw = dwRaw.map(v => if (v == 7) 0 else v)
      Cron(mi, h, dm, mo, dw, dmStar, dwStar)
  }
}

/** Driver-side timer firing `action` at each schedule tick — the
  * pg_cron analogue for schedules `Trigger.ProcessingTime` cannot
  * express (and, with an injected clock, for virtual-time tests of
  * interval schedules too). `next` maps a now-epoch-ms to the next
  * fire time. Clock and sleeper are injectable so tests run on
  * virtual time. A failing action is logged and the loop keeps firing
  * (pg_cron records the failed run and fires again next tick).
  */
final class CronRunner(next: Long => Long,
                       action: () => Unit,
                       clock: () => Long = () => System.currentTimeMillis(),
                       sleeper: Long => Unit = Thread.sleep) {
  @volatile private var stopped = false
  private val thread = new Thread(() => {
    while (!stopped) {
      val now = clock()
      val fireAt = next(now)
      try sleeper(math.max(0L, fireAt - now))
      catch { case _: InterruptedException => () }
      if (!stopped)
        try action()
        catch { case t: Throwable =>
          System.err.println(s"[cron] scheduled push failed (will refire): $t")
        }
    }
  }, s"graft-cron-runner")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }
  def stop(): Unit = { stopped = true; thread.interrupt() }
}

object CronRunner {
  def apply(cron: Schedule.Cron, action: () => Unit,
            clock: () => Long = () => System.currentTimeMillis(),
            sleeper: Long => Unit = Thread.sleep,
            zone: ZoneId = ZoneOffset.UTC): CronRunner =
    new CronRunner(now => cron.nextAfter(now, zone), action, clock, sleeper)

  def every(ms: Long, action: () => Unit,
            clock: () => Long, sleeper: Long => Unit): CronRunner =
    new CronRunner(now => now + ms, action, clock, sleeper)
}
