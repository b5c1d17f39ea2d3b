package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SparkEntry.benchNames) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Each query is forced end-to-end with a `noop` format write so every
  * column is materialized (a bare .count() would let Catalyst prune the
  * aggregates away).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.benchNames
    val qmap = SparkEntry.allQueries
    // Standard warmup-then-measure methodology: the first execution of a
    // plan pays one-off Janino codegen compilation + JVM JIT of the
    // generated classes (3-6x the steady-state time for the HOF-heavy text
    // plans). A long-running engine runs every plan shape many times, so
    // the steady-state number is the representative one; the warmup run
    // is executed identically (same noop sink, full materialization) and
    // IMMEDIATELY before its timed run — a single up-front warmup pass
    // left 15 queries between q01's warmup and its measurement, enough
    // for JIT/code-cache state to decay (the r4 q01/q03 drift).
    def runOnce(name: String): Boolean =
      try { qmap(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
    // SESSION-LEVEL contamination gauge (r9 lesson): per-query respread
    // catches VARIANCE, but steady external load (a background sweep, a
    // judge re-run) biases both runs of every query TOGETHER — the r9
    // artifact read 27.8 s against a 15.0 s idle truth with per-query
    // spreads under 15%. Two instruments make that bias evident in the
    // artifact itself: /proc/loadavg at start and end, and a fixed
    // CPU-bound canary (sum of xxhash64 over a 200M-row range — no I/O,
    // no shuffle, fixed 32-way parallelism, data-independent) timed at
    // start and end. A canary reading beyond 1.5x its known idle time
    // marks the WHOLE artifact session-contaminated.
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(",")
      catch { case _: Throwable => "" }
    def load1(s: String): Double =
      s.split(",").headOption.flatMap(x =>
        scala.util.Try(x.toDouble).toOption).getOrElse(0.0)
    // Whole-box busy CPU (user+nice+system+irq+softirq+steal jiffies,
    // USER_HZ=100) minus THIS JVM's CPU over the same window = CPU burned
    // by OTHER processes during the bench. The r11 artifact inflated 25%
    // (ls08 +69%, tr02 +64% vs the same round's idle pair) while the
    // start/end canary read clean — the contention was multi-core and
    // intermittent, invisible to two point samples. A whole-window
    // foreign-CPU integral cannot miss it.
    def busyJiffies: Long =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines()
          .next().trim.split("\\s+")
        Seq(1, 2, 3, 6, 7, 8).map(i => f.lift(i).map(_.toLong).getOrElse(0L)).sum
      } catch { case _: Throwable => -1L }
    def processCpuNanos: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }
    def canary(): Double = {
      import org.apache.spark.sql.functions.expr
      def once(): Double = {
        val t0 = System.nanoTime()
        // bit_xor, not sum: a 200M-term long sum overflows under ANSI
        // collect-bound: canary: fixed 200M-row codegen probe; 32 longs reach the driver
        spark.range(0, 200000000L, 1, 32).select(expr("bit_xor(xxhash64(id))")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      // three warmups: the canary's codegen path needs more JIT passes
      // than one (a single-warmup start reading measured 0.33 s against
      // a 0.11 s steady state — that cold bias would eat the 1.5x gate)
      once(); once(); once()
      math.min(once(), once())
    }
    // MACHINE-SPEED canary (r13 verdict task 1). The contamination
    // gauges above answer "did something else run during the window?";
    // none of them can see the box itself being SLOWER — shared-host
    // frequency/memory-bandwidth drift moved both r12 and r13 binaries
    // 10–20% between windows while every cause bit read clean (the
    // judge's same-window A/B proved the engine regression-free). This
    // canary measures the machine with fixed, deterministic work so
    // cross-round totals can be compared in normalized units:
    //  - CPU+memory leg: FNV-1a over a fixed 64 MiB deterministic
    //    buffer, 2 passes, single-thread — pure core frequency plus
    //    streaming memory bandwidth, no allocation in the timed loop;
    //  - shuffle leg: one fixed 4M-row 32-partition hash exchange +
    //    aggregation — the multicore shuffle machinery every bench
    //    query exercises (serialization, exchange write/read).
    // Each leg: JIT warmups, then min of 3 timed runs; the sample is
    // the SUM of the two leg minima. Taken at window start and end;
    // total_normalized = total × (speed_ref / mean(start, end)). The
    // raw samples ride in the artifact so a reader can re-normalize
    // against a re-calibrated reference if the hardware changes.
    //
    // ANCHOR: 0.63 s = the mean of six canary samples across the three
    // all-bits-false idle runs of the r14 round-close protocol
    // (0.564–0.737 s; raw totals 16.3–18.0 s), so normalized totals
    // read in round-14-close-box units. Measured limitation, recorded
    // in STRESS_r14.md §4: within a clean window the canary's own
    // sample spread (~±13%) is the same order as the ±10% clean-window
    // total drift, so the normalization corrects GROSS machine-speed
    // shifts (the ≥1.5x slow-window class the r13 judge hit) rather
    // than sharpening the clean band.
    val SpeedRefSec = sys.env.getOrElse("SPARK_GRAFT_SPEED_REF", "0.63").toDouble
    val speedBuf: Array[Byte] = {
      val b = new Array[Byte](64 << 20)
      var i = 0
      while (i < b.length) { b(i) = ((i * 31 + 7) & 0xff).toByte; i += 1 }
      b
    }
    def fnvLegOnce(): Long = {
      var h = 0xcbf29ce484222325L
      var pass = 0
      while (pass < 2) {
        var i = 0
        while (i < speedBuf.length) {
          h = (h ^ (speedBuf(i) & 0xffL)) * 0x100000001b3L
          i += 1
        }
        pass += 1
      }
      h
    }
    // blackhole: publish the fold result so the JIT cannot dead-code
    // the loop; volatile write is ordered but costs nothing per-sample
    @volatile var speedSink = 0L
    def speedCanary(): Double = {
      def timed(work: () => Unit): Double = {
        val t0 = System.nanoTime(); work(); (System.nanoTime() - t0) / 1e9
      }
      val fnv = () => { speedSink = fnvLegOnce() }
      import org.apache.spark.sql.functions.{col, expr}
      val shuffle = () => {
        // collect-bound: canary: fixed 4M-row exchange probe; one long reaches the driver
        spark.range(0, 4000000L, 1, 32).repartition(32, col("id"))
          .agg(expr("bit_xor(xxhash64(id))")).collect(): Unit
      }
      fnv(); shuffle(); shuffle() // JIT/codegen warmups, untimed
      // min of THREE per leg: with min-of-2 the sample spread across
      // clean idle runs measured ±15% (0.55–0.74 s) while the raw bench
      // totals they normalize differed 2.5% — the min estimator needs
      // one more draw to reliably catch an unloaded-turbo sample; the
      // extra draw costs < 1 s per canary, outside the window
      def min3(work: () => Unit): Double =
        Seq(timed(work), timed(work), timed(work)).min
      min3(fnv) + min3(shuffle)
    }
    // Idle reference for the canary on this box (local[32], measured
    // unloaded; see STRESS_r10.md). The artifact records the raw
    // readings too, so a reader can re-judge against a re-calibrated
    // idle if the hardware changes.
    // 0.20 splits the two idle readings measured on this box (start
    // ~0.21 s — residual JIT tiers — vs end ~0.14 s), so the 1.5x gate
    // (0.30 s) stays clear of idle noise yet trips on the ~2x slowdown
    // a concurrent 32-thread sweep inflicts on a CPU-bound 32-task job.
    val CanaryIdleSec = sys.env.getOrElse("SPARK_GRAFT_CANARY_IDLE", "0.20").toDouble
    // CPU jiffies (utime+stime) of one pid. Parsed past the LAST ')':
    // the comm field may itself contain spaces or parentheses, so
    // naive whitespace splitting from the front misaligns every later
    // field. After the ')' the remainder is space-separated with
    // state at index 0, ppid at 1, utime at 11, stime at 12.
    def procStatTail(pid: Long): Array[String] =
      try {
        val s = scala.io.Source.fromFile(s"/proc/$pid/stat").mkString
        s.substring(s.lastIndexOf(')') + 2).split(" ")
      } catch { case _: Throwable => Array.empty }
    // (jiffies, starttime): starttime (field 22, tail index 19) is the
    // pid-reuse guard — a pid whose start tick changed between the two
    // window samples is a DIFFERENT process, and its (possibly large)
    // CPU must not be subtracted as "harness" from the foreign gauge
    // field parsing under Try (r13 ADVICE): procStatTail only guards
    // the file READ — a malformed tail field would otherwise throw
    // NumberFormatException out of the gauge and kill the whole bench;
    // a broken gauge must degrade (0 jiffies / no ancestor), never
    // abort the measurement run
    def procJiffies(pid: Long): (Long, Long) = {
      val f = procStatTail(pid)
      if (f.length > 19)
        scala.util.Try((f(11).toLong + f(12).toLong, f(19).toLong))
          .getOrElse((0L, -1L))
      else (0L, -1L)
    }
    def ppidOf(pid: Long): Long = {
      val f = procStatTail(pid)
      if (f.length > 1) scala.util.Try(f(1).toLong).getOrElse(0L) else 0L
    }
    // The launcher chain above this JVM (sbt runner, its shell, the
    // harness process): their CPU is HARNESS overhead, not foreign
    // contention — an sbt launcher polling its forked child burns
    // real jiffies inside the bench window and would otherwise count
    // against the foreign-cores gate (the r12 ADVICE false-positive
    // mode). Snapshot the chain once; a pid that exits mid-window
    // reads 0 later, so per-pid deltas are clamped at >= 0.
    val ancestorPids: Seq[Long] = {
      val buf = scala.collection.mutable.ListBuffer.empty[Long]
      var pid = ppidOf(ProcessHandle.current().pid())
      while (pid > 1L && buf.length < 16) { buf += pid; pid = ppidOf(pid) }
      buf.toList
    }
    def ancestorJiffies: Map[Long, (Long, Long)] =
      ancestorPids.map(p => p -> procJiffies(p)).toMap
    // Live non-harness CPU over a short idle interval, computed with
    // the SAME subtraction the window gauge uses (whole-box busy minus
    // this idle JVM minus launcher ancestors), so the settle loop
    // below waits on exactly the quantity suspect_foreign trips on.
    def foreignSample(sec: Int): Double = {
      val b0 = busyJiffies; val p0 = processCpuNanos; val a0 = ancestorJiffies
      Thread.sleep(sec * 1000L)
      val b1 = busyJiffies; val p1 = processCpuNanos; val a1 = ancestorJiffies
      val anc = ancestorPids.map { p =>
        val (j0, s0) = a0.getOrElse(p, (0L, -1L))
        val (j1, s1) = a1.getOrElse(p, (0L, -2L))
        if (s0 == s1 && s0 >= 0) math.max(0L, j1 - j0) else 0L
      }.sum / 100.0
      if (b0 < 0 || b1 < 0 || p0 < 0 || p1 < 0) 0.0
      else math.max(0.0, ((b1 - b0) / 100.0 - (p1 - p0) / 1e9 - anc) / sec)
    }
    // SETTLE before opening the window (r12 verdict task 1): two known
    // FALSE-POSITIVE-adjacent modes on the bench's own launch path,
    // both waited out while this JVM idles, both bounded by one budget:
    //  - STALE loadavg — sbt's compile burst (or a just-finished gate
    //    run) sits in the 1-min average, which decays with a ~60 s time
    //    constant (exactly BENCH_r12: loadavg_start 2.16, canaries and
    //    foreign clean; 2.16 -> 1.0 takes ~46 s of idling);
    //  - LIVE kernel churn below the loadavg gate — after a multi-GB
    //    write/delete (the driver runs this bench right after its
    //    Verify), reclaim/writeback kworkers burn ~a core for minutes
    //    with 1-min loadavg already < 1.0 (measured r13: foreign 0.80
    //    cores at loadavg_start 0.96-0.97) and would trip
    //    suspect_foreign honestly but avoidably. Each 5 s idle probe
    //    here doubles as the wait; <= 0.25 cores (half the window
    //    gate) twice the sampling noise floor opens the window.
    // Genuine persistent contention survives the budget and then trips
    // the gate for the right reason. Budget 240 s covers start loads
    // to ~e^4 and the observed reclaim tails.
    val SettleMaxSec = sys.env.getOrElse("SPARK_GRAFT_SETTLE_MAX", "240").toInt
    var settleSec = 0
    var settled = false
    while (!settled && settleSec < SettleMaxSec) {
      if (load1(loadavg) > 1.0) {
        Thread.sleep(5000); settleSec += 5
      } else {
        val f = foreignSample(5); settleSec += 5
        settled = f <= 0.25
      }
    }
    // loadavg snapshot BEFORE the speed canary: loadavg carries a ~60 s
    // memory, so the canary's own multicore shuffle legs would push a
    // settled ~0.9 over the 1.0 gate and trip suspect_loadavg on the
    // bench's own pre-window work (observed: settle passed clean in 5 s,
    // canary ran, loadavg_start read 1.02 → false trip). The
    // differential gauges (busy/proc/ancestor jiffies) are immune to
    // prior burn and stay after the canary.
    val loadStart = loadavg
    // speed sample OUTSIDE the window (before the jiffy gauges
    // snapshot): its CPU burn must not ride in the window's wall or
    // dilute foreign-CPU
    val speedStart = speedCanary()
    val busyStart = busyJiffies
    val procStart = processCpuNanos
    val ancStart = ancestorJiffies
    val wallStart = System.nanoTime()
    // one untimed pipeline warm-up (scan + shuffle machinery, parquet
    // footers, codegen of the most common operators) before any timing
    names.headOption.foreach(runOnce)
    val canaryStart = canary()
    // A failed query is recorded as a NEGATIVE time (sentinel) and listed
    // under "failed" — never as a fast success that silently shrinks the
    // headline total.
    def timed(name: String): (Boolean, Double) = {
      val t0 = System.nanoTime()
      val ok = runOnce(name)
      (ok, (System.nanoTime() - t0) / 1e9)
    }
    // A query's recorded spread = 2nd-fastest / fastest − 1 over its
    // timed runs. Above this, the measurement is judged ambient-load
    // contaminated and earns extra runs (below: re-runs, r8 lesson).
    val SpreadGate = 0.40
    val MaxRuns = 6
    // MID-WINDOW canary (r11 lesson): start/end canaries bracket the
    // window but sample two instants; contention that starts after the
    // first and ends before the last reads clean. One more sample at
    // the window's midpoint cuts the blind interval in half; the
    // whole-window foreign-CPU integral (above) closes it entirely.
    var canaryMid = -1.0
    val results = names.zipWithIndex.map { case (name, qi) =>
      if (qi == names.length / 2) canaryMid = canary()
      runOnce(name) // adjacent warmup: JIT-hot when the clock starts
      // measure TWICE and report the min: single timed runs on a busy
      // 32-thread box jitter +-30% (GC pauses, code-cache churn); the
      // min of two is a far steadier steady-state estimate and is still
      // a full end-to-end noop-sink execution.
      //
      // CONTAMINATION GUARD (r8 lesson): twice in two rounds the
      // recorded artifact misreported — both timed runs landed while
      // the box was busy with something else (d04 read 9.09 s against
      // a true 0.95 s; its own 184% spread said so, but the protocol
      // didn't act on it). Now it acts: while the best two runs still
      // disagree by > SpreadGate, keep re-running (up to MaxRuns);
      // a query that never stabilizes is listed in "contaminated" so
      // no reader can mistake its number for a steady-state time.
      var runs = List(timed(name), timed(name))
      def best2 = runs.filter(_._1).map(_._2).sorted.take(2)
      def spreadOf = best2 match {
        case List(a, b) if a > 0 => b / a - 1.0
        case _ => 0.0
      }
      while (runs.forall(_._1) && spreadOf > SpreadGate && runs.length < MaxRuns)
        runs = timed(name) :: runs
      val ok = runs.forall(_._1)
      // report min on success, max on failure — and PRINT the same
      // number the JSON records, so logs and artifacts reconcile
      val dt = if (ok) best2.head else runs.map(_._2).max
      val spread = if (ok) spreadOf else 0.0
      val flagged = ok && spread > SpreadGate
      System.err.println(f"[bench] $name: $dt%.2f s (spread ${spread * 100}%.0f%%, ${runs.length} runs)"
        + (if (flagged) " (CONTAMINATED)" else "")
        + (if (ok) "" else " (FAILED)"))
      (name, if (ok) dt else -dt, spread, flagged)
    }
    // 3-decimal times keep the JSON line short: the driver captures only
    // a bounded tail of the output, and full-precision doubles pushed the
    // line's head out of that window (every round's artifact had
    // parsed: None with the line's opening brace truncated away).
    // Locale.ROOT pins the decimal separator: a default locale with
    // comma decimals (de_DE) would emit "value":12,345 — invalid JSON.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v, _, _) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Queries whose best two runs never agreed within SpreadGate even
    // after MaxRuns: their times are upper bounds, not measurements.
    val contaminated = results.collect { case (k, _, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Ambient-noise gauge for round-over-round comparison: the median
    // per-query spread. A whole-suite delta smaller than this is box
    // noise, not a plan change (the r7 uniform x1.2 shift).
    val spreads = results.map(_._3).sorted
    val noise = if (spreads.isEmpty) 0.0 else spreads(spreads.length / 2)
    val canaryEnd = canary()
    val loadEnd = loadavg
    val sessionContaminated =
      canaryStart > 1.5 * CanaryIdleSec || canaryEnd > 1.5 * CanaryIdleSec ||
        (canaryMid >= 0 && canaryMid > 1.5 * CanaryIdleSec)
    // Foreign CPU burned during the window, averaged to cores: busy
    // jiffies are whole-box; subtract this JVM's CPU AND the launcher
    // ancestors' (sbt runner polling its forked child — harness
    // overhead, not contention); the remainder is other processes.
    // An idle box's daemons read ~0.01-0.05 cores; a concurrent sweep
    // reads multiple cores. -1 when /proc/stat or the CPU bean is
    // unavailable (gauge off). Jiffy->second conversion assumes
    // USER_HZ=100 — fixed at 100 for /proc on every mainstream Linux
    // ABI (the kernel rescales internal HZ to USER_HZ exactly so this
    // constant holds); a hypothetical non-100 box would scale the
    // gauge linearly, visible against the recorded loadavg.
    val wallSec = (System.nanoTime() - wallStart) / 1e9
    val busyEnd = busyJiffies
    val procEnd = processCpuNanos
    val ancEnd = ancestorJiffies
    // per-pid clamp: an ancestor that exited mid-window reads 0 at the
    // end, so a raw delta would go negative and INFLATE foreign; and
    // an exited pid RE-USED by some busy foreign process would read a
    // large positive delta and DEFLATE foreign below the gate — the
    // starttime must match for the delta to count as harness CPU
    val ancestorSec = ancestorPids.map { p =>
      val (j0, s0) = ancStart.getOrElse(p, (0L, -1L))
      val (j1, s1) = ancEnd.getOrElse(p, (0L, -2L))
      if (s0 == s1 && s0 >= 0) math.max(0L, j1 - j0) else 0L
    }.sum / 100.0
    val foreignCores =
      if (busyStart < 0 || busyEnd < 0 || procStart < 0 || procEnd < 0 || wallSec <= 0) -1.0
      else math.max(0.0,
        ((busyEnd - busyStart) / 100.0 - (procEnd - procStart) / 1e9 - ancestorSec) / wallSec)
    // WINDOW-SUSPECT verdict, CAUSE-CODED (r12 verdict task 1): three
    // independent bits, OR'd into the headline flag a reader checks
    // first. Cause-coding exists because the causes fail differently:
    //  - suspect_canary — a canary sample beyond 1.5x idle (the r8/r9
    //    class: steady load slowing every query). Direct evidence.
    //  - suspect_loadavg — 1-min loadavg > 1.0 at window START after
    //    the settle budget: load in the preceding minute that never
    //    decayed. Trips on LIVE ambient load; stale self-load is
    //    absorbed by the settle loop above. Weakest bit: it cannot
    //    name the process, so read it WITH the other two — loadavg
    //    tripped + canary/foreign clean (BENCH_r12's exact shape) was
    //    a pre-window burst, not window contamination.
    //  - suspect_foreign — non-harness processes averaging > 0.5
    //    cores across the window (the multi-core intermittent class
    //    point canaries miss; validated under a deliberate 8-way hog,
    //    STRESS_r12 §3). Launcher ancestors excluded; an unrelated
    //    SIBLING process (another sbt on this box) still counts —
    //    deliberately, since the gauge cannot tell it from a sweep.
    val load1Start = load1(loadStart)
    val suspectCanary = sessionContaminated
    val suspectLoadavg = load1Start > 1.0
    val suspectForeign = foreignCores > 0.5
    val windowSuspect = suspectCanary || suspectLoadavg || suspectForeign
    // end speed sample after the window gauges close (same reason the
    // start sample precedes them); normalize on the MEAN of the two —
    // machine-speed drift is slow relative to the window, so the mean
    // estimates the window's prevailing speed, while a min would hide
    // a window that started fast and degraded
    val speedEnd = speedCanary()
    val speedMean = (speedStart + speedEnd) / 2.0
    val totalNormalized =
      if (speedMean > 0) total * (SpeedRefSec / speedMean) else -1.0
    System.err.println(f"[bench] canary start ${canaryStart}%.3f / mid ${canaryMid}%.3f"
      + f" / end ${canaryEnd}%.3f s (idle ref ${CanaryIdleSec}%.2f s),"
      + f" speed ${speedStart}%.3f/${speedEnd}%.3f s (ref ${SpeedRefSec}%.2f s"
      + f" -> total ${total}%.2f s normalized ${totalNormalized}%.2f s),"
      + f" loadavg $loadStart -> $loadEnd, foreign ${foreignCores}%.2f cores"
      + f" (harness ${ancestorSec}%.1f s), settle $settleSec s"
      + (if (suspectCanary) " (SESSION CONTAMINATED)" else "")
      + (if (windowSuspect) " (WINDOW SUSPECT:"
           + (if (suspectCanary) " canary" else "")
           + (if (suspectLoadavg) " loadavg" else "")
           + (if (suspectForeign) " foreign" else "") + ")"
         else ""))
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","total_normalized":${r3(totalNormalized)},"speed_canary_sec":[${r3(speedStart)},${r3(speedEnd)}],"speed_ref_sec":${r3(SpeedRefSec)},"queries":$qs,"failed":$failed,"contaminated":$contaminated,"protocol":"warmup+min-of-2+respread","median_run_spread":${r3(noise)},"canary_sec":[${r3(canaryStart)},${r3(canaryMid)},${r3(canaryEnd)}],"canary_idle_sec":${r3(CanaryIdleSec)},"session_contaminated":$sessionContaminated,"foreign_cpu_cores_avg":${r3(foreignCores)},"window_suspect":$windowSuspect,"suspect_canary":$suspectCanary,"suspect_loadavg":$suspectLoadavg,"suspect_foreign":$suspectForeign,"settle_sec":$settleSec,"loadavg_start":"$loadStart","loadavg_end":"$loadEnd","sf":"$sfDir"}""")
    spark.stop()
  }
}
