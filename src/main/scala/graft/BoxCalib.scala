package graft

/** BOX CALIBRATION shared by every measurement main (`Bench`,
  * `ScaleCurve`'s curve/incremental/probe legs): a deterministic CPU
  * microbenchmark whose readings travel INSIDE each JSON artifact, so
  * two artifacts from different boots can be compared with their box
  * speeds in hand instead of re-bisected (round-14 lesson: unchanged
  * round-12 bytecode measured q306 at 34.8 s on its own round's boot
  * and 49.0 s on round-14's — a 40 % box-state swing that took three
  * worktree builds to adjudicate; with probes in both artifacts it is
  * one division).
  *
  * The single-thread leg tracks per-core speed (turbo/thermal/steal);
  * the all-cores leg runs the same fixed work on every available
  * processor concurrently, folding in SMT contention and hypervisor
  * pressure — the regime a `local[32]` suite actually executes in. The
  * loop is JIT-warmed untimed first and every result feeds an
  * accumulator the final guard reads, so the JIT cannot elide the work.
  */
object BoxCalib {

  private val iters = 200000000L
  private def burn(seed: Long): Long = {
    var x = seed | 1L
    var i = 0L
    while (i < iters) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      x *= 0x2545F4914F6CDD1DL
      i += 1
    }
    x
  }

  /** (singleThreadMs, allCoresMs) for the fixed xorshift64* workload. */
  def measure(): (Double, Double) = {
    val acc = new java.util.concurrent.atomic.AtomicLong(burn(42)) // warmup
    val t0 = System.nanoTime()
    acc.addAndGet(burn(acc.get()))
    val st = (System.nanoTime() - t0) / 1e6
    val n = Runtime.getRuntime.availableProcessors
    val t1 = System.nanoTime()
    val threads = (0 until n).map(i =>
      new Thread(() => { acc.addAndGet(burn(i + 7)): Unit }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    val mt = (System.nanoTime() - t1) / 1e6
    if (acc.get() == 0) System.err.println("[calib] sink hit zero")
    (st, mt)
  }

  /** The single-thread leg alone (~1 s): the cheap probe `Bench`
    * INTERLEAVES between query groups to detect transient host windows
    * mid-suite (round-15 verdict #2 — both r15 full runs were
    * calib-drift-free at the endpoints yet each hit one ~35–45-min
    * contiguous degraded window that only a separate post-hoc recheck
    * artifact could adjudicate). No warmup burn: the suite's own work
    * keeps the JIT hot, and a probe that reads a few percent high only
    * errs toward re-checking a query, never toward trusting a degraded
    * sample.
    */
  def measureSt(): Double = {
    val acc = new java.util.concurrent.atomic.AtomicLong(1L)
    val t0 = System.nanoTime()
    acc.addAndGet(burn(acc.get()))
    if (acc.get() == 0) System.err.println("[calib] sink hit zero")
    (System.nanoTime() - t0) / 1e6
  }

  /** The all-cores leg alone (~1 s): the fixed workload on every
    * available processor concurrently. Added in round 16 after the
    * bench's single-thread probe interleave proved BLIND to this host's
    * actual window family: a standalone q262 re-measure at committed
    * bytecode caught all-cores calib at 906–1021 ms (clean runs sit at
    * ~640–680) while the single-thread probe stayed flat at ~590 ms —
    * the degradation lives entirely in the multi-core regime (SMT
    * contention / hypervisor pressure), which is also the regime every
    * `local[32]` query executes in. `Bench` now interleaves BOTH legs
    * and a window is degraded when EITHER exceeds its own run-floor
    * ratio.
    */
  def measureMt(): Double = {
    val acc = new java.util.concurrent.atomic.AtomicLong(1L)
    val n = Runtime.getRuntime.availableProcessors
    val t0 = System.nanoTime()
    val threads = (0 until n).map(i =>
      new Thread(() => { acc.addAndGet(burn(i + 7)): Unit }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    if (acc.get() == 0) System.err.println("[calib] sink hit zero")
    (System.nanoTime() - t0) / 1e6
  }

  /** The probe as a ready JSON fragment: `"calib":{"st_ms":…,"mt_ms":…}`. */
  def jsonField(): String = {
    val (st, mt) = measure()
    System.err.println(f"[calib] single-thread $st%.0f ms, all-cores $mt%.0f ms")
    f""""calib":{"st_ms":$st%.1f,"mt_ms":$mt%.1f}"""
  }
}
