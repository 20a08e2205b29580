package graft.tools

/** Host-speed calibration anchors recorded in every bench artifact.
  *
  * Round-over-round per-query comparisons on different hosts are
  * un-normalizable without a host term (round 10 ran ~1.3x slower
  * than round 9 host-wide). Two anchors, both fixed data-independent
  * microbenches measured with the bench discipline (one unmeasured
  * warm-up, median of 5):
  *
  *  - `calib` (SERIAL, the round-11 anchor, preserved bit-for-bit so
  *    artifacts from rounds 11-12 stay comparable): one thread runs a
  *    64M-iteration avalanche-mix loop (pure ALU) plus a scattered
  *    read-modify-write over a 2^20-entry long table (memory
  *    subsystem) — the workloads Spark's hash aggregates actually
  *    exercise. Constant work, no allocation in the loop, the
  *    accumulator escapes so the JIT cannot dead-code it.
  *  - `calib_parallel` (NEW in round 13): 32 threads — matching the
  *    local[32] the queries run under — each run the same mix loop at
  *    8M iterations over a PRIVATE 2^20 table (8 MB x 32 = 256 MB
  *    live), so the measurement includes the memory-bandwidth and
  *    scheduler contention a 32-way Spark stage sees. This is the
  *    anchor the serial one provably misses: the round-12 verdict's
  *    same-host A/B showed ~20% suite-total drift at near-identical
  *    SERIAL calib (0.2688 vs 0.2697) — multicore contention moved,
  *    single-core speed did not. scripts/benchdiff.py normalizes by
  *    calib_parallel when both artifacts carry it.
  *
  * The thread count is FIXED at 32 (not availableProcessors): the
  * anchor must measure "how fast does THIS host run the 32-way work
  * the bench schedules", so a host with more cores than 32 is
  * correctly credited and a core-capped host (cgroup quota, taskset)
  * is correctly debited. [[CalibProbe]] prints both anchors without
  * running queries — `taskset -c 0-7 ... runMain graft.tools.CalibProbe`
  * is the synthetic-drift check: the parallel anchor moves ~4x while
  * the serial one stays flat.
  */
object Calib {
  val SerialIters = 64000000L
  val Threads = 32
  val ParallelItersPerThread = 8000000L

  /** The round-11 serial loop, kept INSTRUCTION-IDENTICAL (no offset
    * parameter — even one extra add per iteration would shift the
    * anchor a few percent and masquerade as host drift against the
    * committed r11/r12 artifacts).
    */
  private def serialOnce(table: Array[Long]): (Double, Long) = {
    val t0 = System.nanoTime()
    var acc = 0L
    var i = 0L
    while (i < SerialIters) {
      var h = i * 0x9E3779B97F4A7C15L
      h ^= h >>> 32; h *= 0xC2B2AE3D27D4EB4FL; h ^= h >>> 29
      acc += h
      val slot = (h & 0xFFFFF).toInt
      table(slot) += h | 1L
      i += 1
    }
    ((System.nanoTime() - t0) / 1e9, acc + table(12345))
  }

  /** The parallel-phase loop: same mix, plus `offset` to disjoint the
    * per-thread input streams (thread k mixes i in [k*iters,
    * (k+1)*iters)) — identical-shape but not identical-value work.
    */
  private def mixLoop(table: Array[Long], iters: Long, offset: Long): Long = {
    var acc = 0L
    var i = 0L
    while (i < iters) {
      var h = (i + offset) * 0x9E3779B97F4A7C15L
      h ^= h >>> 32; h *= 0xC2B2AE3D27D4EB4FL; h ^= h >>> 29
      acc += h
      val slot = (h & 0xFFFFF).toInt
      table(slot) += h | 1L
      i += 1
    }
    acc + table(12345)
  }

  private def parallelOnce(tables: Array[Array[Long]]): (Double, Long) = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val threads = tables.zipWithIndex.map { case (tb, k) =>
      val th = new Thread(() =>
        sink.addAndGet(mixLoop(tb, ParallelItersPerThread,
          k.toLong * ParallelItersPerThread)))
      th.start()
      th
    }
    threads.foreach(_.join())
    ((System.nanoTime() - t0) / 1e9, sink.get)
  }

  private def median5(once: () => (Double, Long), sink: java.util.concurrent.atomic.AtomicLong): Double = {
    sink.addAndGet(once()._2) // warm-up (unmeasured)
    val times = (1 to 5).map { _ =>
      val (t, a) = once(); sink.addAndGet(a); t
    }.sorted
    times(times.length / 2)
  }

  /** (calib_serial, calib_parallel), each the median of 5 after one
    * warm-up. The sink value is printed by callers so the JIT sees
    * every accumulator escape.
    */
  def measure(): (Double, Double, Long) = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val serialTable = new Array[Long](1 << 20)
    val serial = median5(() => serialOnce(serialTable), sink)
    val parTables = Array.fill(Threads)(new Array[Long](1 << 20))
    val parallel = median5(() => parallelOnce(parTables), sink)
    (serial, parallel, sink.get)
  }
}

/** Prints the two calibration anchors as one JSON line without running
  * any queries (~15 s). The synthetic-drift check for the parallel
  * anchor (run both, compare):
  *
  * {{{
  *   sbt -batch "runMain graft.tools.CalibProbe"
  *   taskset -c 0-7 sbt -batch "runMain graft.tools.CalibProbe"
  * }}}
  *
  * Measured on the round-13 host: serial 0.413 -> 0.400 s (~flat —
  * one thread is never core-starved) while calib_parallel 0.117 ->
  * 0.251 s (2.15x — 32 threads on 8 cores, memory-bandwidth-bound so
  * sub-4x). That is the exact host-drift signature the round-12 A/B
  * had to re-buy with a worktree re-bench.
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val (serial, parallel, sink) = Calib.measure()
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    System.err.println(s"[calib-probe] sink $sink")
    println(s"""{"calib":${r4(serial)},"calib_parallel":${r4(parallel)},"cores_visible":${Runtime.getRuntime.availableProcessors()}}""")
  }
}
