package graft.tools

/** Pure-JVM MEMORY-BANDWIDTH scaling calibration — the DRAM counterpart of
  * Bench's arithmetic `rawScale` ceiling. Fixed total work (bytes
  * streamed), split across N threads; each thread xor-folds a private
  * 128 MiB long array far larger than LLC, so throughput is bounded by the
  * box's shared memory bus, not ALUs. On one VM, local[2] → local[8] gets
  * 4× ALUs but the SAME DRAM bus; a real N → 4N-executor cluster brings 4×
  * memory buses. The ratio this prints is therefore the machine ceiling
  * against which string/parquet-heavy stage throughput must be read
  * (Bench's arithmetic rawScale measures ×3.94 on this box; DRAM measures
  * lower — that gap, not the engine, bounds the fully-materialized
  * pipeline's single-box scaling).
  *
  *   runMain graft.tools.MemScale [threadsCsv]   (default "2,8")
  */
object MemScale {
  private val ArrWords = (128L * 1024 * 1024 / 8).toInt // 128 MiB per thread
  private val TotalPasses = 96L // total array passes, split across threads

  private def run(threads: Int): Double = {
    val per = TotalPasses / threads
    val sinks = new java.util.concurrent.atomic.AtomicLong()
    def burn(seed: Int): Thread = new Thread(() => {
      val arr = new Array[Long](ArrWords)
      java.util.Arrays.fill(arr, seed.toLong)
      var acc = 0L
      var p = 0L
      while (p < per) {
        var i = 0
        while (i < ArrWords) { acc ^= arr(i); i += 8 } // stride 64 B: one load per cache line
        p += 1
      }
      sinks.addAndGet(acc)
    })
    val t0 = System.nanoTime()
    val ts = (0 until threads).map(i => { val t = burn(i + 1); t.start(); t })
    ts.foreach(_.join())
    if (sinks.get() == 42L) println("")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val threads = (if (args.nonEmpty) args(0) else "2,8")
      .split(",").map(_.trim.toInt).toSeq
    run(threads.max) // page-in + JIT warmup
    val times = threads.map(t => t -> (1 to 3).map(_ => run(t)).min)
    times.foreach { case (t, s) =>
      println(f"[mem-scale] threads=$t%-2d sec=$s%.2f passes/s=${TotalPasses / s}%.1f")
    }
    for (Seq((tl, sl), (th, sh)) <- times.sliding(2)) {
      val eff = (sl / sh) / (th.toDouble / tl)
      println(f"[mem-scale] $tl -> $th threads: speedup ${sl / sh}%.2f of ${th / tl}x, dram_ceiling=$eff%.3f")
    }
  }
}
