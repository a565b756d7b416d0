package graft.tools

/** Shared era yardsticks for every probe main (r16, VERDICT r15 #1 — the
  * dd-tier floor-drift attribution generalized): each yardstick loads
  * exactly one measurement axis, so a probe floor that moves between
  * rounds can name its mechanism by comparing the yardsticks recorded
  * alongside it instead of being re-measured on faith.
  *
  *  - [[yardCpu]]: a fixed Spark-free 64-bit mix loop — host CPU
  *    throughput era (clock/steal/JIT), no I/O, no allocation, no Spark.
  *    The r16 quiet-JVM reference band is 0.51–0.59 s.
  *  - [[yardRawRead]]: every byte of the probe's input tables through a
  *    plain buffered FileInputStream — page-cache/storage bandwidth era,
  *    no decode, no compute. At sf0.1 every probe tier's inputs are
  *    single-digit MB, so this axis is expected flat and near-zero; a
  *    probe-floor story that blames storage must show THIS number moved.
  *
  * Reading rule (README "Performance measurement notes", r16 attribution
  * bullet): ALL yardsticks flat + a moved converged floor = a real plan
  * regression; a moved `yard_cpu` = single-thread host-era drift;
  * `yard_raw_read` is the storage axis. The Spark-side compute yardstick
  * (an I/O-free codegen'd plan) stays per-probe because it needs the live
  * session — see DdProbe's `yard_spark_cpu` — and it is NOT redundant
  * with `yard_cpu`: the r16 degraded-window run measured dd floors
  * +60–70 % with `yard_cpu` FLAT while `yard_spark_cpu` ran +50 % — host
  * contention can load ONLY the parallel execution path (steal under
  * 32-thread bursts, scheduler latency), invisible to a single-thread
  * loop. A floor measured while `yard_spark_cpu` or the bench controls
  * are elevated is not a floor.
  */
object Yardsticks {
  /** Fixed Spark-free CPU yardstick: 300M rounds of a 64-bit xorshift mix.
    * Deterministic work — its seconds measure the host's single-thread
    * compute era, nothing else.
    */
  def yardCpu(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0L
    while (i < 300000000L) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      acc += x
      i += 1
    }
    // Consume `acc` so the loop cannot be dead-code-eliminated.
    if (acc == 42L) System.err.println("[yardstick] yard_cpu sentinel")
    (System.nanoTime() - t0) / 1e9
  }

  /** Raw storage yardstick: stream every byte of the given parquet tables
    * through a plain buffered FileInputStream; returns (seconds, bytes).
    */
  def yardRawRead(dir: String, tables: Seq[String]): (Double, Long) = {
    val buf = new Array[Byte](1 << 20)
    var bytes = 0L
    val t0 = System.nanoTime()
    tables.foreach { t =>
      val root = java.nio.file.Paths.get(dir, s"$t.parquet")
      // A missing root degrades the yardstick (one stderr note), never the
      // probe — record() runs at the top of every probe main, and probes
      // only need the tables their variants actually read (ADVICE r16 #2).
      if (!java.nio.file.Files.exists(root)) {
        System.err.println(s"[yardstick] yard_raw_read: $root missing — skipped")
      } else {
        val walk = java.nio.file.Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p))
            .foreach { p =>
              val in = new java.io.FileInputStream(p.toFile)
              try {
                var n = in.read(buf)
                while (n >= 0) { bytes += n; n = in.read(buf) }
              } finally in.close()
            }
        } finally walk.close()
      }
    }
    ((System.nanoTime() - t0) / 1e9, bytes)
  }

  /** Print the standard yardstick block under the given probe tag: the
    * raw read of the probe's input tables first cold-ish then warm (the
    * first read sees whatever page-cache state the probe's cold builds
    * will see), and the CPU loop cold (pre-JIT) then warmed ×3. Call at
    * the TOP of a probe main, before Spark touches the files.
    */
  def record(tag: String, dir: String, tables: Seq[String]): Unit = {
    Seq("raw_cold", "raw_warm").foreach { label =>
      val (sec, bytes) = yardRawRead(dir, tables)
      println(f"[$tag] yard_raw_read/$label ${bytes / 1e6}%8.1f MB in $sec%6.3f s (${bytes / 1e6 / sec}%7.1f MB/s)")
    }
    println(f"[$tag] yard_cpu/cold   ${yardCpu()}%6.3f s")
    (1 to 3).foreach(i => println(f"[$tag] yard_cpu/warm$i  ${yardCpu()}%6.3f s"))
  }
}
