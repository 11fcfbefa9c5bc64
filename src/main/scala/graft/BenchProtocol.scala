package graft

/** The steal-gated N-vs-4N measurement protocol, shared by `Bench`
  * (local[N] thread parallelism) and `ClusterBench` (local-cluster[N,c,m]
  * separate executor JVMs). See BENCH.md for the protocol's rationale; the
  * short form: the sandbox hypervisor steals CPU in bursts, so efficiency
  * comes from WITHIN-iteration arm pairs (both arms back-to-back under the
  * same host conditions), reps are steal-measured and only clean reps count,
  * and the headline is the lower-median clean pair (no best-pair
  * cherry-pick). */
private[graft] object BenchProtocol {

  /** Cumulative hypervisor-steal centiseconds (8th field of /proc/stat). */
  def stealCs(): Long = {
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(0L)
    } catch { case _: Throwable => 0L }
  }

  /** Measure one N-vs-4N pair; `oneRep(arm)` runs the workload at arm
    * parallelism `arm` (cores or executors — the caller decides) and returns
    * (seconds, steal centiseconds accrued during the rep). `armKey` names
    * the arm unit in the JSON fragment ("cores_n"/"cores_4n" vs
    * "executors_n"/...); efficiency = (t_n/t_m)/(m/n), which is unit-free
    * as long as both arms scale the SAME per-arm resource (Bench: cores;
    * ClusterBench: 4-core executors). Returns (efficiency, json fragment).
    * The deadline bounds retries, not the first iteration. */
  def measurePair(n: Int, m: Int, deadline: Long, minClean: Int, rows: Long,
                  armKey: String = "cores")(oneRep: Int => (Double, Long)): (Double, String) = {
    final case class Pair(tn: Double, tm: Double, clean: Boolean)
    val pairs = scala.collection.mutable.ArrayBuffer.empty[Pair]
    var iter = 0
    def cleanPairs = pairs.count(_.clean)
    while ((cleanPairs < minClean) &&
           (iter < minClean || System.currentTimeMillis() < deadline)) {
      val order = if (iter % 2 == 0) Seq(m, n) else Seq(n, m)
      var tn = 0.0; var tm = 0.0; var clean = true
      order.foreach { arm =>
        Thread.sleep(15000) // idle: let the hypervisor throttle credit refill
        val (t, s) = oneRep(arm)
        System.err.println(f"[bench] rep $armKey=$arm%2d sec=$t%6.2f steal_cs=$s")
        if (s > 50) clean = false
        if (arm == n) tn = t else tm = t
      }
      pairs += Pair(tn, tm, clean)
      iter += 1
    }
    val usable = if (pairs.exists(_.clean)) pairs.filter(_.clean) else pairs
    // headline = the LOWER-MEDIAN clean pair's own efficiency (ADVICE r01:
    // best-pair is an upward cherry-pick; one concrete pair keeps sec_n /
    // sec_4n and "efficiency" mutually consistent — review r02)
    def effOf(p: Pair) = (p.tn / p.tm) / (m.toDouble / n)
    val sortedPairs = usable.sortBy(effOf)
    val effs = sortedPairs.map(effOf)
    val med = sortedPairs((sortedPairs.length - 1) / 2)
    val eff = effOf(med)
    def r3(x: Double) = math.rint(x * 1000) / 1000.0
    (eff,
      s"""{"rows":$rows,"${armKey}_n":$n,"sec_n":${med.tn},"images_per_sec_n":${(rows / med.tn).toLong},""" +
      s""""${armKey}_4n":$m,"sec_4n":${med.tm},"images_per_sec_4n":${(rows / med.tm).toLong},""" +
      s""""efficiency":${r3(eff)},"efficiency_min":${r3(effs.head)},"efficiency_max":${r3(effs.last)},""" +
      s""""clean_pairs":$cleanPairs,"steal_polluted":${!pairs.exists(_.clean)}}""")
  }
}
