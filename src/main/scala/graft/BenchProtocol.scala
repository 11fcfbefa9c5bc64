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
    * The deadline bounds retries, not the first iteration.
    *
    * Besides the per-rep steal gate, a pair is CLEAN only if its efficiency
    * is physically plausible: `effCap` (default 1.2) rejects pairs where the
    * SMALL arm ran anomalously slow without recorded steal (observed: a
    * 4-core rep at half speed, eff 2.08 — throttling the /proc/stat counter
    * does not see). For this CPU-bound pipeline with fixed per-core cache,
    * genuinely superlinear core scaling is impossible — the small arm has
    * MORE cache and memory bandwidth per thread, so eff > ~1.1 is always a
    * measurement artifact. The cap is deliberately ONE-SIDED: it can only
    * discard pairs that INFLATE the reported efficiency, never pairs that
    * lower it, so it cannot cherry-pick the number upward. Suspect pairs are
    * counted in the JSON (`suspect_pairs`) and rejoin the candidate pool
    * only when no clean pair exists at all.
    *
    * `coolDownMs(load)` is the pre-rep idle (hypervisor credit refill);
    * callers shorten it for small loads so more pairs fit the budget. The
    * drain the idle repairs comes from the PRECEDING load, so it is keyed on
    * max(previous rep's arm, upcoming arm) — a small arm timed right after a
    * half-machine rep would otherwise run under-cooled and its inflated time
    * passes the steal gate in exactly the efficiency-inflating direction the
    * one-sided cap exists to stop (review r03g). History before the first
    * rep is unknown (headline queries, jar packaging), so the first rep
    * always gets the full idle. */
  def measurePair(n: Int, m: Int, deadline: Long, minClean: Int, rows: Long,
                  armKey: String = "cores",
                  coolDownMs: Int => Long = _ => 15000L,
                  effCap: Double = 1.2)(oneRep: Int => (Double, Long)): (Double, String) = {
    final case class Pair(tn: Double, tm: Double, stealClean: Boolean)
    def effOf(p: Pair) = (p.tn / p.tm) / (m.toDouble / n)
    def isClean(p: Pair) = p.stealClean && effOf(p) <= effCap
    val pairs = scala.collection.mutable.ArrayBuffer.empty[Pair]
    var iter = 0
    // unknown pre-pair history: full idle first (sentinel bigger than any
    // real core count but safe in callers' `load * 2 >= cpus` arithmetic)
    var prevLoad = 1 << 20
    def cleanPairs = pairs.count(isClean)
    while ((cleanPairs < minClean) &&
           (iter < minClean || System.currentTimeMillis() < deadline)) {
      val order = if (iter % 2 == 0) Seq(m, n) else Seq(n, m)
      var tn = 0.0; var tm = 0.0; var stealClean = true
      order.foreach { arm =>
        // idle keyed on the larger of (what just ran, what runs next):
        // credit refill must cover the PRECEDING drain (scaladoc above)
        Thread.sleep(coolDownMs(math.max(prevLoad, arm)))
        val (t, s) = oneRep(arm)
        prevLoad = arm
        System.err.println(f"[bench] rep $armKey=$arm%2d sec=$t%6.2f steal_cs=$s")
        if (s > 50) stealClean = false
        if (arm == n) tn = t else tm = t
      }
      val p = Pair(tn, tm, stealClean)
      if (p.stealClean && !isClean(p))
        System.err.println(f"[bench] pair eff=${effOf(p)}%.3f > cap $effCap — " +
          "suspect (unrecorded throttle on the small arm), not counted clean")
      pairs += p
      iter += 1
    }
    val suspects = pairs.count(p => p.stealClean && !isClean(p))
    val usable = if (pairs.exists(isClean)) pairs.filter(isClean) else pairs
    // headline = the LOWER-MEDIAN clean pair's own efficiency (ADVICE r01:
    // best-pair is an upward cherry-pick; one concrete pair keeps sec_n /
    // sec_4n and "efficiency" mutually consistent — review r02)
    val sortedPairs = usable.sortBy(effOf)
    val effs = sortedPairs.map(effOf)
    val med = sortedPairs((sortedPairs.length - 1) / 2)
    val eff = effOf(med)
    def r3(x: Double) = math.rint(x * 1000) / 1000.0
    (eff,
      s"""{"rows":$rows,"${armKey}_n":$n,"sec_n":${med.tn},"images_per_sec_n":${(rows / med.tn).toLong},""" +
      s""""${armKey}_4n":$m,"sec_4n":${med.tm},"images_per_sec_4n":${(rows / med.tm).toLong},""" +
      s""""efficiency":${r3(eff)},"efficiency_min":${r3(effs.head)},"efficiency_max":${r3(effs.last)},""" +
      s""""clean_pairs":$cleanPairs,"suspect_pairs":$suspects,"steal_polluted":${!pairs.exists(_.stealClean)}}""")
  }
}
