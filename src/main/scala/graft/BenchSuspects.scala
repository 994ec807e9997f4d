package graft

/** Classification of a bench query whose contention-resistant MIN
  * exceeds 3× the committed prior round's min (the `suspect_*` fields
  * of the round record).
  *
  * Round 13 exposed the gap this closes: `suspect_contended` fired on
  * a query whose three runs were mutually consistent (2.39/2.74/2.62)
  * on a quiet canary — the signature of a REAL regression, not a noisy
  * host — but the mechanism only compared against the prior record, so
  * the judge had to adjudicate by hand. The two cases separate on
  * evidence the record already carries:
  *
  *  - wide run spread (median > 3× min — the same wideness marker the
  *    `contended` list uses) means at least one run absorbed ambient
  *    load → the min is untrustworthy → `contended`;
  *  - a HOT canary (this round's fixed-cost scan ≫ the committed
  *    record's) means the whole host was loaded, inflating even
  *    consistent runs uniformly → `contended`;
  *  - tight spread on a quiet canary leaves no contention story: the
  *    code got slower → `regressed`.
  *
  * Unknown canary history degrades to `contended` (the round-12
  * behavior — conservative, because calling something a regression
  * without a quiet-host witness invites false alarms).
  *
  * Pure (no Spark, no IO) so the spec drives every branch directly.
  */
object BenchSuspects {

  /** 3× with a 0.2 s absolute floor: millisecond-scale scan noise must
    * not spam the suspect list (round-11 rationale, unchanged).
    */
  def isSuspect(runsMin: Double, priorMin: Double): Boolean =
    runsMin > 3 * priorMin && runsMin - priorMin > 0.2

  /** Canary-hot test with a 0.45 s absolute floor: quiet-host canaries
    * have been observed anywhere in 0.20–0.57 s (scan jitter) — so the
    * floor must cover the full 0.37 s width of that envelope or an
    * all-quiet 0.20 → 0.57 pair reads hot and a real code regression
    * gets misfiled as contention (the exact r13 gap this class
    * closes). Genuinely contended rounds push the canary well past
    * 1 s, comfortably over both the ratio and the floor. The CALLER
    * must pass the MAX of its start/end canaries: load that arrives
    * mid-run shows only in the end canary, and feeding the min would
    * read a half-hot host as quiet.
    */
  def canaryHot(currentSec: Double, priorSec: Double): Boolean =
    currentSec > 2 * priorSec && currentSec - priorSec > 0.45

  /** Two-round cumulative drift (round-14 watch-list rationale):
    * `q_self_repeat`/`q_autocorr`/`q_eval_overlap_report` each got
    * 19–36% slower with tight runs on a quiet canary — real, but each
    * far below the 3× suspect gate, so the record had no field that
    * surfaced them and the judge found the creep by reading two rounds
    * of history by hand. This flags a query whose min grew in BOTH of
    * the last two committed rounds and cumulatively by ≥ 40% (with a
    * 0.15 s absolute floor against scan jitter) while still under the
    * single-round suspect gate — sub-3× creep now surfaces itself
    * before it compounds into a suspect.
    */
  def isDrifting(runsMin: Double, priorMin: Double, prior2Min: Double): Boolean =
    !isSuspect(runsMin, priorMin) &&
      runsMin > priorMin && priorMin > prior2Min &&
      runsMin > 1.4 * prior2Min && runsMin - prior2Min > 0.15

  /** Per-row cost cliff (round-15's silent-JIT-cliff lesson made a
    * detector): a stage that falls off HotSpot's huge-method compile
    * limit runs INTERPRETED at 100–1000× per row with every green
    * signal still green (janino compiles, the plan reads
    * WholeStageCodegen, threads pin) — the ONLY cheap witness is
    * per-row cost arithmetic. Fires when a query's cost per OUTPUT row
    * (its contention-resistant min over the rows the bench's own
    * `count()` already returns) exceeds 10× its committed prior-round
    * value with a 0.5 s absolute floor (per-row normalization keeps
    * the test meaningful when the dataset's row count shifts; the
    * floor keeps sub-second queries from spamming the list; the 10×
    * ratio sits far above the 25–40% host-epoch envelope and well
    * below the ≥100× cliff signature). The CALLER must additionally
    * require tight runs (median ≤ 3× min) — a wide spread is the
    * contended story, not the cliff story.
    */
  def perRowCliff(minSec: Double, rows: Long,
      priorMinSec: Double, priorRows: Long): Boolean =
    rows > 0 && priorRows > 0 && priorMinSec > 0 &&
      minSec / rows > 10 * (priorMinSec / priorRows) &&
      minSec - priorMinSec > 0.5

  /** `Some("contended")` / `Some("regressed")` for a suspect query,
    * `None` when the min is within 3× of the prior record.
    * `canaryHot = None` means no prior canary to compare against.
    */
  def classify(runs: Seq[Double], priorMin: Double,
      canaryHot: Option[Boolean]): Option[String] = {
    if (runs.isEmpty || !isSuspect(runs.min, priorMin)) return None
    val s = runs.sorted
    val n = s.length
    val med = if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    val wideSpread = med > 3 * runs.min
    Some(if (wideSpread || canaryHot.getOrElse(true)) "contended" else "regressed")
  }
}
