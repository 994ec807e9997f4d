package graft.core

/** Named fail-fast abort for a candidate-generation lane whose
  * EXPECTED pair volume (computed from its bucket histogram before any
  * pair is formed — one cheap grouped count) exceeds the lane's
  * declared budget. The r14 postmortem shape this prevents: a lane
  * without a by-construction bound (the pre-round-15 4-bit sign bands)
  * silently hanging into a 900 s wall-clock budget at scale, when a
  * sub-second aggregate already knew the volume was ~10¹⁰. Every
  * current lane IS bounded by construction (width-scaled bands +
  * bucket caps + rank caps); this guard is belt-and-braces for the
  * next lane someone adds, and it names the lane, the measured
  * volume, and the budget so the abort is actionable.
  */
class PairVolumeExceeded(val lane: String, val pairs: Long, val budget: Long)
  extends RuntimeException(
    s"$lane: expected candidate-pair volume $pairs exceeds the declared " +
      s"budget $budget — refusing to run a quadratic-shaped join; widen the " +
      "lane's code/bands or lower its bucket caps instead")
