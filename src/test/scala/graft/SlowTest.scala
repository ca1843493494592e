package graft

/** Tag for long-running campaigns (multi-seed fuzz, crash-recovery
  * sweeps): EXCLUDED from the default `sbt test` so the suite fits the
  * round driver's verification budget (round 17's suite was cut off
  * mid-run at ~30 minutes with zero failures — a suite that cannot
  * finish is one the driver cannot gate on). Run them with
  * `GRAFT_RUN_SLOW=1 sbt test` (the exclusion applies to `testOnly`
  * too, so use the env var there as well). Every tagged campaign keeps
  * a smaller untagged representative in its suite, so the default run
  * still covers each code path — the tag only trims seed/round
  * multiplicity. */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
