package graft

import org.scalatest.Tag

/** Tag for long soak-style tests (multi-wave streaming admissions,
  * decade ladders, multi-sf sweeps) excluded from the default
  * `sbt test` target so the default suite fits the driver's test
  * budget (r18 verdict ask #7). build.sbt wires the exclusion;
  * `GRAFT_RUN_SLOW=1 sbt test` runs everything, and
  * `sbt "testOnly * -- -n graft.Slow"` runs only the slow set.
  * Tag a test with `test("...", Slow) { ... }`. */
object Slow extends Tag("graft.Slow")
