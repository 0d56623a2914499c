package graft

/** Model-based lifecycle fuzz: a DETERMINISTIC (fixed-seed) random
  * sequence of the layout maintenance verbs — ingest / extend /
  * delete / compact / at-least-once replay — applied to a real layout
  * with a driver-side row-set model updated in lockstep; after EVERY
  * step the graftz read must equal the model exactly
  * (duplicate-sensitive) and the manifest must equal the directory.
  * Single ops have targeted specs (ZDeleteSpec, ZorderSpec,
  * GraftZSpec); this is the interaction coverage — on its hardened
  * run it caught the compaction-absorbs-batch replay duplication the
  * batch registry now refuses. The driver is
  * [[graft.tools.FuzzZ.run]], ONE implementation shared with the CLI
  * seed sweep (`runMain graft.tools.FuzzZ <seed> <steps>`) so both
  * always test the same invariants.
  */
class ZLifecycleFuzzSpec extends SparkSpec {

  test("random ingest/extend/delete/compact/replay sequence tracks the row-set model exactly") {
    val survivors = graft.tools.FuzzZ.run(spark, seed = 0xC0FFEE, steps = 20)
    assert(survivors > 0)
  }
}
