package graft

/** The driver's own smoke contract: `SparkEntry.entry` must return rows at
  * sf0.001 — asserted here so a pack edit can't silently zero it out. */
class EntrySmokeSpec extends SparkSuite {
  test("entry returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
