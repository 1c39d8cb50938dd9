package graft

/** Every declared query (SURVEY.md §2B) executes at sf0.001 with a
  * non-empty schema; oracle-paired correctness is the driver's DuckDB
  * compare (tools/oracle_check.py) — this suite guards execution.
  */
class SmokeSpec extends SparkSpec {

  test("registry has no duplicate names and every entry declares columns") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.size >= 42, s"expected full §2B surface, got ${names.size}")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, s"${q.name}: empty schema")
      assert(df.count() >= 0)
    }
  }
}
