package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

/** Engine-verified golden tests for the full map-function surface (SURVEY
  * Q28): entries/keys/values/explode over the from_json'd events.props
  * fixture, plus the construct/combine/transform family on built maps.
  * The oracle-paired declared queries (q28_map, q28_map_entries) cover
  * extraction and entry expansion; this spec closes the rest.
  */
class MapSurfaceSpec extends SparkSpec {

  private def propsMap = Tables(spark, sfDir, "events")
    .select(col("event_id"),
      from_json(col("props"), MapType(StringType, IntegerType)).as("m"))

  test("map_entries and explode(map) agree row-for-row on events.props") {
    val viaEntries = propsMap
      .select(col("event_id"), explode(map_entries(col("m"))).as("e"))
      .select(col("event_id"), col("e.key").as("k"), col("e.value").as("v"))
    val viaExplode = propsMap
      .select(col("event_id"), explode(col("m")).as(Seq("k", "v")))
    assert(viaEntries.count() > 0)
    assert(viaEntries.exceptAll(viaExplode).isEmpty &&
      viaExplode.exceptAll(viaEntries).isEmpty)
  }

  test("map_keys/map_values/map_from_entries round-trip the map") {
    // maps have no ordering/equality in Spark — compare sorted entry arrays
    val roundTrip = propsMap.select(col("event_id"),
      array_sort(map_entries(col("m"))).as("me"),
      array_sort(map_entries(map_from_entries(map_entries(col("m"))))).as("rt"))
    assert(roundTrip.filter(col("me") =!= col("rt")).count() == 0)
    val kv = propsMap.select(
      size(map_keys(col("m"))).as("nk"),
      size(map_values(col("m"))).as("nv"),
      size(col("m")).as("n"))
    assert(kv.filter(col("nk") =!= col("n") || col("nv") =!= col("n")).count() == 0)
  }

  test("map_concat / map_filter / transform_values / map_zip_with golden") {
    val df = propsMap
      .withColumn("m2", map(lit("extra"), lit(1)))
      .withColumn("merged", map_concat(col("m"), col("m2")))
      .withColumn("big_only", map_filter(col("m"), (_, v) => v > 50))
      .withColumn("doubled", transform_values(col("m"), (_, v) => v * 2))
      .withColumn("zipped",
        map_zip_with(col("m"), col("doubled"), (_, a, b) => b - a))
    val bad = df.filter(
      size(col("merged")) =!= size(col("m")) + 1 ||
        element_at(col("merged"), "extra") =!= 1 ||
        element_at(col("doubled"), "k") =!= element_at(col("m"), "k") * 2 ||
        element_at(col("zipped"), "k") =!= element_at(col("m"), "k"))
    assert(bad.count() == 0)
    // map_filter keeps exactly the entries whose value passes the predicate
    val filt = df.select(
      size(col("big_only")).as("nf"),
      when(element_at(col("m"), "k") > 50, 1).otherwise(0).as("expect"))
    assert(filt.filter(col("nf") =!= col("expect")).count() == 0)
  }
}
