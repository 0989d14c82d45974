package graft

import org.apache.spark.sql.functions._
import graft.streaming.RadiationPipeline
import graft.operators.Readings.Thresholds

/** FIXTURES.md §A5: every validation branch of the reference
  * (flink_process.py:113-137) exercised through the real parse→validate
  * path on JSON strings.
  */
class ValidationSpec extends SparkSuite {
  import spark.implicits._

  private def rec(ct: String = "2011-03-15 10:00:00", lat: Double = 35.6,
                  lon: Double = 139.7, v: Double = 42, unit: String = "cpm"): String =
    s"""{"captured_time": "$ct", "latitude": $lat, "longitude": $lon, "value": $v, "unit": "$unit", "ingestion_timestamp": 1300183200000}"""

  private def validateOne(json: String): org.apache.spark.sql.Row = {
    val df = Seq(json).toDF("value")
    RadiationPipeline.validate(RadiationPipeline.parse(df), Thresholds()).head()
  }

  private def field(json: String, name: String): Any = {
    val r = validateOne(json)
    r.get(r.fieldIndex(name))
  }

  test("normal valid record → valid, level=low") {
    assert(field(rec(), "status") == "valid")
    assert(field(rec(), "level") == "low")
    assert(field(rec(), "critical") == false)
  }

  test("level buckets: <50 low, <200 moderate, else high; critical >= 1000") {
    assert(field(rec(v = 120), "level") == "moderate")
    assert(field(rec(v = 500), "level") == "high")
    assert(field(rec(v = 500), "critical") == false)
    assert(field(rec(v = 1500), "critical") == true)
    // boundaries: thresholds are < for levels, >= for danger (FIXTURES A5)
    assert(field(rec(v = 50), "level") == "moderate")
    assert(field(rec(v = 200), "level") == "high")
    assert(field(rec(v = 1000), "critical") == true)
  }

  test("missing field → invalid") {
    val noUnit = """{"captured_time": "2011-03-15 10:00:00", "latitude": 1, "longitude": 2, "value": 42}"""
    assert(field(noUnit, "status") == "invalid")
    assert(field(noUnit, "error") == "Missing or invalid fields")
  }

  test("range checks: lat 91, lon -181 → invalid") {
    assert(field(rec(lat = 91), "error") == "Latitude out of range")
    assert(field(rec(lon = -181), "error") == "Longitude out of range")
  }

  test("non-positive value, incl. 0.4 rounding to 0 → invalid") {
    assert(field(rec(v = 0), "status") == "invalid")
    assert(field(rec(v = -5), "status") == "invalid")
    assert(field(rec(v = 0.4), "error") == "Non-positive value")
    assert(field(rec(v = 0.5), "status") == "valid") // rounds to 1
  }

  test("value beyond int range → invalid 'Value out of range', not a crash") {
    // ANSI mode would throw CAST_OVERFLOW on a plain cast and kill the
    // stream; the validator must route this to dirty instead
    assert(field(rec(v = 3e9), "status") == "invalid")
    assert(field(rec(v = 3e9), "error") == "Value out of range")
    assert(field(rec(v = 1e300), "status") == "invalid")
  }

  test("wrong unit / case-insensitive unit") {
    assert(field(rec(unit = "usv"), "error") == "Invalid unit")
    assert(field(rec(unit = "CPM"), "status") == "valid")
  }

  test("non-numeric value → invalid (json type mismatch → null field)") {
    val bad = """{"captured_time": "t", "latitude": 1, "longitude": 2, "value": "abc", "unit": "cpm"}"""
    assert(field(bad, "status") == "invalid")
  }

  test("malformed JSON → invalid, raw preserved") {
    val r = validateOne("{not json")
    assert(r.getString(r.fieldIndex("status")) == "invalid")
    assert(r.getString(r.fieldIndex("raw")) == "{not json")
  }

  test("timestamp normalization: tz/fractional accepted, garbage → null event time") {
    assert(field(rec(ct = "2011-03-15 10:00:00.123+09:00"), "event_time") != null)
    assert(field(rec(ct = "2011-03-15T10:00:00Z"), "event_time") != null)
    assert(field(rec(ct = "15/03/2011"), "event_time") == null)
  }

  test("composite key: 5dp/5dp/2dp formatting with fallbacks") {
    assert(field(rec(), "dedup_key") ==
      "35.60000|139.70000|42.00|2011-03-15 10:00:00|cpm")
  }
}
