package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-8 regression class: the testdata generator switched events.ts from
  * parquet TIMESTAMP(NANOS) to timestamp[us] with no timezone (TIMESTAMP_NTZ
  * to Spark) and every event-time query broke at analysis. Pin the loader
  * contract: the SAME rows written as (a) TIMESTAMP-LTZ, (b) TIMESTAMP_NTZ,
  * and (c) nanos-as-long parquet must come back from Tables.events as one
  * identical TimestampType frame, and gap-sessionization must agree across
  * all three — including under a non-UTC session timezone for the NTZ case
  * (the naive value is UTC wall time regardless of session zone).
  */
class TimestampEncodingSpec extends SparkSpecBase {

  private lazy val dirs: Map[String, String] = {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("ts_encodings").toString
    // two users; user 7 has a >30 min gap → 2 sessions, user 8 has 1
    val rows = Seq(
      (1L, 7L, 1700000000000000L, "view", 1.5),
      (2L, 7L, 1700000060000000L, "purchase", 2.0),
      (3L, 7L, 1700003700000000L, "view", 0.5), // +61.7 min → new session
      (4L, 8L, 1700000000000000L, "error", 9.0),
      (5L, 8L, 1700000030000000L, "purchase", 3.25))
      .toDF("event_id", "user_id", "us", "event_type", "value")
    def write(name: String, ts: org.apache.spark.sql.Column): String = {
      val d = s"$base/$name"
      rows.withColumn("ts", ts).drop("us")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    Map(
      "ltz" -> write("ltz", timestamp_micros(col("us"))),
      "ntz" -> write("ntz",
        timestamp_micros(col("us")).cast("timestamp_ntz")),
      "nanos" -> write("nanos", col("us") * 1000L))
  }

  private def loaded(enc: String): DataFrame =
    Tables.events(spark, dirs(enc))
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id")

  test("all three encodings load as TimestampType") {
    for (enc <- Seq("ltz", "ntz", "nanos"))
      assert(Tables.events(spark, dirs(enc)).schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, s"encoding $enc")
  }

  test("all three encodings yield identical instants") {
    val expected = Seq(1700000000000000L, 1700000060000000L,
      1700003700000000L, 1700000000000000L, 1700000030000000L)
    for (enc <- Seq("ltz", "ntz", "nanos"))
      assert(loaded(enc).collect().map(_.getLong(1)).toSeq === expected,
        s"encoding $enc")
  }

  test("NTZ load is session-timezone independent") {
    val utc = loaded("ntz").collect().map(_.getLong(1)).toSeq
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try assert(loaded("ntz").collect().map(_.getLong(1)).toSeq === utc)
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("sessionization agrees across encodings") {
    val counts = Seq("ltz", "ntz", "nanos").map { enc =>
      enc -> SparkEntry.queries("q_e_sessionize")(spark, dirs(enc))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    assert(counts("ltz") === Seq((7L, 2L), (8L, 1L)))
    assert(counts("ntz") === counts("ltz"))
    assert(counts("nanos") === counts("ltz"))
  }
}
