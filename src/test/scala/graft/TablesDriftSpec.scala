package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.streaming.StreamQueries

/** Testdata schema-drift canary (VERDICT r6 §3): the driver's
  * events.parquet has already shipped in two `ts` encodings —
  * int64 TIMESTAMP(NANOS) (rounds ≤5) and timestamp[us] TIMESTAMP_NTZ
  * (round 6) — and the silent switch broke 35 queries. This spec builds
  * tiny fixtures in BOTH encodings with the SAME instants and asserts
  * both the batch loader and the streaming loader normalize each to
  * identical session-UTC `TimestampType` micros. The next generator
  * drift fails HERE, by name, not across a third of the registry.
  */
class TablesDriftSpec extends SparkSpec {

  // Two instants, exact to the microsecond: 2024-01-01T00:00:01.500000Z
  // and 2024-06-15T12:34:56.789012Z.
  private val micros = Seq(1704067201500000L, 1718454896789012L)

  private def fixtureDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft-drift-$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Write events.parquet with ts as int64 TIMESTAMP(NANOS, utc=false) —
    * the pre-r6 driver encoding, via the parquet example writer (Spark
    * cannot write nanos itself).
    */
  private def writeNanosFixture(): String = {
    val dir = fixtureDir("nanos")
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema)
      .withConf(new Configuration())
      .build()
    micros.zipWithIndex.foreach { case (us, i) =>
      val g = new SimpleGroup(schema)
      g.add("event_id", i.toLong)
      g.add("ts", us * 1000L)
      writer.write(g)
    }
    writer.close()
    dir
  }

  /** Write events.parquet with ts as TIMESTAMP_NTZ (timestamp[us],
    * isAdjustedToUTC=false) — the r6+ driver encoding.
    */
  private def writeNtzFixture(): String = {
    val dir = fixtureDir("ntz")
    val df = spark.range(micros.size).toDF("event_id")
      .withColumn("us", element_at(typedLit(micros), (col("event_id") + 1).cast("int")))
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readBack(dir: String): (DataType, Seq[Long]) = {
    val ev = Tables(spark, dir).events
    val tpe = ev.schema("ts").dataType
    val vals = ev.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    (tpe, vals)
  }

  test("batch loader normalizes int64-nanos encoding to TimestampType micros") {
    val (tpe, vals) = readBack(writeNanosFixture())
    assert(tpe === TimestampType)
    assert(vals === micros)
  }

  test("batch loader normalizes TIMESTAMP_NTZ encoding to TimestampType micros") {
    val dir = writeNtzFixture()
    // precondition: the fixture really is NTZ on disk
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType === TimestampNTZType)
    val (tpe, vals) = readBack(dir)
    assert(tpe === TimestampType)
    assert(vals === micros)
  }

  test("the live driver testdata parses through the loader (whatever its encoding)") {
    val ev = Tables(spark, sfDir).events
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1L)
  }

  test("streaming loader agrees with the batch loader on both encodings") {
    for (dir <- Seq(writeNanosFixture(), writeNtzFixture())) {
      val stream = StreamQueries.streamEvents(spark, dir)
      assert(stream.schema("ts").dataType === TimestampType)
      val out = StreamQueries.materialize(
        stream.select(col("event_id"), unix_micros(col("ts")).as("us")))
      val vals = out.orderBy("event_id").collect().map(_.getLong(1)).toSeq
      assert(vals === micros)
    }
  }
}
