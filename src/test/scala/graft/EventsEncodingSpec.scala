package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.scalatest.funsuite.AnyFunSuite

/** The driver testdata has shipped `events.ts` under two parquet
  * encodings: TIMESTAMP(NANOS, adjustedToUTC) — which Spark's vectorized
  * reader only accepts as a raw long under
  * `spark.sql.legacy.parquet.nanosAsLong` — and plain
  * timestamp[us] (TIMESTAMP(MICROS, not adjusted) → TIMESTAMP_NTZ).
  * [[Queries.events]] branches on the landed type; only the encoding the
  * driver currently ships is exercised by the gate, so this spec writes
  * a tiny fixture in EACH encoding (via parquet-java, byte-controlled —
  * no Spark writer involved) holding the same instants and proves both
  * branches produce identical rows.
  */
class EventsEncodingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  // same logical instants, micro precision; the nanos fixture adds
  // sub-microsecond residue that the `ts DIV 1000` branch must truncate
  private val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z
  private val rows = Seq(
    (1L, baseMicros, 10L, "click", 1.5, "{}"),
    (2L, baseMicros + 1L, 11L, "view", 2.5, "{\"a\":1}"),
    (3L, baseMicros + 999999L, 10L, "click", 0.0, "{}"),
    (4L, baseMicros + 86400000000L, 12L, "purchase", 9.75, "{\"b\":2}"),
    (5L, baseMicros + 86400000001L, 11L, "view", -1.0, "{}"))

  private def schemaWith(tsType: LogicalTypeAnnotation): MessageType =
    Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64).as(tsType).named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")

  /** Writes `<dir>/events.parquet` with ts = tsOf(micros) under the
    * given logical type.
    */
  private def writeFixture(tsType: LogicalTypeAnnotation,
      tsOf: Long => Long): String = {
    val dir = Files.createTempDirectory("events-enc").toString
    val schema = schemaWith(tsType)
    val w = ExampleParquetWriter.builder(new HPath(s"$dir/events.parquet"))
      .withType(schema).withConf(new Configuration()).build()
    try rows.foreach { case (id, us, uid, et, v, p) =>
      val g = new SimpleGroup(schema)
      g.add("event_id", id)
      g.add("ts", tsOf(us))
      g.add("user_id", uid)
      g.add("event_type", et)
      g.add("value", v)
      g.add("props", p)
      w.write(g)
    } finally w.close()
    dir
  }

  test("nanos-as-long and timestamp[us] encodings produce identical rows") {
    // rounds ≤7 encoding: nanos, adjusted to UTC; +999 ns of residue
    // must truncate away in the `ts DIV 1000` branch
    val nanosDir = writeFixture(
      LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS),
      us => us * 1000L + 999L)
    // round-8 encoding: micros, NOT adjusted (pyarrow timestamp[us]) —
    // lands as TIMESTAMP_NTZ, cast to session-TZ timestamp (UTC here)
    val microsDir = writeFixture(
      LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS),
      identity)

    val a = Queries.events(spark, nanosDir)
    val b = Queries.events(spark, microsDir)
    // both branches land on the same session-TZ TIMESTAMP type...
    assert(a.schema == b.schema,
      s"schema divergence:\n${a.schema}\nvs\n${b.schema}")
    // ...and identical values, instant for instant
    val ra = a.orderBy("event_id").collect().toSeq
    val rb = b.orderBy("event_id").collect().toSeq
    assert(ra == rb, s"row divergence:\n$ra\nvs\n$rb")
    assert(ra.size == rows.size)
    // pin the instant math itself, not just cross-branch agreement
    val ts3 = ra(2).getTimestamp(ra.head.fieldIndex("ts")).getTime
    assert(ts3 == (baseMicros + 999999L) / 1000L,
      s"row 3 instant wrong: $ts3")
  }
}
