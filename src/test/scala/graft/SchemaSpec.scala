package graft

import java.sql.Timestamp

import graft.schema.Models._
import org.apache.spark.sql.functions._

/** §1.2 schema system: JSON round-trips and the flattened-embedding rule. */
class SchemaSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 00:09:58")
  private val meta = ContentMetadata(ts, "t2_abc", "technology", "p001", null)
  private val raw = RawContent("9f86d081", "reddit", "ai chips", "some post text", meta)

  test("RawContent to_json/from_json round-trip is lossless") {
    val ds = Seq(raw).toDS()
    val json = ds.select(to_json(struct(ds.columns.map(col): _*)).as("j"))
    val back = json.select(from_json(col("j"), rawContentSchema).as("r"))
      .select("r.*").as[RawContent].head()
    assert(back == raw)
  }

  test("SentimentInput is flat: exactly one text field at top level") {
    assert(sentimentInputSchema.fieldNames.count(_ == "text") == 1)
    assert(!sentimentInputSchema.fieldNames.contains("raw"))
    assert(sentimentInputSchema.fieldNames.contains("original_text"))
  }

  test("malformed JSON rows parse to null and are droppable (T1 semantics)") {
    val json = Seq("""{"content_id":"a","source":"s","topic":"t","text":"x","metadata":null}""",
      "not json at all").toDF("value")
    val parsed = json.select(from_json(col("value"), rawContentSchema).as("r"))
    assert(parsed.count() == 2)
    // PERMISSIVE mode yields an all-null struct for corrupt rows; the
    // droppable predicate is a required field being null
    assert(parsed.filter(col("r.content_id").isNotNull).count() == 1)
  }

  test("event-time column is a Spark TimestampType (watermark-able)") {
    assert(rawContentSchema("metadata").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("timestamp")
      .dataType == org.apache.spark.sql.types.TimestampType)
  }
}
