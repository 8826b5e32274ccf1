package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.pipeline.Pipelines
import graft.schema.Models
import graft.schema.Models._
import graft.sources.Sources
import graft.streaming.Streaming
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** §5.5 pipeline e2e: the full ingest→route→score→sink DAG, batch and
  * streaming, sharing the same transforms; restart produces no duplicate
  * content_ids (the reference's end-to-end contract: at-least-once +
  * idempotent by content_id). */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 00:09:58")
  private def post(id: String, text: String) =
    RedditPost("ai", "technology", s"u_$id", "t", text, 1, ts, id)

  private val posts = Seq(
    post("p1", "a good great release"),
    post("p2", "terrible broken mess"),
    post("p3", ("A long sentence that repeats. " * 50).trim), // summary branch
    post("p4", "   "), // dropped
    post("p1", "a good great release")) // dup (topic,id)

  test("batch e2e: ingest → route/summarize → score → TTL results table") {
    val table = Files.createTempDirectory("graft_e2e_").toFile.getAbsolutePath + "/results"
    val scored = Pipelines.endToEnd(posts.toDS())
    Sources.appendWithTtl(scored.toDF(), table, "content_id")
    val cur = Sources.readCurrent(spark, table, "content_id")
    assert(cur.count() == 3) // p4 dropped, p1 deduped
    val byPost = cur.select(col("metadata.post_id"), col("sentiment_label"), col("was_summarized"))
      .as[(String, String, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(byPost("p1")._2 == "POSITIVE" && !byPost("p1")._3)
    assert(byPost("p2")._2 == "NEGATIVE")
    assert(byPost("p3")._3, "long post must be summarized")
  }

  test("responses.json-shaped replay: captured extractor output → topicGen → anti-join → TTL table") {
    // Mirrors the reference's checked-in `responses.json` (root of the
    // repo; schema models/openai_models.go:3-5 — {"topics": [{title,
    // topic, category, url}]}): a CAPTURED extraction response replayed
    // through the topic pipeline in place of the live model, exactly how
    // the reference replays its recorded OpenAI output. The fixture is
    // synthetic but shape-identical, including the edge rows the pipeline
    // exists to handle: an empty-url extraction, a url emitted twice, and
    // a url already present in the stored snapshot.
    val raw = spark.read.option("multiLine", true)
      .json("src/test/resources/responses_fixture.json")
    // exact reference shape: one `topics` array of 4-string-field objects
    assert(raw.schema.fieldNames.toSeq == Seq("topics"))
    val captured = raw.select(explode(col("topics")).as("t"))
      .select(col("t.title").as("title"), col("t.topic").as("topic"),
        col("t.category").as("category"), col("t.url").as("url"))
      .as[Topic].collect()
    assert(captured.length == 30)

    // replay extractor: answers each headline batch from the captured
    // responses, keyed by title — the fixture IS the model output
    val byTitle = captured.map(t => t.title -> t).toMap
    val replay = new graft.enrich.Enrich.TopicExtractor {
      override def extractBatch(hs: Seq[Models.Headline]): Seq[Topic] =
        hs.map(h => byTitle(h.title))
    }
    val headlines = captured.toSeq.map(t => Models.Headline(t.title, t.url)).toDS()
    val stored = Seq(Topic("seen", "seen", "Sports",
      "https://news.example.com/articles/stored")).toDS()

    val out = Pipelines.topicGen(headlines, stored, replay)
    val table = Files.createTempDirectory("graft_topics_").toFile.getAbsolutePath + "/topics"
    Sources.upsertWithTtl(out.toDF(), table, "url")
    val cur = Sources.readCurrent(spark, table, "url").as[Topic].collect()

    // 30 captured − 1 empty-url − 1 in-batch url dup − 1 already stored
    assert(cur.length == 27)
    assert(!cur.exists(_.url == ""), "empty-url extraction must be dropped")
    assert(!cur.exists(_.url.endsWith("/stored")), "anti-join must drop stored urls")
    val dupSurvivor = cur.filter(_.url.endsWith("/dup"))
    assert(dupSurvivor.length == 1 &&
      dupSurvivor.head.title.startsWith("Aardvark"), "url dedup keeps first by title")
    // replayed rows arrive verbatim: no mutation between capture and table
    cur.foreach(t => assert(byTitle(t.title) == t))
  }

  test("wire-level streaming: posts → toWire 'topic' files → fromWire stream → score (K1/T1/T2)") {
    val dir = Files.createTempDirectory("graft_wire_").toFile.getAbsolutePath
    val topicDir = s"$dir/topic"; val ckpt = s"$dir/ckpt"; val table = s"$dir/results"
    // producer side: serialize to Kafka wire shape, land on the "topic"
    Sources.toWire(posts.take(3).toDS().toDF(), "id")
      .write.mode("overwrite").json(topicDir)
    // consumer side: stream the topic, parse, drop malformed, score, sink
    val wireSchema = org.apache.spark.sql.types.StructType.fromDDL("key STRING, value STRING")
    val q = spark.readStream.schema(wireSchema).json(topicDir)
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val parsed = Sources.fromWire(batch, Models.redditPostSchema, "id").as[RedditPost]
        Sources.upsertWithTtl(Pipelines.endToEnd(parsed).toDF(), table, "content_id")
      }.start()
    q.awaitTermination()
    val cur = Sources.readCurrent(spark, table, "content_id")
    assert(cur.count() == 3)
    assert(cur.filter(col("sentiment_label") === "").count() == 0)
  }

  test("streaming e2e with kill/restart: same results as batch, no duplicate content_ids") {
    val dir = Files.createTempDirectory("graft_e2es_").toFile.getAbsolutePath
    val src = s"$dir/in"; val table = s"$dir/results"; val ckpt = s"$dir/ckpt"
    new java.io.File(src).mkdirs()
    def land(name: String, ps: Seq[RedditPost]): Unit = {
      val stage = s"$dir/stage_$name"
      ps.toDS().coalesce(1).write.mode("overwrite").json(stage)
      new java.io.File(stage).listFiles().filter(_.getName.endsWith(".json"))
        .foreach(f => Files.move(f.toPath, new java.io.File(src, s"$name.json").toPath))
    }
    def run(): Unit = {
      val stream = Streaming.jsonFileSource(spark, src, Models.redditPostSchema)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val scored = Pipelines.endToEnd(batch.as[RedditPost])
          // check-before-publish (reference fetch.go:155-173): cross-batch
          // dedup against the store makes the at-least-once stream
          // exactly-once-by-content_id at the table
          Sources.upsertWithTtl(scored.toDF(), table, "content_id")
        }.start()
      q.awaitTermination()
    }
    land("b1", posts.take(3))
    run() // processes batch 1, then "dies"
    land("b2", posts.drop(3))
    run() // restart from checkpoint; must not reprocess b1
    val cur = Sources.readCurrent(spark, table, "content_id")
    assert(cur.count() == 3)
    // raw appended file rows: each content_id written exactly once
    val perId = spark.read.parquet(table).groupBy("content_id").count()
    assert(perId.filter(col("count") =!= 1).count() == 0, "no duplicate writes across restart")
    val batchResult = Pipelines.endToEnd(posts.toDS())
      .select("content_id", "sentiment_label").as[(String, String)].collect().toSet
    val streamResult = cur.select("content_id", "sentiment_label").as[(String, String)].collect().toSet
    assert(streamResult == batchResult, "stream == batch end to end")
  }
}
