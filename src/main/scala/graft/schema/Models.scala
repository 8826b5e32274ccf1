package graft.schema

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** The engine's record types — the wire/storage schema system of the
  * reference pipeline, as Scala case classes with derived StructTypes
  * (SURVEY.md §1.2; Go structs cited per type).
  *
  * Rules carried over from the reference wire format:
  *  - JSON field names are snake_case (Go struct tags).
  *  - `SentimentInput` is FLAT: Go embeds RawContent and overrides `text`
  *    (models/sentiment_analysis_model.go:3-8) — the flattened JSON has a
  *    single `text` key, so we model one flat record, never a nested copy
  *    (SURVEY §7.4 risk 2).
  *  - Optional metadata fields are nullable Strings (`omitempty`).
  *  - `metadata.timestamp` is THE event-time column for watermarks
  *    (models/raw_content_models.go:14).
  */
object Models {

  /** models/newsapi_models.go:9-12 */
  final case class Headline(title: String, url: String)

  /** models/topic_models.go:3-8; category ∈ the 9 values of
    * topic_generation.go:123-132. */
  final case class Topic(title: String, topic: String, category: String, url: String)

  /** models/reddit.models.go:5-14; created_at from epoch-seconds float
    * (reddit_client.go:238). */
  final case class RedditPost(
      topic: String,
      subreddit: String,
      author: String,
      post_title: String,
      post_content: String,
      upvotes: Int,
      created_at: Timestamp,
      id: String)

  /** models/raw_content_models.go:13-19 — sparse; optional = null. */
  final case class ContentMetadata(
      timestamp: Timestamp,
      author: String,
      subreddit: String,
      post_id: String,
      url: String)

  /** models/raw_content_models.go:5-11 — the canonical stream element.
    * content_id = hex(sha256("topic:source:post_id")) (fetch.go:178-182). */
  final case class RawContent(
      content_id: String,
      source: String,
      topic: String,
      text: String,
      metadata: ContentMetadata)

  /** models/sentiment_analysis_model.go:3-8, FLATTENED (see object doc). */
  final case class SentimentInput(
      content_id: String,
      source: String,
      topic: String,
      text: String,
      metadata: ContentMetadata,
      was_summarized: Boolean,
      original_text: String)

  /** models/sentiment_analysis_model.go:10-15 + DynamoDB item layout
    * (db/dynamodb.go:191-236). */
  final case class SentimentResult(
      content_id: String,
      source: String,
      topic: String,
      text: String,
      metadata: ContentMetadata,
      was_summarized: Boolean,
      original_text: String,
      sentiment_score: Double,
      sentiment_label: String,
      confidence: Double)

  // Derived StructTypes — single source of truth for from_json on streams
  // (never infer a schema from a stream).
  val headlineSchema: StructType = Encoders.product[Headline].schema
  val topicSchema: StructType = Encoders.product[Topic].schema
  val redditPostSchema: StructType = Encoders.product[RedditPost].schema
  val rawContentSchema: StructType = Encoders.product[RawContent].schema
  val sentimentInputSchema: StructType = Encoders.product[SentimentInput].schema
  val sentimentResultSchema: StructType = Encoders.product[SentimentResult].schema

  /** The reference's router threshold, strict `>`
    * (raw_content_consumer.go:14,55). */
  val SummaryThreshold = 1024
}
