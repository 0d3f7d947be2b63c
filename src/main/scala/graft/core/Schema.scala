package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import java.sql.Timestamp

/**
 * Typed entity model (SURVEY §1): the five Newsify "tables" as case
 * classes with Catalyst encoders — `Dataset[Article]` etc. give
 * compile-time field checks at API boundaries while staying columnar
 * (product encoders, not Kryo blobs) so Catalyst still prunes and pushes
 * down through typed operations.
 *
 * Schemas follow the reference exactly (articles:
 * duplication_service.py:94-98 + ingestion_service.py:62-72; stories:
 * duplication_service.py:100-108; interactions:
 * user_behaviour_service.py:57-62; recommendations:
 * recommendation-trainer.py:259-263; user embeddings:
 * recommendation-trainer.py:71-76).
 */
case class Article(
    guid: String,
    title: String,
    description: Option[String],
    pubDate: Option[Timestamp],
    link: String,                       // primary key
    source: String,
    text: String,
    ingestionTime: Timestamp,
    embedding: Option[Seq[Float]],      // 384-d in the reference model
    entities: Option[Seq[String]],
    storyId: Option[String],
    processedAt: Option[Timestamp])

case class Story(
    storyId: String,
    articles: Seq[String],              // array-of-FK → Article.link
    centroid: Seq[Float],
    entities: Seq[String],
    createdAt: Timestamp,
    lastUpdated: Timestamp,
    summary: Option[String],
    lastSummarized: Option[Timestamp])

case class Interaction(
    userId: String,
    eventType: String,                  // click | read | like | share
    storyId: Option[String],
    eventTime: Timestamp,
    metadata: Map[String, String])

case class ScoredStory(storyId: String, score: Double)

case class Recommendation(
    userId: String,
    recommendations: Seq[ScoredStory],  // the one nested column in the system
    lastUpdated: Timestamp)

case class UserEmbedding(userId: String, embedding: Seq[Float], lastUpdated: Timestamp)

case class BiasReport(
    logId: Long,
    userId: String,
    diversityScore: Double,
    averageSentiment: Double,
    biasFlag: Boolean,
    explanation: String,
    timestamp: Timestamp)

object Schema {
  implicit val articleEnc: Encoder[Article] = Encoders.product[Article]
  implicit val storyEnc: Encoder[Story] = Encoders.product[Story]
  implicit val interactionEnc: Encoder[Interaction] = Encoders.product[Interaction]
  implicit val recommendationEnc: Encoder[Recommendation] = Encoders.product[Recommendation]
  implicit val userEmbeddingEnc: Encoder[UserEmbedding] = Encoders.product[UserEmbedding]
  implicit val biasReportEnc: Encoder[BiasReport] = Encoders.product[BiasReport]

  def articles(df: org.apache.spark.sql.DataFrame): Dataset[Article] = df.as[Article]
  def stories(df: org.apache.spark.sql.DataFrame): Dataset[Story] = df.as[Story]
}
