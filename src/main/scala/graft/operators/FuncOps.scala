package graft.operators

import graft.{QueryDef, Qh}
import graft.enrich.Enrich.LexiconScorer
import graft.functions.Functions
import org.apache.spark.sql.functions._

/** Queries exercising the custom function surface (SURVEY §2.3): the
  * weighted-sentiment UDAF and the T18 json_repair function — each with a
  * DuckDB oracle computing the identical value. */
object FuncOps {
  import Qh._

  val defs: Seq[(String, QueryDef)] = Seq(

    // Weighted-sentiment Aggregator (demo UDAF): n_chars-weighted mean
    // lexicon score per source. Integer basis points inside the buffer
    // keep the fold order-independent, so the UDAF matches plain SQL.
    "func_weighted_sentiment" -> QueryDef(
      (s, d) => tbl(s, d, "documents")
        .select(col("source"), LexiconScorer.scoreCol(col("text")).as("score"),
          col("n_chars").cast("long").as("w"))
        .groupBy("source")
        .agg(Functions.weightedSentiment(col("score"), col("w")).as("wmean"),
          count(lit(1)).as("n"))
        .orderBy("source"),
      Some(s"""SELECT source, ${Functions.weightedSentimentSql("score", "w")} AS wmean,
              |  CAST(COUNT(*) AS BIGINT) AS n
              |FROM (SELECT source, ${LexiconScorer.scoreSql} AS score, n_chars AS w FROM documents)
              |GROUP BY source ORDER BY source""".stripMargin)),

    // T18 json_repair (topic_generation.go:174-198): deterministic dirty
    // JSON built from events.props (LLM chatter + ```json fences + curly
    // quotes), repaired back to parseable JSON, value extracted.
    "func_json_repair" -> QueryDef(
      (s, d) => {
        val dirty = concat(lit("Sure! Here is the JSON: ```json "),
          translate(col("props"), "\"", "“"), lit(" ``` hope this helps"))
        val repaired = Functions.jsonRepair(dirty)
        // Sort FIRST, project AFTER: the range partitioner SAMPLES its
        // child to pick sort boundaries, so any expensive projection
        // below the Sort is evaluated twice (sampling pass + real pass).
        // event_id is a unique total order, so projecting above the Sort
        // yields byte-identical rows in identical order at ~2/3 the cost
        // (profiled at sf0.1: 0.86 s → 0.54 s; get_json_object is the
        // dominant term, the native repair scan is ~30 ms).
        tbl(s, d, "events")
          .select(col("event_id"), col("props"))
          .orderBy("event_id")
          .select(col("event_id"), repaired.as("repaired"),
            get_json_object(repaired, "$.k").cast("int").as("k"))
      },
      Some {
        val dirty = "concat('Sure! Here is the JSON: ```json ', translate(props, '\"', '“'), ' ``` hope this helps')"
        val repaired = Functions.jsonRepairSql(dirty)
        // json_valid guard: DuckDB's json_extract_string RAISES on
        // malformed JSON (e.g. the '' a repair of object-less input
        // yields) where Spark's get_json_object returns null — one bad
        // row must not error the whole oracle query. Both the guard and
        // the extraction are spelled in their portable function forms
        // (DuckCompat maps json_valid / json_extract_string).
        s"""SELECT event_id, $repaired AS repaired,
           |  CASE WHEN json_valid($repaired) THEN CAST(json_extract_string($repaired, '$$.k') AS INTEGER) ELSE NULL END AS k
           |FROM events ORDER BY event_id""".stripMargin
      })
  )
}
