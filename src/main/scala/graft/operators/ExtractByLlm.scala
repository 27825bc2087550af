package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Schema-constrained structured extraction (reference `ExtractByLlm`,
  * extract_by_llm.rs:11-297 + base/json_schema.rs): the declared output
  * type drives a constrained LLM decode, and values come back as typed
  * rows — not free text.
  *
  * Spark-first shape: the output type is a case class whose `Encoder`
  * IS the json-schema analogue — the Dataset carries the struct schema,
  * Catalyst validates/prunes it, and downstream ops are typed. The
  * client boundary is `mapPartitions` with one client per partition and
  * batched calls (the reference caches per-row by fingerprint; that
  * tier lives in graft.incremental).
  *
  * [[StubFactsExtractor]] is the deterministic stand-in for the LLM
  * (no model in this environment): regex field extraction, which is
  * exactly what makes the operator oracle-checkable.
  */
object ExtractByLlm {

  /** Typed extraction client: one batch of (id, text) per call. */
  trait StructExtractor[T] extends Serializable {
    def extractBatch(rows: Seq[(Long, String)]): Seq[T]
  }

  /** Declared output type for the stub extraction (the "JSON schema"). */
  case class DocFacts(doc_id: Long, headword: String, first_num: Long,
      n_words: Int)

  /** Deterministic "LLM": first word, first integer literal (-1 when
    * absent), whitespace word count. */
  final case class StubFactsExtractor() extends StructExtractor[DocFacts] {
    def extractBatch(rows: Seq[(Long, String)]): Seq[DocFacts] =
      rows.map { case (id, text) =>
        val words = text.split("\\s+").filter(_.nonEmpty)
        val num = "[0-9]+".r.findFirstIn(text).map(_.take(18).toLong).getOrElse(-1L)
        DocFacts(id, words.headOption.getOrElse(""), num, words.length)
      }
  }

  /** Extract typed rows from (id, text); client built once per
    * partition, rows batched per call. */
  def extract[T: Encoder](df: DataFrame, idCol: String, textCol: String,
      mkClient: () => StructExtractor[T], batchSize: Int = 64): Dataset[T] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Partitioning.spread(df.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val client = mkClient()
        it.grouped(batchSize).flatMap(client.extractBatch)
      }
  }
}
