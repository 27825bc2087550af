package graft.types

import org.apache.spark.sql.types._

/** The reference engine's type system mapped onto Spark SQL types —
  * SURVEY.md §1.1's table as code (src/base/schema.rs:21-148,
  * EnrichedValueType schema.rs:246-255).
  *
  * Scalars map 1:1; the three table kinds map to DataFrame shapes:
  *  - UTable (unordered, keyless)  → plain rows / ArrayType(Struct)
  *  - KTable (first field = key)   → rows + a key column (sources MUST
  *    be keyed, analyzer.rs:671-675 — enforced by Flow.importSource)
  *  - LTable (order-preserving)    → ArrayType(Struct) + index column
  *    when exploded (Scope.forEach emits exactly that index)
  *
  * `attrs` (e.g. CHUNK_BASE_TEXT provenance,
  * split_recursively.rs:1022-1026) ride in StructField.metadata.
  */
object SchemaMapping {

  /** Reference scalar type name → Spark DataType. */
  val scalar: Map[String, DataType] = Map(
    "Bytes" -> BinaryType,
    "Str" -> StringType,
    "Bool" -> BooleanType,
    "Int64" -> LongType,
    "Float32" -> FloatType,
    "Float64" -> DoubleType,
    // (start, end) char offsets into a base text (value.rs:26-31)
    "Range" -> StructType(Seq(
      StructField("start", LongType, nullable = false),
      StructField("end", LongType, nullable = false))),
    "Uuid" -> StringType, // canonical text form
    "Date" -> DateType,
    "Time" -> LongType, // nanos since midnight: no native Spark type
    "LocalDateTime" -> TimestampNTZType,
    "OffsetDateTime" -> TimestampType, // session-UTC instant
    "TimeDelta" -> DayTimeIntervalType(),
    "Json" -> StringType) // JSON text; VariantType once stabilized

  /** Vector(elem, dim): array of the element type, dim recorded in
    * column metadata (schema.rs:7-10).
    */
  def vector(elem: DataType, dim: Option[Int]): (DataType, Metadata) = {
    val md = dim match {
      case Some(d) => new MetadataBuilder().putLong("dim", d.toLong).build()
      case None => Metadata.empty
    }
    (ArrayType(elem, containsNull = false), md)
  }

  /** Untagged union (schema.rs:13-15, LLM outputs): one nullable field
    * per variant plus a tag — the closest static-schema encoding.
    */
  def union(variants: Seq[(String, DataType)]): StructType =
    StructType(
      StructField("_tag", StringType, nullable = false) +:
        variants.map { case (n, t) => StructField(n, t, nullable = true) })

  /** EnrichedValueType { typ, nullable, attrs } → StructField. */
  def field(name: String, typ: DataType, nullable: Boolean,
      attrs: Map[String, String] = Map.empty): StructField = {
    val md = attrs.foldLeft(new MetadataBuilder()) { case (b, (k, v)) =>
      b.putString(k, v)
    }.build()
    StructField(name, typ, nullable, md)
  }

  /** Nested LTable column: array<struct> whose explode carries an
    * index (ordering) column — pair with Scope.forEach. */
  def ltable(row: StructType): ArrayType = ArrayType(row, containsNull = false)

  /** Nested KTable column: array<struct> with the key as first field;
    * key uniqueness is the writer's invariant (schema.rs:143-145). */
  def ktable(keyField: StructField, rest: Seq[StructField]): ArrayType =
    ArrayType(StructType(keyField +: rest), containsNull = false)

  /** The well-known field-attribute names (src/base/field_attrs.rs:
    * 1-18) that ride `attrs` → StructField.metadata. */
  object FieldAttrs {
    val Prefix = "cocoindex.io/"
    val ContentFilename = Prefix + "content_filename"
    val ContentMimeType = Prefix + "content_mime_type"
    val ChunkBaseText = Prefix + "chunk_base_text"
    val EmbeddingOriginText = Prefix + "embedding_origin_text"
  }
}
