package graft.sinks

/** The engine's vector-index setup vocabulary — the deterministic
  * naming/DDL tier the targets share, driven by the SDK's
  * three-metric enum (python/cocoindex/index.py:6-29 and its engine
  * twin spec.rs:387-399):
  *
  *   - wire names `CosineSimilarity | L2Distance | InnerProduct`
  *     (the SDK enum values / spec.rs serde);
  *   - Display short forms `Cosine | L2 | InnerProduct`
  *     (spec.rs:393-399) — these land VERBATIM in Neo4j component
  *     names and the Cypher similarity_function option;
  *   - the Qdrant `Distance` mapping (qdrant.rs:122-124, default
  *     CosineSimilarity at :17);
  *   - the pgvector operator classes + HNSW DDL + index naming
  *     (postgres.rs:507-535);
  *   - the Neo4j component key names, constraint/vector-index DDL
  *     and drops (neo4j.rs:683-699, :739-789; matcher forms
  *     property_graph.rs:77-82);
  *   - the SDK's default target name composition (utils.py:5-16).
  *
  * Pure constants and string composition — setup-time only, never on
  * a data path.
  */
object VectorIndexes {

  /** The enum's wire names (index.py:6-10; spec.rs:387-391). */
  val metrics: Seq[String] =
    Seq("CosineSimilarity", "L2Distance", "InnerProduct")

  /** The Qdrant target's default metric (qdrant.rs:17) — VectorIndexDef
    * itself carries no engine-wide default; metric is a required field
    * (index.py:13-19; spec.rs:403-407). */
  val defaultMetric: String = "CosineSimilarity"

  /** The Display short forms (spec.rs:393-399). */
  val display: Map[String, String] = Map(
    "CosineSimilarity" -> "Cosine",
    "L2Distance" -> "L2",
    "InnerProduct" -> "InnerProduct")

  /** Qdrant's Distance enum (qdrant.rs:122-124) — note L2 maps to
    * `Euclid` and inner product to `Dot`, NOT the Display forms. */
  val qdrantDistance: Map[String, String] = Map(
    "CosineSimilarity" -> "Cosine",
    "L2Distance" -> "Euclid",
    "InnerProduct" -> "Dot")

  /** pgvector operator classes (postgres.rs:507-511). */
  val pgOps: Map[String, String] = Map(
    "CosineSimilarity" -> "vector_cosine_ops",
    "L2Distance" -> "vector_l2_ops",
    "InnerProduct" -> "vector_ip_ops")

  /** The HNSW index clause (postgres.rs:514-521). */
  def pgIndexSpecSql(field: String, metric: String): String =
    s"USING hnsw ($field ${pgOps(metric)})"

  /** `{table}__{field}__{ops}` (postgres.rs:523-530). */
  def pgIndexName(table: String, field: String, metric: String): String =
    s"${table}__${field}__${pgOps(metric)}"

  /** `{name} {spec}` (postgres.rs:532-535). */
  def pgDescribeIndex(table: String, field: String,
      metric: String): String =
    s"${pgIndexName(table, field, metric)} ${pgIndexSpecSql(field, metric)}"

  /** get_target_default_name (utils.py:5-16): app-namespace with its
    * trailing delimiter (setting.py:14-36 — appended only when the
    * namespace is non-empty) + flow name + delimiter + target name. */
  def targetDefaultName(namespace: String, flowName: String,
      targetName: String, delimiter: String = "__"): String =
    graft.dataflow.Naming.appNamespaceWithDelimiter(namespace,
      Some(delimiter)) + flowName + delimiter + targetName

  // ---- Neo4j component tier (neo4j.rs) --------------------------

  /** Element matchers (property_graph.rs:77-82): relationships match
    * directed, `()-[e:T]->()`. */
  def neoMatcher(isRel: Boolean, label: String,
      varName: String = "e"): String =
    if (isRel) s"()-[$varName:$label]->()" else s"($varName:$label)"

  /** Component key names (neo4j.rs:683-699): `{n|r}__{label}__key`
    * for the key constraint. */
  def neoConstraintName(isRel: Boolean, label: String): String =
    s"${if (isRel) "r" else "n"}__${label}__key"

  /** `{prefix}__{label}__{field}__{Display}__vidx` — the DISPLAY
    * short form, not the wire name (neo4j.rs:690-697 formats the
    * metric with its Display impl). */
  def neoVectorIndexName(isRel: Boolean, label: String, field: String,
      metric: String): String =
    s"${if (isRel) "r" else "n"}__${label}__${field}__" +
      s"${display(metric)}__vidx"

  /** `e.a` alone, `(e.a, e.b)` for composites (neo4j.rs:791-800). */
  def neoCompositeFields(fields: Seq[String],
      varName: String = "e"): String = {
    val strs = fields.map(f => s"$varName.$f").mkString(", ")
    if (fields.length == 1) strs else s"($strs)"
  }

  /** The key-constraint DDL (neo4j.rs:745-754) — key type NODE KEY
    * vs RELATIONSHIP KEY follows the element side. */
  def neoConstraintDdl(isRel: Boolean, label: String,
      fields: Seq[String]): String = {
    val keyType = if (isRel) "RELATIONSHIP" else "NODE"
    s"CREATE CONSTRAINT ${neoConstraintName(isRel, label)} " +
      s"IF NOT EXISTS FOR ${neoMatcher(isRel, label)} " +
      s"REQUIRE ${neoCompositeFields(fields)} IS $keyType KEY"
  }

  /** The vector-index DDL (neo4j.rs:756-771): dimensions + the
    * Display-form similarity function, formatdoc shape preserved. */
  def neoVectorIndexDdl(isRel: Boolean, label: String, field: String,
      metric: String, vectorSize: Int): String = {
    val name = neoVectorIndexName(isRel, label, field, metric)
    s"""CREATE VECTOR INDEX $name IF NOT EXISTS
       |FOR ${neoMatcher(isRel, label)} ON e.$field
       |OPTIONS {
       |    indexConfig: {
       |        `vector.dimensions`: $vectorSize,
       |        `vector.similarity_function`: '${display(metric)}'
       |    }
       |}""".stripMargin
  }

  /** The drop forms (neo4j.rs:777-789): constraints drop as
    * CONSTRAINT, vector indexes as INDEX. */
  def neoDropDdl(isConstraint: Boolean, name: String): String =
    s"DROP ${if (isConstraint) "CONSTRAINT" else "INDEX"} $name IF EXISTS"
}
