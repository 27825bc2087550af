package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.VectorIndexes

/** The vector-index setup vocabulary (index.py / spec.rs:387-399,
  * qdrant.rs:122-124, postgres.rs:507-535, neo4j.rs:683-789) and the
  * SDK's default target naming (utils.py:5-16). */
class VectorIndexesSpec extends AnyFunSuite {

  test("metric vocabulary: wire names, Display forms, per-target maps") {
    assert(VectorIndexes.metrics ===
      Seq("CosineSimilarity", "L2Distance", "InnerProduct"))
    assert(VectorIndexes.defaultMetric === "CosineSimilarity")
    // spec.rs Display: L2Distance shortens to 'L2'
    assert(VectorIndexes.display("L2Distance") === "L2")
    assert(VectorIndexes.display("InnerProduct") === "InnerProduct")
    // qdrant maps to ITS enum — Euclid/Dot, not the Display forms
    assert(VectorIndexes.qdrantDistance ===
      Map("CosineSimilarity" -> "Cosine", "L2Distance" -> "Euclid",
        "InnerProduct" -> "Dot"))
    assert(VectorIndexes.pgOps("InnerProduct") === "vector_ip_ops")
  }

  test("pgvector: HNSW spec, {table}__{field}__{ops} naming, describe") {
    assert(VectorIndexes.pgIndexSpecSql("embedding", "CosineSimilarity")
      === "USING hnsw (embedding vector_cosine_ops)")
    assert(VectorIndexes.pgIndexName("doc_embeddings", "embedding",
      "L2Distance") === "doc_embeddings__embedding__vector_l2_ops")
    assert(VectorIndexes.pgDescribeIndex("t", "v", "InnerProduct")
      === "t__v__vector_ip_ops USING hnsw (v vector_ip_ops)")
  }

  test("default target name: namespace delimiter only when non-empty") {
    assert(VectorIndexes.targetDefaultName("", "TextEmbedding",
      "doc_embeddings") === "TextEmbedding__doc_embeddings")
    assert(VectorIndexes.targetDefaultName("acme", "TextEmbedding",
      "doc_embeddings") === "acme__TextEmbedding__doc_embeddings")
  }

  test("neo4j component names: {n|r}__{label} prefixes, Display metric") {
    assert(VectorIndexes.neoConstraintName(isRel = false, "Document")
      === "n__Document__key")
    assert(VectorIndexes.neoConstraintName(isRel = true, "MENTIONS")
      === "r__MENTIONS__key")
    // the vidx name carries the DISPLAY form — L2, not L2Distance
    assert(VectorIndexes.neoVectorIndexName(isRel = false, "Chunk",
      "embedding", "L2Distance") === "n__Chunk__embedding__L2__vidx")
  }

  test("neo4j DDL: constraint key types, matcher forms, vidx options") {
    assert(VectorIndexes.neoConstraintDdl(isRel = false, "Document",
      Seq("id")) ===
      "CREATE CONSTRAINT n__Document__key IF NOT EXISTS " +
        "FOR (e:Document) REQUIRE e.id IS NODE KEY")
    // composite fields parenthesize; relationships match directed and
    // take RELATIONSHIP KEY
    assert(VectorIndexes.neoConstraintDdl(isRel = true, "MENTIONS",
      Seq("src", "dst")) ===
      "CREATE CONSTRAINT r__MENTIONS__key IF NOT EXISTS " +
        "FOR ()-[e:MENTIONS]->() REQUIRE (e.src, e.dst) " +
        "IS RELATIONSHIP KEY")
    assert(VectorIndexes.neoVectorIndexDdl(isRel = false, "Chunk",
      "embedding", "CosineSimilarity", 1536) ===
      """CREATE VECTOR INDEX n__Chunk__embedding__Cosine__vidx IF NOT EXISTS
        |FOR (e:Chunk) ON e.embedding
        |OPTIONS {
        |    indexConfig: {
        |        `vector.dimensions`: 1536,
        |        `vector.similarity_function`: 'Cosine'
        |    }
        |}""".stripMargin)
    assert(VectorIndexes.neoDropDdl(isConstraint = true,
      "n__Document__key") === "DROP CONSTRAINT n__Document__key IF EXISTS")
    assert(VectorIndexes.neoDropDdl(isConstraint = false,
      "n__Chunk__embedding__Cosine__vidx")
      === "DROP INDEX n__Chunk__embedding__Cosine__vidx IF EXISTS")
  }
}
