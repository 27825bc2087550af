#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 6: the archived
legacy Notion ingestion pipeline
(archive/legacy_ingestion/notion_ingestion.py), run FOR REAL.

The service/model/db modules it imports are replaced with
deterministic recording stand-ins (each stand-in's behavior is part of
the recorded case); the pipeline class, its inference helpers, the
document build, the Qdrant point render, and the full run() loop —
including the counters-keep-accumulating-on-late-failure semantics —
are the reference's own code.

Output: src/test/resources/refparity/legacy_ingestion.json, replayed
by LegacyIngestionParitySpec against operators/LegacyIngestion.scala.

Usage: python3 tools/gen_parity_fixtures6.py
Deterministic: frozen clock, fixed inputs, no randomness.
"""
import asyncio
import importlib.util
import json
import os
import sys
import types
import dataclasses

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
os.makedirs(OUT, exist_ok=True)

# ---- stand-in app package -------------------------------------------

def mod(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m

app = mod("app")
app.__path__ = []
mod("app.connectors")
conn = mod("app.connectors.notion_connector")
mod("app.services")
dp = mod("app.services.document_processor")
llm = mod("app.services.llm_service")
neo = mod("app.services.neo4j_service")
qdr = mod("app.services.qdrant_service")
emb = mod("app.services.embedding_service")
rex = mod("app.services.relationship_extractor")
mod("app.models")
docm = mod("app.models.document")
entm = mod("app.models.entities")
relm = mod("app.models.relationships")
dbm = mod("app.database")
cfg = mod("app.config")

# settings: the token map's INSERTION ORDER is the inference scan
# order; security_levels is the config.py:65-71 hierarchy
class _Settings:
    notion_tokens = {
        "public": "",            # unconfigured — must be skipped
        "client": "tokC",
        "partner": "tokC",       # duplicate of client's — first wins
        "employee": "tokE",
        "management": "",
    }
    security_levels = {"public": 1, "client": 2, "partner": 3,
                       "employee": 4, "management": 5}
cfg.settings = _Settings()

# recording service stand-ins
CALLS = {"qdrant_upserts": [], "neo4j": [], "db_adds": []}
FAIL_VECTOR_DOCS = set()

class _Notion:
    def __init__(self, token): self.token = token
    async def get_workspace_pages(self, database_ids=None, page_ids=None,
                                  modified_since=None):
        return PAGES["value"]
conn.NotionConnector = _Notion

class _Processor:
    async def chunk_document(self, content, method, chunk_size,
                             chunk_overlap, language):
        assert (method, chunk_size, chunk_overlap, language) == \
            ("recursive", 1500, 200, "markdown")
        return CHUNKS["value"](content)
dp.DocumentProcessor = _Processor

class _Llm:
    async def extract_entities(self, content):
        return ENTS["value"](content)
llm.LLMService = _Llm

class _Neo4j:
    async def connect(self): pass
    async def ensure_constraints(self): pass
    async def create_document(self, *a, **k): CALLS["neo4j"].append("doc")
    async def create_entities(self, *a, **k): CALLS["neo4j"].append("ents")
    async def create_typed_relationships(self, *a, **k):
        CALLS["neo4j"].append("rels")
neo.Neo4jService = _Neo4j

class _Qdrant:
    async def create_collection(self, name): pass
    async def upsert(self, collection_name, points):
        doc_ids = {p["payload"]["document_id"] for p in points}
        if doc_ids & FAIL_VECTOR_DOCS:
            raise RuntimeError("qdrant down")
        CALLS["qdrant_upserts"].append(
            {"collection": collection_name, "points": points})
qdr.QdrantService = _Qdrant

class _Embedder:
    async def embed_text(self, text):
        return [float(len(text) % 7), 1.0]
emb.EmbeddingService = _Embedder

class _RelExtractor:
    async def extract_relationships(self, text, entities,
                                    document_metadata=None):
        return RELS["value"](text, entities)
rex.RelationshipExtractor = _RelExtractor

@dataclasses.dataclass
class DocumentMetadata:
    title: object = None
    author: object = None
    source: str = ""
    source_id: str = ""
    created_at: object = None
    updated_at: object = None
    department: object = None
    tags: object = None
    security_level: str = ""
    access_level: int = 0
@dataclasses.dataclass
class Document:
    id: str = ""
    content: str = ""
    content_hash: str = ""
    metadata: object = None
    source_type: str = ""
    source_id: str = ""
    status: str = ""
    ingested_at: object = None
@dataclasses.dataclass
class DocumentChunk:
    document_id: str = ""
    chunk_number: int = 0
    text: str = ""
    embedding: object = None
    metadata: object = None
docm.Document = Document
docm.DocumentChunk = DocumentChunk
docm.DocumentMetadata = DocumentMetadata
class _NS:
    def __init__(self, **kw): self.__dict__.update(kw)
entm.Entity = _NS
relm.RelationshipModel = _NS

class _Db:
    def add(self, obj): CALLS["db_adds"].append(obj)
    async def commit(self): pass
class _GetDb:
    async def __aenter__(self): return _Db()
    async def __aexit__(self, *a): pass
dbm.get_db = lambda: _GetDb()

# ---- load the REAL pipeline module ----------------------------------

spec = importlib.util.spec_from_file_location(
    "legacy_notion_ingestion",
    os.path.join(REF, "archive/legacy_ingestion/notion_ingestion.py"))
ni = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ni)

# freeze the clock (ingested_at / the 7-day cutoff)
class _FrozenNow:
    @staticmethod
    def now(*a, **k):
        class _T:
            def isoformat(self): return "2025-08-12T00:00:00"
            def __sub__(self, other): return self
            def __str__(self): return "2025-08-12T00:00:00"
        return _T()
ni.datetime = _FrozenNow

PAGES = {"value": []}
CHUNKS = {"value": lambda c: []}
ENTS = {"value": lambda c: []}
RELS = {"value": lambda c, e: []}

def pipeline(level="employee"):
    p = object.__new__(ni.NotionIngestionPipeline)
    p.security_level = level
    p.status = ni.IngestionStatus()
    p.notion = _Notion("tokE")
    p.processor = _Processor()
    p.llm = _Llm()
    p.neo4j = _Neo4j()
    p.qdrant = _Qdrant()
    p.embedder = _Embedder()
    p.relationship_extractor = _RelExtractor()
    p.database_ids = []
    p.page_ids = []
    return p

fixture = {"settings": {
    "notion_tokens": list(_Settings.notion_tokens.items()),
    "security_levels": list(_Settings.security_levels.items())}}

# ---- 1. _infer_security_level ---------------------------------------

p = pipeline()
fixture["infer_security_level"] = [
    {"token": t, "level": p._infer_security_level(t)}
    for t in ["tokC", "tokE", "tokZ", ""]]

# ---- 2. _infer_department -------------------------------------------

dept_pages = [
    {"name": "dept_present", "page": {"properties": {"Department":
        {"select": {"name": "Custom Dept"}}}}},
    {"name": "dept_key_null_select", "page": {"properties":
        {"Department": {}},
        "parent": {"type": "database_id",
                   "database_title": "Engineering Wiki"}}},
    {"name": "db_engineering", "page": {"properties": {}, "parent":
        {"type": "database_id", "database_title": "Engineering Wiki"}}},
    {"name": "db_sales_beats_marketing", "page": {"properties": {},
        "parent": {"type": "database_id",
                   "database_title": "Marketing And Sales"}}},
    {"name": "db_hr_title_case", "page": {"properties": {}, "parent":
        {"type": "database_id", "database_title": "our HR portal"}}},
    {"name": "db_no_match", "page": {"properties": {}, "parent":
        {"type": "database_id", "database_title": "Random Notes"}}},
    {"name": "db_title_absent", "page": {"properties": {}, "parent":
        {"type": "database_id"}}},
    {"name": "page_parent", "page": {"properties": {}, "parent":
        {"type": "page_id", "database_title": "Engineering Wiki"}}},
    {"name": "no_parent", "page": {"properties": {}}},
]
for c in dept_pages:
    c["department"] = p._infer_department(c["page"])
fixture["infer_department"] = dept_pages
# the live-crash quirk: a present-but-None database_title hits
# None.lower() — record the exception type
try:
    p._infer_department({"properties": {}, "parent":
        {"type": "database_id", "database_title": None}})
    fixture["dept_none_title_quirk"] = "no error"
except AttributeError:
    fixture["dept_none_title_quirk"] = "AttributeError"

# ---- 3. _extract_tags -----------------------------------------------

tag_pages = [
    {"name": "tags_and_category", "page": {"properties": {
        "Tags": {"multi_select": [{"name": "t1"}, {"name": "t2"}]},
        "Category": {"select": {"name": "How-To"}}}}},
    {"name": "tags_only", "page": {"properties": {
        "Tags": {"multi_select": [{"name": "x"}]}}}},
    {"name": "category_empty_string", "page": {"properties": {
        "Tags": {"multi_select": []},
        "Category": {"select": {"name": ""}}}}},
    {"name": "category_only", "page": {"properties": {
        "Category": {"select": {"name": "How-To"}}}}},
    {"name": "category_null_select", "page": {"properties": {
        "Category": {}}}},
    {"name": "none", "page": {"properties": {}}},
]
for c in tag_pages:
    c["tags"] = p._extract_tags(c["page"])
fixture["extract_tags"] = tag_pages

# ---- 4. _create_document --------------------------------------------

def doc_record(d):
    m = d.metadata
    return {"id": d.id, "content": d.content,
            "content_hash": d.content_hash,
            "source_type": d.source_type, "source_id": d.source_id,
            "status": d.status,
            "metadata": {"title": m.title, "author": m.author,
                         "source": m.source, "source_id": m.source_id,
                         "created_at": m.created_at,
                         "updated_at": m.updated_at,
                         "department": m.department, "tags": m.tags,
                         "security_level": m.security_level,
                         "access_level": m.access_level}}

create_cases = []
for name, page in [
    ("full", {"id": "pg1", "content": "hello world",
              "title": "Doc One", "created_by": {"name": "alice"},
              "created_time": "2025-07-01", "last_edited_time": "2025-08-06",
              "properties": {"Tags": {"multi_select": [{"name": "t1"}]},
                             "Category": {"select": {"name": "How-To"}}},
              "parent": {"type": "database_id",
                         "database_title": "Sales Hub"}}),
    ("title_absent_defaults_untitled",
     {"id": "pg2", "content": "body", "properties": {}}),
    ("title_present_none_stays_none",
     {"id": "pg3", "content": "body", "title": None, "properties": {}}),
    ("created_by_absent_author_none",
     {"id": "pg4", "content": "body", "properties": {}}),
]:
    d = asyncio.run(p._create_document(page))
    create_cases.append({"name": name, "page_id": page["id"],
                         "doc": doc_record(d)})
fixture["create_document"] = create_cases

# ---- 5. _process_chunks metadata defaults ---------------------------

CHUNKS["value"] = lambda c: [
    {"text": "chunk zero", "start": 5, "end": 15},
    {"text": "chunk one"},  # start/end absent -> 0 / len(text)
]
doc = Document(id="notion_pgX")
chunks = asyncio.run(p._process_chunks(doc, "whatever"))
fixture["process_chunks"] = [
    {"document_id": c.document_id, "chunk_number": c.chunk_number,
     "text": c.text, "metadata": c.metadata} for c in chunks]

# ---- 6. _store_vectors: the Qdrant point render ---------------------

CALLS["qdrant_upserts"].clear()
meta = DocumentMetadata(title="Doc T", department="Sales",
                        tags=["t1"], security_level="employee",
                        access_level=4, created_at="2025-07-01")
vdoc = Document(id="notion_pgV", metadata=meta)
vchunks = [DocumentChunk(document_id="notion_pgV", chunk_number=i,
                         text=f"text {i}", embedding=[1.0, 2.0],
                         metadata={}) for i in range(2)]
asyncio.run(p._store_vectors(vdoc, vchunks))
up = CALLS["qdrant_upserts"][0]
fixture["store_vectors"] = {
    "collection": up["collection"],
    "points": [{"id": pt["id"],
                "payload_key_order": list(pt["payload"].keys()),
                "payload": pt["payload"]} for pt in up["points"]]}

# ---- 7. the full run() loop: counters survive late failures ---------

PAGES["value"] = [
    {"id": "pgA", "content": "alpha content", "title": "A",
     "properties": {}, "created_by": {"name": "u"},
     "created_time": "c", "last_edited_time": "e"},
    {"id": "pgB", "content": "beta content", "title": "B",
     "properties": {}, "created_by": {"name": "u"},
     "created_time": "c", "last_edited_time": "e"},
    {"id": "pgC", "content": "gamma content", "title": "C",
     "properties": {}, "created_by": {"name": "u"},
     "created_time": "c", "last_edited_time": "e"},
]
CHUNKS["value"] = lambda c: [{"text": c[:4]}, {"text": c[4:8]}]
ENTS["value"] = lambda c: [_NS(name="E1")] if "beta" in c else []
RELS["value"] = lambda c, e: []
# pgB fails at step 5 (vector store) AFTER chunk/entity counters
FAIL_VECTOR_DOCS.clear()
FAIL_VECTOR_DOCS.add("notion_pgB")
CALLS["qdrant_upserts"].clear()

rp = pipeline()
status = asyncio.run(rp.run(full_scan=True, auto_approve=False))
fixture["run_status"] = {
    "total_pages": status.total_pages,
    "processed_pages": status.processed_pages,
    "failed_pages": status.failed_pages,
    "new_chunks": status.new_chunks,
    "new_entities": status.new_entities,
    "new_relationships": status.new_relationships,
    "errors": status.errors,
}

with open(os.path.join(OUT, "legacy_ingestion.json"), "w") as f:
    json.dump(fixture, f, indent=1, sort_keys=True, ensure_ascii=False)
print("wrote legacy_ingestion.json:",
      {k: (len(v) if isinstance(v, list) else "obj")
       for k, v in fixture.items()})
