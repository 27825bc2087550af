#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 2.

Same contract as gen_parity_fixtures.py: run the PURE reference
modules from /root/reference over deterministic inputs and record
their ACTUAL outputs under src/test/resources/refparity/.
ReferenceParity2Spec replays the inputs through the Scala
implementations.

Modules here need import-time stubs (tenacity, tiktoken,
sentence_transformers, sklearn, service clients); every stub is a
pure deterministic stand-in recorded in the fixture so the Scala
side injects the SAME stand-in. The algorithms under test are the
reference's own, executed by the reference.

Usage: python3 tools/gen_parity_fixtures2.py
Deterministic: fixed input lists, no randomness, no timestamps.
"""
import hashlib
import importlib.util
import json
import os
import sys
import types

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
sys.path.insert(0, REF)

os.makedirs(OUT, exist_ok=True)


def dump(name, obj):
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True, ensure_ascii=False)
    print(f"wrote {name}")


def load_file(modname, relpath, pre=None):
    """Load a reference module FILE directly (skipping package
    __init__ chains that pull live clients)."""
    if pre:
        pre()
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---- app/utils/retry.py: the backoff schedules ----------------------
# tenacity only decorates retry_on_failure (not under test here);
# stub it so the module imports.
_ten = types.ModuleType("tenacity")
for _n in ("retry", "stop_after_attempt", "wait_exponential",
           "retry_if_exception_type", "before_log", "after_log"):
    setattr(_ten, _n, lambda *a, **k: (lambda f: f))
sys.modules["tenacity"] = _ten

retry_mod = load_file("ref_retry", "app/utils/retry.py")

RETRY_GRID = [
    # (fails_before_success, max_attempts, factor, initial, max)
    (0, 3, 2.0, 1.0, 60.0),
    (1, 3, 2.0, 1.0, 60.0),
    (2, 3, 2.0, 1.0, 60.0),
    (3, 3, 2.0, 1.0, 60.0),   # exhausts: raises last error
    (5, 3, 2.0, 1.0, 60.0),
    (0, 1, 2.0, 1.0, 60.0),
    (1, 1, 2.0, 1.0, 60.0),   # max_attempts=1: no sleeps at all
    (4, 5, 3.0, 0.5, 4.0),    # cap: 0.5, 1.5, 4(cap), 4(cap)
    (3, 4, 1.5, 1.0, 2.0),    # cap after second sleep
    (2, 5, 2.5, 1.0, 60.0),
]

rrows = []
for fails, ma, bf, iw, mw in RETRY_GRID:
    sleeps = []
    retry_mod.time.sleep = lambda s: sleeps.append(s)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= fails:
            raise ValueError(f"boom{calls['n']}")
        return "ok"

    try:
        out = retry_mod.retry_sync(
            flaky, max_attempts=ma, backoff_factor=bf,
            initial_wait=iw, max_wait=mw)
        outcome = out
    except ValueError as e:
        outcome = f"error:{e}"
    rrows.append({"fails": fails, "max_attempts": ma,
                  "backoff_factor": bf, "initial_wait": iw,
                  "max_wait": mw, "sleeps": sleeps,
                  "calls": calls["n"], "outcome": outcome})

# retry_async has the same body (asyncio.sleep); record it agrees
import asyncio  # noqa: E402

arows = []
for fails, ma, bf, iw, mw in RETRY_GRID:
    sleeps = []

    async def fake_sleep(s):
        sleeps.append(s)

    retry_mod.asyncio.sleep = fake_sleep
    calls = {"n": 0}

    async def aflaky():
        calls["n"] += 1
        if calls["n"] <= fails:
            raise ValueError(f"boom{calls['n']}")
        return "ok"

    try:
        out = asyncio.run(retry_mod.retry_async(
            aflaky, max_attempts=ma, backoff_factor=bf,
            initial_wait=iw, max_wait=mw))
        outcome = out
    except ValueError as e:
        outcome = f"error:{e}"
    arows.append({"fails": fails, "max_attempts": ma,
                  "backoff_factor": bf, "initial_wait": iw,
                  "max_wait": mw, "sleeps": sleeps,
                  "calls": calls["n"], "outcome": outcome})

dump("retry.json", {"sync": rrows, "async": arows})

# ---- app/config_validator.py ----------------------------------------
FULL = dict(database_url="postgres://x", redis_url="redis://x",
            supabase_url="https://s", supabase_key="sk",
            qdrant_url="http://q", neo4j_uri="bolt://n",
            neo4j_user="neo4j", neo4j_password="pw",
            llamaparse_api_key="lk", openai_api_key="ok",
            google_ai_api_key="gk", environment="development")

CONFIG_CASES = [
    dict(FULL),
    {**{k: None for k in FULL}, "environment": "development"},
    {**{k: "" for k in FULL}, "environment": "development"},
    {**FULL, "openai_api_key": None},
    {**FULL, "google_ai_api_key": ""},
    {**FULL, "openai_api_key": None, "google_ai_api_key": None},
    {**FULL, "llamaparse_api_key": ""},
    {**FULL, "redis_url": None, "neo4j_password": "",
     "openai_api_key": "", "google_ai_api_key": None},
    {**FULL, "environment": "production"},
    # production + invalid: module import calls sys.exit(1)
    {**FULL, "database_url": None, "environment": "production"},
]

crows = []
for i, cfg in enumerate(CONFIG_CASES):
    def put_cfg(cfg=cfg):
        m = types.ModuleType("app.config")
        m.settings = types.SimpleNamespace(**cfg)
        sys.modules["app.config"] = m

    row = {"case": i, "settings": cfg}
    try:
        cv = load_file(f"ref_cfgval_{i}", "app/config_validator.py",
                       pre=put_cfg)
        try:
            cv.validate_config()
            row["error"] = None
        except Exception as e:
            row["error"] = str(e)
        row["status"] = cv.get_config_status()
    except SystemExit as e:
        row["exit"] = e.code
    crows.append(row)
del sys.modules["app.config"]
dump("config_validator.json", crows)

# ---- app/processors/semantic_chunker.py -----------------------------
# The model is an encode() boundary; the stand-in below is shared
# byte-for-byte with SemanticChunkerRow.stubEncode: 16 dims, per
# lowercase whitespace token dim i accumulates (md5_byte_i - 127.5)
# (exact multiples of 0.5 -> exact double sums on both sides);
# token-free sentence -> [1,0,...]. Cosine = dot/(sqrt(na)*sqrt(nb)),
# sequential accumulation, same operation order as the Scala twin.
import math  # noqa: E402

import numpy as np  # noqa: E402


def enc_one(s):
    toks = s.lower().split()
    v = [0.0] * 16
    if not toks:
        v[0] = 1.0
        return v
    for t in toks:
        d = hashlib.md5(t.encode("utf-8")).digest()
        for i in range(16):
            v[i] += d[i] - 127.5
    return v


def stub_cosine_matrix(X):
    rows = [list(map(float, r)) for r in X]
    out = []
    for a in rows:
        row = []
        for b in rows:
            dot = 0.0
            na = 0.0
            nb = 0.0
            for x, y in zip(a, b):
                dot += x * y
                na += x * x
                nb += y * y
            row.append(dot / (math.sqrt(na) * math.sqrt(nb)))
        out.append(row)
    return np.array(out, dtype=np.float64)


def put_embed_stubs():
    st = types.ModuleType("sentence_transformers")

    class _ST:
        def __init__(self, *a, **k):
            pass

        def encode(self, sentences):
            return np.array([enc_one(s) for s in sentences],
                            dtype=np.float64)

    st.SentenceTransformer = _ST
    sys.modules["sentence_transformers"] = st
    sk = types.ModuleType("sklearn")
    skm = types.ModuleType("sklearn.metrics")
    skp = types.ModuleType("sklearn.metrics.pairwise")
    skp.cosine_similarity = stub_cosine_matrix
    sk.metrics = skm
    skm.pairwise = skp
    sys.modules["sklearn"] = sk
    sys.modules["sklearn.metrics"] = skm
    sys.modules["sklearn.metrics.pairwise"] = skp


sem_mod = load_file("ref_semchunk", "app/processors/semantic_chunker.py",
                    pre=put_embed_stubs)

# near-duplicate consecutive sentences give HIGH cosine (shared
# tokens) so the no-boundary and merge arms fire; unrelated-vocab
# sentences give near-zero cosine so the boundary arm fires
SEM_TEXTS = [
    ("Dr. Smith examined the pump rotor. Mr. Jones replaced the worn "
     "valve! J. Watson recorded the readings? The system restarted "
     "after maintenance."),
    ("The pump rotor spins fast. The pump rotor spins very fast. "
     "The pump rotor spins quite fast today. Valve seats show heavy "
     "corrosion damage. Valve seats show heavy corrosion marks. "
     "Quarterly budget figures improved overall."),
    "Dup. Dup. Dup. Dup.",
    "Héllo wörld. Ééé café! Déjà vu? Fin.",
    "",
    "   ",
    "single sentence without terminator",
    ("The quick brown fox, seen at dawn, jumped over fences. It ran "
     "away fast, then vanished. We watched quietly."),
    "ends here. next starts lowercase so no split happens. Ok then.",
    " ".join(
        f"Cluster {i // 4} topic sentence number {i} mentions shared "
        f"cluster {i // 4} keywords plus item {i * 7}." for i in range(24)),
]

SEM_CONFIGS = [
    # (threshold, min_chunk, max_chunk, maintain_context)
    (0.5, 50, 200, True),    # reference defaults
    (0.5, 0, 100, True),     # the two-tier child config
    (0.3, 10, 30, False),
    (0.0, 20, 50, True),     # negative-cosine boundaries only
    (-1.0, 0, 25, True),     # no boundaries -> split-large path
]

sem_cases = []
for ti, text in enumerate(SEM_TEXTS):
    for thr, mn, mx, ctx in SEM_CONFIGS:
        ch = sem_mod.SemanticChunker(
            similarity_threshold=thr, min_chunk_size=mn,
            max_chunk_size=mx)
        out = ch.create_semantic_chunks(text, maintain_context=ctx)
        sem_cases.append({
            "text_id": ti, "threshold": thr, "min_chunk": mn,
            "max_chunk": mx, "maintain_context": ctx,
            "chunks": [{
                "text": t,
                "sentence_count": m["sentence_count"],
                "token_count": m["token_count"],
                "semantic_focus": m["semantic_focus"],
                "chunk_index": m["chunk_index"],
                "total_chunks": m["total_chunks"],
                "previous_context": m.get("previous_context"),
                "next_context": m.get("next_context"),
            } for t, m in out]})

chunker_default = sem_mod.SemanticChunker()

sem_sentences = [{"text_id": ti,
                  "sentences": chunker_default.split_into_sentences(t)}
                 for ti, t in enumerate(SEM_TEXTS)]

sem_concepts = []
for ti in (0, 1, 7, 9):
    for k in (3, 5):
        sem_concepts.append({
            "text_id": ti, "top_k": k,
            "concepts": chunker_default.identify_key_concepts(
                SEM_TEXTS[ti], top_k=k)})

# real corpus documents through the full pipeline
import duckdb  # noqa: E402

docs = duckdb.sql(
    "SELECT doc_id, text FROM "
    "read_parquet('/root/testdata/sf0.001/documents.parquet') "
    "ORDER BY doc_id LIMIT 10").fetchall()
sem_corpus = []
for doc_id, text in docs:
    ch = sem_mod.SemanticChunker(min_chunk_size=20, max_chunk_size=80)
    out = ch.create_semantic_chunks(text, maintain_context=True)
    sem_corpus.append({
        "doc_id": doc_id, "n_chunks": len(out),
        "chunks": [{"text": t, "sentence_count": m["sentence_count"],
                    "token_count": m["token_count"],
                    "semantic_focus": m["semantic_focus"]}
                   for t, m in out]})

dump("semantic_chunker.json", {
    "texts": SEM_TEXTS, "cases": sem_cases,
    "sentences": sem_sentences, "concepts": sem_concepts,
    "corpus": sem_corpus})

# ---- app/processors/two_tier_chunker.py -----------------------------
# Stand-ins, both recorded here and injected identically in Scala:
#  - tiktoken cl100k_base -> encode(text) = text.split() (so
#    count_tokens = whitespace word count);
#  - the LLM boundary -> StubLlm(8): last \n\n-segment of the prompt,
#    first 8 space-tokens, prefixed 'CTX: ';
#  - the SentenceTransformer boundary -> the md5-feature encoder
#    above (semantic arm) or a poisoned import (fallback arm).
def put_twotier_stubs():
    tk = types.ModuleType("tiktoken")

    class _Enc:
        def encode(self, text):
            return text.split()

    tk.get_encoding = lambda name: _Enc()
    sys.modules["tiktoken"] = tk

    class _FakeResp:
        def __init__(self, content):
            self.content = content

    class _FakeLLM:
        async def call_llm(self, prompt, **kw):
            text = prompt.split("\n\n")[-1]
            toks = [t for t in text.split(" ") if t][:8]
            return _FakeResp("CTX: " + " ".join(toks))

    llm_mod = types.ModuleType("app.services.llm_service")
    llm_mod.LLMService = _FakeLLM
    sys.modules["app.services.llm_service"] = llm_mod

    sup_mod = types.ModuleType("app.services.supabase_service")
    sup_mod.SupabaseService = lambda: None
    sys.modules["app.services.supabase_service"] = sup_mod

    put_embed_stubs()


tt_mod = load_file("ref_twotier", "app/processors/two_tier_chunker.py",
                   pre=put_twotier_stubs)
tt = tt_mod.TwoTierChunker()

TT_TEXTS = [
    ("# Manual\n\nIntro paragraph before any section.\n\n"
     "## Pump Care\nThe pump rotor spins fast. The pump rotor spins "
     "very fast. Mr. Smith checks i.e. the seals etc. daily.\n\n"
     "Second paragraph about the pump rotor bearings and seals.\n\n"
     "## Valve Care\nValve seats show corrosion. Valve seats show "
     "corrosion marks! Replace them.\n\n### Empty Sub\n\n"
     "## Tail\nShort tail."),
    ("Plain prose without headings. Dr. Jones visited Acme Inc. on "
     "Monday. The report, drafted by J. Watson, covered vs. the "
     "baseline. It was fine."),
    "",
    "   ",
    "# Heading only",
    "####### seven hashes is not a heading\n\nplain tail",
    ("para one words here\n\n\n\npara two after blank runs\n\n" +
     "filler word " * 120 + "\n\nlast para"),
    "Héllo wörld. Ééé café! Déjà vu? Fin. The_under score_token stays.",
]

# tokenize_for_bm25 + split_into_sentences + heading blocks
tt_tok = [{"text_id": i, "tokens": tt.tokenize_for_bm25(t)}
          for i, t in enumerate(TT_TEXTS)]
tt_sent = [{"text_id": i, "sentences": tt.split_into_sentences(t)}
           for i, t in enumerate(TT_TEXTS)]
tt_blocks = [{"text_id": i,
              "blocks": [{"heading": h, "body": b}
                         for h, b in tt._split_into_heading_blocks(t)]}
             for i, t in enumerate(TT_TEXTS)]

# page chunks at several budgets (instance attr reconfigured, as the
# reference's __init__ would)
tt_pages = []
for i, t in enumerate(TT_TEXTS):
    for size in (1200, 25, 5):
        tt.page_token_size = size
        tt_pages.append({"text_id": i, "page_token_size": size,
                         "chunks": tt.create_page_chunks(t)})
tt.page_token_size = 1200

# section chunks: the live AttributeError arm vs the []-arms
tt_sections = []
for i, t in enumerate(TT_TEXTS):
    try:
        tt_sections.append({"text_id": i,
                            "chunks": tt.create_section_chunks(t)})
    except AttributeError as e:
        tt_sections.append({"text_id": i, "error": str(e)})

# semantic chunks, both arms
tt_semantic = []
for i, t in enumerate(TT_TEXTS):
    tt_semantic.append({
        "text_id": i, "arm": "semantic",
        "chunks": [{"text": c, "sentence_count": n}
                   for c, n in tt.create_semantic_chunks(t, "p0", 0)]})
# poison the import -> the ImportError fallback arm
sys.modules["app.processors.semantic_chunker"] = None
for i, t in enumerate(TT_TEXTS):
    tt_semantic.append({
        "text_id": i, "arm": "fallback",
        "chunks": [{"text": c, "sentence_count": n}
                   for c, n in tt.create_semantic_chunks(t, "p0", 0)]})
del sys.modules["app.processors.semantic_chunker"]

# chunk ids
tt_ids = []
for doc, level, idx, parent in [
        ("doc1", "parent", 0, None), ("doc1", "parent", 7, None),
        ("doc1", "semantic", 0, "3a5a7b70-0000-4000-8000-000000000000"),
        ("árvíz", "parent", 3, None), ("", "semantic", 2, ""),
        ("doc-2", "semantic", 11, "parenthash")]:
    tt_ids.append({"document_id": doc, "level": level, "index": idx,
                   "parent_id": parent,
                   "chunk_id": tt.generate_chunk_id(doc, level, idx,
                                                    parent)})

# process_document end to end (async; stub LLM + stub embeddings)
tt_docs = []
for i in (0, 1, 6, 7):
    tt.page_token_size = 40
    chunks = asyncio.run(tt.process_document(
        f"doc{i}", TT_TEXTS[i], title=f"Title {i}",
        metadata={"src": "fixture"} if i == 0 else None))
    tt_docs.append({
        "text_id": i, "document_id": f"doc{i}", "title": f"Title {i}",
        "page_token_size": 40,
        "chunks": [{
            "id": c.id, "chunk_level": c.chunk_level,
            "chunk_index": c.chunk_index, "chunk_text": c.chunk_text,
            "chunk_size": c.chunk_size,
            "contextual_summary": c.contextual_summary,
            "contextualized_text": c.contextualized_text,
            "parent_chunk_id": c.parent_chunk_id,
            "bm25_tokens": c.bm25_tokens,
            "sentence_count": c.sentence_count,
            "semantic_focus": c.semantic_focus,
            "tier": (c.metadata or {}).get("tier"),
        } for c in chunks]})
tt.page_token_size = 1200

dump("two_tier.json", {
    "texts": TT_TEXTS, "tokens": tt_tok, "sentences": tt_sent,
    "blocks": tt_blocks, "pages": tt_pages, "sections": tt_sections,
    "semantic": tt_semantic, "chunk_ids": tt_ids,
    "process_document": tt_docs})

# ---- app/services/search_service.py + reranker_service.py ----------
# Service clients are import-time stubs; the pure tier under test is
# everything after the fetch boundary.
def put_search_stubs():
    for name, cls in [("app.services.qdrant_service", "QdrantService"),
                      ("app.services.supabase_service", "SupabaseService"),
                      ("app.services.neo4j_service", "Neo4jService"),
                      ("app.services.embedding_service",
                       "EmbeddingService")]:
        m = types.ModuleType(name)
        setattr(m, cls, lambda *a, **k: types.SimpleNamespace(client=None))
        sys.modules[name] = m
    cfg = types.ModuleType("app.config")
    cfg.settings = types.SimpleNamespace()
    sys.modules["app.config"] = cfg


ss_mod = load_file("ref_search", "app/services/search_service.py",
                   pre=put_search_stubs)
svc = ss_mod.SearchService()
SR = ss_mod.SearchResult

# _tokenize
SS_TOKEN_TEXTS = [
    "The Pump_Rotor spins at 3000 RPM in the test-rig",
    "café déjà-vu naïve_token under_score",
    "", "a an the of at", "xx yyy zzzz",
]
ss_tok = [{"text": t, "tokens": svc._tokenize(t)} for t in SS_TOKEN_TEXTS]

# bm25_search behind a canned ILIKE fetch
BM25_CORPUS = {
    "pump": [
        {"id": 1, "document_id": "d1", "chunk_text": "pump rotor pump",
         "metadata": None, "contextualized_text":
         "CTX pump rotor pump seal", "bm25_tokens":
         ["ctx", "pump", "rotor", "pump", "seal"]},
        {"id": 2, "document_id": "d2", "chunk_text": "pump only here",
         "metadata": None, "contextualized_text": "",
         "bm25_tokens": []},     # empty -> tokenize fallback chain
        {"id": 3, "document_id": None, "chunk_text": None,
         "metadata": None, "contextualized_text":
         "the pump beside the valve", "bm25_tokens": None},
    ],
    "rotor": [
        {"id": 1, "document_id": "d1", "chunk_text": "pump rotor pump",
         "metadata": None, "contextualized_text":
         "CTX pump rotor pump seal", "bm25_tokens":
         ["ctx", "pump", "rotor", "pump", "seal"]},
        {"id": 4, "document_id": "d4", "chunk_text": "rotor balance",
         "metadata": None, "contextualized_text": None,
         "bm25_tokens": None},
    ],
    "valve": [
        {"id": 3, "document_id": None, "chunk_text": None,
         "metadata": None, "contextualized_text":
         "the pump beside the valve", "bm25_tokens": None},
        {"id": 5, "document_id": "d5", "chunk_text": "valve seat",
         "metadata": None, "contextualized_text": "valve seat worn",
         "bm25_tokens": ["valve", "seat", "worn"]},
    ],
}


class _FakeQuery:
    def __init__(self):
        self.tok = None
        self.n = None

    def select(self, cols):
        return self

    def ilike(self, col, pat):
        self.tok = pat.strip("%")
        return self

    def limit(self, n):
        self.n = n
        return self

    def execute(self):
        return types.SimpleNamespace(
            data=[dict(r) for r in BM25_CORPUS.get(self.tok, [])][:self.n])


class _FakeClient:
    def table(self, name):
        return _FakeQuery()


svc.supabase = types.SimpleNamespace(client=_FakeClient())

BM25_QUERIES = [
    ("pump rotor", 10), ("pump pump rotor", 10),   # duplicate token
    ("valve", 10), ("the of at", 10), ("pump rotor valve", 2),
    ("missing", 10),
]
ss_bm25 = []
for q, lim in BM25_QUERIES:
    res, _lat = asyncio.run(svc.bm25_search(q, limit=lim))
    ss_bm25.append({"query": q, "limit": lim,
                    "results": [{"id": r.id, "score": r.score,
                                 "source": r.source, "title": r.title,
                                 "content": r.content} for r in res]})

# _fuse_results: distinct fused scores by construction (asserted)
FUSE_RESULTS = [
    SR("a", 0.9, "vector_chunk", "tA", "cA", {}),
    SR("a", 0.5, "vector_table", "tA2", "cA2", {}),  # dup id in group
    SR("b", 0.8, "vector_image", "tB", "cB", {}),
    SR("c", 0.7, "vector_chunk", "tC", "cC", {}),
    SR("b", 3.1, "bm25", "tBb", "cBb", {}),
    SR("d", 2.0, "bm25", "tD", "cD", {}),
    SR("e", 1.0, "graph", "tE", "cE", {}, [{"t": "USES"}]),
    SR("b", 1.0, "graph", "tBg", "cBg", {}),         # id already fused
    SR("x", 9.9, "weird_source", "tX", "cX", {}),    # dropped
]
fuse_out = svc._fuse_results(
    list(FUSE_RESULTS),
    primary_sources={"vector_chunk", "vector_table", "vector_image",
                     "vector"},
    bm25_sources={"bm25"}, limit=10)
_scores = [r.score for r in fuse_out]
assert all(a > b for a, b in zip(_scores, _scores[1:])), \
    "fuse fixture must have strictly decreasing scores (tie order is " \
    "hash-dependent in the reference)"
ss_fuse = {
    "input": [{"id": r.id, "score": r.score, "source": r.source,
               "title": r.title, "content": r.content}
              for r in FUSE_RESULTS],
    "limit": 10,
    "output": [{"id": r.id, "score": r.score, "source": r.source,
                "title": r.title, "content": r.content}
               for r in fuse_out]}

# _merge_and_rank (fresh SearchResult objects: the reference mutates)
MERGE_CASES = []
for w in (0.7, 0.3):
    results = [
        SR("m1", 0.9, "vector", "t1", "c1", {}),
        SR("m1", 0.4, "graph", "t1g", "c1g", {}, [{"r": 1}]),
        SR("m2", 0.2, "graph", "t2", "c2", {}, [{"r": 2}]),
        SR("m2", 0.6, "vector", "t2v", "c2v", {}),
        SR("m3", 0.5, "vector", "t3", "c3", {}),
        SR("m3", 0.7, "vector", "t3b", "c3b", {}),
        SR("m4", 0.1, "bm25", "t4", "c4", {}, []),
        SR("m4", 0.3, "bm25", "t4b", "c4b", {}, [{"r": 4}]),
        SR("m5", 0.05, "graph", "t5", "c5", {}, [{"r": 5}]),
        SR("m5", 0.04, "graph", "t5b", "c5b", {}, [{"r": 6}]),
    ]
    out = svc._merge_and_rank(results, vector_weight=w)
    MERGE_CASES.append({
        "vector_weight": w,
        "output": [{"id": r.id, "score": r.score, "source": r.source,
                    "title": r.title,
                    "relationships": r.relationships}
                   for r in out]})

# _build_graph_query
GQ_CASES = [
    (None, None, None, 10, 2),
    ("Pump", None, None, 10, 2),
    (None, "component", None, 5, 1),
    ("Valve", "component", "PART_OF", 3, 4),
    ("O'Brien", None, None, 10, 2),   # quote injection carried as-is
]
ss_gq = [{"entity_name": n, "entity_type": t, "relationship_type": r,
          "limit": lim, "depth": d,
          "query": svc._build_graph_query(n, t, r, lim, d)}
         for n, t, r, lim, d in GQ_CASES]

# get_performance_stats
PERF_CASES = [
    {"vector_searches": [], "graph_searches": [], "hybrid_searches": []},
    {"vector_searches": [120.0], "graph_searches": [],
     "hybrid_searches": []},
    {"vector_searches": [10.0, 20.0, 30.0, 40.0, 250.0],
     "graph_searches": [100.0, 150.0],
     "hybrid_searches": [5.5, 6.5, 7.5, 199.0]},
    {"vector_searches": [float(x * 7 % 300) for x in range(1, 40)],
     "graph_searches": [250.0, 100.0], "hybrid_searches": []},
]
ss_perf = []
for case in PERF_CASES:
    svc.search_metrics = {k: list(v) for k, v in case.items()}
    ss_perf.append({"metrics": case,
                    "stats": asyncio.run(svc.get_performance_stats())})

# reranker fallback (no COHERE_API_KEY in this environment)
os.environ.pop("COHERE_API_KEY", None)
rr_mod = load_file("ref_reranker", "app/services/reranker_service.py")
rr = rr_mod.RerankerService()
RERANK_CASES = [
    ("pump seal", [("r1", "The pumps were sealed.", 1.0),
                   ("r2", "No overlap here.", 2.0),
                   ("r3", "pump pump pump seal", 0.5)], 20),
    ("Pump", [("r1", "PUMP IN CAPS", 1.0), ("r2", "", 1.05)], 1),
    ("", [("r1", "anything", 1.0), ("r2", "other", 0.9)], 20),
    ("the pump", [("r1", "the theory of pumps", 1.0),
                  ("r2", "pump", 1.01)], 20),
]
ss_rerank = []
for q, cands, k in RERANK_CASES:
    objs = [SR(cid, sc, "hybrid", "", content, {})
            for cid, content, sc in cands]
    out = asyncio.run(rr.rerank(q, objs, top_k=k))
    ss_rerank.append({
        "query": q, "top_k": k,
        "candidates": [{"id": cid, "content": content, "score": sc}
                       for cid, content, sc in cands],
        "output": [{"id": r.id, "score": r.score} for r in out]})

dump("search_service.json", {
    "tokenize": ss_tok, "bm25": ss_bm25,
    "bm25_corpus": {t: [{k: v for k, v in r.items() if k != "metadata"}
                        for r in rows]
                    for t, rows in BM25_CORPUS.items()},
    "fuse": ss_fuse, "merge_and_rank": MERGE_CASES,
    "graph_query": ss_gq, "perf": ss_perf, "rerank": ss_rerank})

# ---- app/services/relationship_extractor.py + models/relationships -
# The two-tier stub for app.services.llm_service lacks LLMProvider;
# the extractor imports it (never used on the pure tier)
sys.modules["app.services.llm_service"].LLMProvider = type(
    "LLMProvider", (), {})

rx_mod = load_file("ref_relx", "app/services/relationship_extractor.py")
from app.models.relationships import (  # noqa: E402
    RelationshipType, get_entity_type)

ex = rx_mod.RelationshipExtractor(llm_service=object())

# get_entity_type heuristic ladder (metadata type wins)
GET_TYPE_NAMES = [
    "Water Pump", "X500 Dispenser", "pressure sensor", "firmware",
    "Sales Team", "user manual", "totally unknown", "PUMP MODEL",
    "supply chain", "api platform", "spec sheet report", "",
]
rx_types = (
    [{"name": n, "metadata": None, "type": get_entity_type(n)}
     for n in GET_TYPE_NAMES] +
    [{"name": "Water Pump", "metadata": {"type": "CustomType"},
      "type": get_entity_type("Water Pump", {"type": "CustomType"})}])

# _create_entity_lookup: ordered (key -> entity name) pairs
LOOKUP_ENTITY_SETS = [
    ["Water Pump", "X500 Dispenser", "control board", "WP"],
    ["Pump", "pump house", "PH"],         # collisions: later overwrites
    ["  spaced  name  ", "solo"],
    [],
]
rx_lookup = []
for names in LOOKUP_ENTITY_SETS:
    lk = ex._create_entity_lookup([{"name": n} for n in names])
    rx_lookup.append({"names": names,
                      "lookup": [[k, v["name"]] for k, v in lk.items()]})

# _extract_with_rules as shipped: the live KeyError('CAUSES') arm
RULE_TEXT = ("The water pump is a component of the X500 dispenser. "
             "WP connects to control board. The firmware requires "
             "control board to function. Engineering team owns firmware.")
RULE_ENTITIES = [{"name": "Water Pump"}, {"name": "X500 Dispenser"},
                 {"name": "control board"}, {"name": "firmware"},
                 {"name": "Engineering"}]
lk_full = ex._create_entity_lookup(RULE_ENTITIES)
try:
    ex._extract_with_rules(RULE_TEXT, lk_full)
    rx_rules_default = {"error": None}
except KeyError as e:
    rx_rules_default = {"error": f"KeyError:{e.args[0]}"}

# the same algorithm under an enum-valid patterns config (instance
# data, recorded here) — this is what pins the matcher itself
valid_patterns = {k: v for k, v in ex.patterns.items()
                  if k in RelationshipType.__members__}
ex.patterns = valid_patterns
RULE_CASES = [
    (RULE_TEXT, RULE_ENTITIES),
    ("The pump interfaces with the valve. The valve is a part of "
     "the pump house. Marketing oversees the x600 product line.",
     [{"name": "pump"}, {"name": "valve"}, {"name": "pump house"},
      {"name": "Marketing"}, {"name": "x600 product line"}]),
    ("Nothing matches here at all.", [{"name": "pump"}]),
    ("a requires b. c manages d.", []),
]
rx_rules = []
for text, ents in RULE_CASES:
    lk = ex._create_entity_lookup(ents)
    rels = ex._extract_with_rules(text, lk)
    rx_rules.append({
        "text": text, "entities": [e["name"] for e in ents],
        "relationships": [{
            "source": r.source_entity, "source_type": r.source_type,
            "type": r.relationship_type.label,
            "target": r.target_entity, "target_type": r.target_type,
            "confidence": r.properties.confidence,
            "source_text": r.properties.source_text,
            "method": r.properties.extraction_method} for r in rels]})

# document relationships + dedup, end to end through
# extract_relationships(use_llm=False, use_rules=False)
DOCREL_CASES = [
    ([{"name": "Water Pump", "count": 3, "first_position": 10},
      {"name": "firmware"}],
     {"id": 42, "title": "Pump Manual"}),
    ([{"name": "x"}], None),
    ([], {"id": "d7", "title": "Empty"}),
    # duplicate entity name -> DOCUMENTS dedup keeps the first
    ([{"name": "pump", "count": 1}, {"name": "pump", "count": 9}],
     {"title": "Dups"}),
]
rx_docrels = []
for ents, meta in DOCREL_CASES:
    rels = asyncio.run(ex.extract_relationships(
        "", ents, document_metadata=meta, use_llm=False,
        use_rules=False))
    rx_docrels.append({
        "entities": ents, "metadata": meta,
        "relationships": [{
            "source": r.source_entity, "source_type": r.source_type,
            "type": r.relationship_type.label,
            "target": r.target_entity, "target_type": r.target_type,
            "confidence": r.properties.confidence,
            "source_text": r.properties.source_text,
            "method": r.properties.extraction_method,
            "additional": {
                k: r.properties.additional_properties.get(k)
                for k in ("mention_count", "first_mention",
                          "source_id", "source_name", "target_name")}}
            for r in rels]})

# _deduplicate_relationships on synthetic overlaps
Rel = rx_mod.Relationship
RP = rx_mod.RelationshipProperties
from datetime import datetime as _dt  # noqa: E402


def _mk(s, t, typ, conf):
    return Rel(source_entity=s, source_type="Entity",
               relationship_type=RelationshipType[typ],
               target_entity=t, target_type="Entity",
               properties=RP(confidence=conf, source_text="st",
                             extracted_at=_dt(2020, 1, 1),
                             extraction_method="x"))


DEDUP_IN = [("a", "b", "DOCUMENTS", 0.5), ("a", "b", "DOCUMENTS", 0.9),
            ("a", "b", "DOCUMENTS", 0.9), ("a", "b", "REFERENCES", 0.4),
            ("b", "a", "DOCUMENTS", 0.3), ("a", "b", "DOCUMENTS", 0.1)]
dd_out = ex._deduplicate_relationships(
    [_mk(s, t, ty, c) for s, t, ty, c in DEDUP_IN])
rx_dedup = {
    "input": [{"source": s, "target": t, "type": ty, "confidence": c}
              for s, t, ty, c in DEDUP_IN],
    "output": [{"source": r.source_entity, "target": r.target_entity,
                "type": r.relationship_type.label,
                "confidence": r.properties.confidence}
               for r in dd_out]}

dump("relationship_rules.json", {
    "entity_types": rx_types, "lookups": rx_lookup,
    "rules_default": rx_rules_default, "rules_valid": rx_rules,
    "doc_relationships": rx_docrels, "dedup": rx_dedup})

# ---- app/services/llm_service.py: response handling + cost ---------
def put_llm_stubs():
    oa = types.ModuleType("openai")
    oa.OpenAI = lambda **k: None
    oa.AsyncOpenAI = lambda **k: None
    sys.modules["openai"] = oa
    g = types.ModuleType("google")
    gg = types.ModuleType("google.generativeai")
    gg.configure = lambda **k: None
    gg.GenerativeModel = lambda *a, **k: None
    g.generativeai = gg
    sys.modules["google"] = g
    sys.modules["google.generativeai"] = gg
    sys.modules["httpx"] = types.ModuleType("httpx")
    cfg = types.ModuleType("app.config")
    cfg.settings = types.SimpleNamespace(openai_api_key=None,
                                         google_ai_api_key=None)
    sys.modules["app.config"] = cfg


llm_mod = load_file("ref_llm", "app/services/llm_service.py",
                    pre=put_llm_stubs)
lsvc = llm_mod.LLMService()

MANY = ", ".join(
    f'{{"name": "entity{i:02d}", "type": "CONCEPT", '
    f'"confidence": {0.5 + (i % 3) * 0.2}}}' for i in range(25))
ENTITY_CONTENTS = [
    ('[{"name": " Water Pump ", "type": "Component", "confidence": 0.9,'
     ' "context": "found in intro"},'
     ' {"name": "System", "type": "SYSTEM", "confidence": 0.95},'
     ' {"name": "X", "type": "PRODUCT", "confidence": 0.9},'
     ' {"name": "corrosion", "type": "Issue", "confidence": 0.8},'
     ' {"name": "wrench", "type": "EQUIPMENT", "confidence": 0.7},'
     ' {"name": "gizmo", "type": "WIDGET", "confidence": 0.6},'
     ' {"name": "typeless", "confidence": 0.8},'
     ' {"name": "confless", "type": "TOOL"},'
     ' {"name": "nullctx", "type": "STATE", "confidence": 0.9,'
     ' "context": null},'
     ' {"name": "lowconf", "type": "TOOL", "confidence": 0.3}]'),
    '```json\n[{"name": "fenced", "type": "CONCEPT", "confidence": 0.8}]\n```',
    '```\n[{"name": "bare fence", "type": "CONCEPT", "confidence": 0.8}]```',
    '```json\n[{"name": "no close", "type": "CONCEPT", "confidence": 0.8}]',
    f"[{MANY}]",
    '{"name": "an object not a list", "confidence": 1.0}',
    '"just a string"',
    '[{"name": "ok", "confidence": 0.9}, 42]',
    '[{"name": null, "type": "TOOL", "confidence": 0.9}]',
    '[{"name": "bad conf", "confidence": "high"}]',
    '[{"name": "null type", "type": null, "confidence": 0.9}]',
    '[{"name": "ok", "confidence": 0.9}] trailing',
    '',
    'not json at all',
]


class _Resp:
    def __init__(self, content):
        self.content = content


llm_entities = []
for content in ENTITY_CONTENTS:
    async def fake_call(*a, **k):
        return _Resp(content)

    lsvc.call_llm = fake_call
    ents = asyncio.run(lsvc.extract_entities("text"))
    llm_entities.append({
        "content": content,
        "entities": [{"name": e.name, "type": e.type,
                      "confidence": e.confidence, "context": e.context}
                     for e in ents]})

META_CONTENTS = [
    ('{"title": "Pump Manual", "author": "J. Doe", "department": "Eng",'
     ' "category": "manual", "tags": ["pump", "care"],'
     ' "summary": "How to pump.", "key_topics": ["pumps"],'
     ' "sentiment": "neutral", "confidence": 0.85}'),
    '{"title": null, "tags": null, "key_topics": null, "confidence": null}',
    '{}',
    '```json\n{"title": "Fenced", "confidence": 0.9}\n```',
    '```\n{"title": "Bare"}```',
    '```json\n{"title": "No close"}',
    'The document seems to be about pumps. ' * 12,   # >200 chars, 0.3 arm
    '[1, 2, 3]',
    '"scalar"',
    '{"title": "x"} trailing',
    '',
]
llm_meta = []
for content in META_CONTENTS:
    async def fake_call(*a, **k):
        return _Resp(content)

    lsvc.call_llm = fake_call
    md = asyncio.run(lsvc.extract_metadata("text"))
    llm_meta.append({
        "content": content,
        "metadata": {"title": md.title, "author": md.author,
                     "department": md.department, "category": md.category,
                     "tags": md.tags, "summary": md.summary,
                     "key_topics": md.key_topics,
                     "sentiment": md.sentiment,
                     "confidence": md.confidence}})

COST_CASES = [
    ("OPENAI", "gpt-4o", 1000, 500), ("OPENAI", "gpt-4o-mini", 123, 456),
    ("OPENAI", "gpt-5", 1000, 1000),          # unpriced model -> 0.0
    ("GEMINI", "gemini-2.5-pro", 2000, 100),
    ("GEMINI", "gemini-2.0-flash-lite", 7, 13),
    ("GEMINI", "gpt-4o", 10, 10),             # wrong provider -> 0.0
    ("OPENAI", "gpt-3.5-turbo", 0, 0),
    ("OPENAI", "gpt-4-turbo-preview", 333333, 777777),
]
llm_cost = [{"provider": prov, "model": model,
             "prompt_tokens": pt, "completion_tokens": ct,
             "cost": lsvc._estimate_cost(
                 getattr(llm_mod.LLMProvider, prov), model,
                 {"prompt_tokens": pt, "completion_tokens": ct})}
            for prov, model, pt, ct in COST_CASES]

dump("llm_service.json", {"entities": llm_entities,
                          "metadata": llm_meta, "cost": llm_cost})

# ---- app/services/job_tracker.py ------------------------------------
# datetime.utcnow is patched to a scripted clock (one fixed value per
# op, advanced between ops) so the run is deterministic and the Scala
# replay can pass the same per-op `now` column.
jt_mod = load_file("ref_jobtracker", "app/services/job_tracker.py")

from datetime import datetime as _real_dt  # noqa: E402


class _FakeDt:
    current = _real_dt(2024, 1, 1, 0, 0, 0)

    @classmethod
    def utcnow(cls):
        return cls.current

    @staticmethod
    def fromisoformat(s):
        return _real_dt.fromisoformat(s)

    @staticmethod
    def utcfromtimestamp(ts):
        return _real_dt.utcfromtimestamp(ts)


jt_mod.datetime = _FakeDt
tracker = jt_mod.JobTracker()
JS = jt_mod.JobStatus

JT_OPS = [
    ("create", "j1", "notion_scan", {"k": "v"}),
    ("create", "j2", "gdrive_scan", None),
    ("create", "j3", "other", None),
    ("update", "j1", "running", {"progress": 150}),
    ("update", "j2", "running", {"progress": -5, "message": "neg"}),
    ("update", "jX", "running", {}),
    ("update", "j1", "completed", {"progress": 10}),
    ("cancel", "j2"), ("cancel", "j2"), ("cancel", "j1"),
    ("cancel", "missing"),
    ("update", "j3", "failed", {"error": "boom", "message": "bad"}),
    ("create", "j4", "notion_scan", None),
    ("update", "j4", "running", {"message": "halfway"}),
]
jt_log = []
t = _real_dt(2024, 1, 1, 0, 0, 0)
from datetime import timedelta  # noqa: E402

for i, op in enumerate(JT_OPS):
    _FakeDt.current = t + timedelta(minutes=i)
    now_iso = _FakeDt.current.isoformat()
    if op[0] == "create":
        _, jid, typ, meta = op
        tracker.create_job(jid, typ, meta)
        jt_log.append({"op": "create", "id": jid, "type": typ,
                       "metadata": meta, "now": now_iso})
    elif op[0] == "update":
        _, jid, status, kw = op
        out = tracker.update_job(jid, JS(status), **kw)
        jt_log.append({"op": "update", "id": jid, "status": status,
                       "kw": kw, "now": now_iso,
                       "found": out is not None})
    else:
        _, jid = op
        ok = tracker.cancel_job(jid)
        jt_log.append({"op": "cancel", "id": jid, "now": now_iso,
                       "cancelled": ok})

jt_lists = []
for status, typ, lim, off in [(None, None, 50, 0),
                              ("running", None, 50, 0),
                              (None, "notion_scan", 50, 0),
                              (None, None, 2, 1),
                              ("completed", "notion_scan", 50, 0)]:
    out = tracker.list_jobs(JS(status) if status else None, typ, lim, off)
    jt_lists.append({"status": status, "type": typ, "limit": lim,
                     "offset": off, "ids": [j["id"] for j in out]})

jobs_before_cleanup = {jid: dict(j) for jid, j in tracker.jobs.items()}
# cleanup: cutoff between j1's completion (minute 6) and j2/j3's
_FakeDt.current = t + timedelta(minutes=7, hours=24)
tracker.cleanup_old_jobs(hours=24)
cutoff_iso = (t + timedelta(minutes=7)).isoformat()
jt_after_cleanup = sorted(tracker.jobs.keys())

for j in jobs_before_cleanup.values():
    j["status"] = j["status"].value

dump("job_tracker.json", {
    "ops": jt_log, "lists": jt_lists,
    "jobs": jobs_before_cleanup, "cleanup_cutoff": cutoff_iso,
    "jobs_after_cleanup": jt_after_cleanup})

# ---- app/services/canonical_description_service.py ------------------
# The LLM boundary is a recording fake keyed on the entity label line
# so both sides can map responses; prompts are recorded for exact
# replay.
sys.modules["app.services.llm_service"].LLMProvider.OPENAI = "openai"
sys.modules["app.services.llm_service"].LLMProvider.GEMINI = "gemini"
cds_mod = load_file("ref_cds",
                    "app/services/canonical_description_service.py")

CT_CASES = [
    ("  multiple   spaces\tand\nnewlines  ", None),
    ("exact length string!", 20),
    ("this string is longer than the cap for sure", 20),
    ("ends with spaces near cut  xyz", 29),
    ("", 10), ("   ", None),
]
cds_clean = [{"value": v, "max_length": m,
              "out": cds_mod._clean_text(v, max_length=m)}
             for v, m in CT_CASES]

ATTR_CASES = [
    {"color": "red", "count": 3, "empty": "", "none": None,
     "flag": True, "items": ["a", "", None, "b"],
     "nested": {"x": 1, "y": "", "z": "w"},
     "empty_list": [], "empty_dict": {}},
    {"only": "one"},
    {},
    {"zero": 0, "false": False},
]
# recorded as ORDERED [key, value] pairs: the fixture dump sorts
# object keys, but dict insertion order is part of the contract
cds_attrs = [{"attributes_list": [[k, v] for k, v in a.items()],
              "out": cds_mod._format_attribute_fragment(a)}
             for a in ATTR_CASES]

svc_cds = cds_mod.CanonicalEntityDescriptionService(llm_service=object())
EV_CASES = [
    [{"mention": "  Water   Pump ", "context": "The pump leaks badly.",
      "summary": "The pump leaks badly.",   # == context -> suppressed
      "attributes": {"chunk_index": 3, "material": "steel",
                     "chunk_id": "c1"}},
     {"mention": "Water Pump", "context": "The pump leaks badly.",
      "summary": "The pump leaks badly.",
      "attributes": {"chunk_index": 9, "material": "steel"}},  # dup
     {"mention": "", "context": "dropped"},
     {"mention": "Valve", "summary": "Short valve summary.",
      "context": "Different context here.",
      "attributes": {}},
     {"mention": "Sensor", "context": "x " * 150}],   # cap at 220
    [{"mention": f"Entity {i}", "context": f"ctx {i}"}
     for i in range(15)],                              # 2*max slice + cap
    [],
]
cds_evidence = [{"case": i,
                 "out": svc_cds._prepare_evidence(items)}
                for i, items in enumerate(EV_CASES)]

CDS_RESPONSES = [
    "```json\nA clean fenced description.\n```",
    "```\nBare fence, no close",
    "Description: The pump moves water.",
    "Some text Description: embedded marker wins.",
    "Entity: pump does things",
    "entity: lower marker",
    "Insufficient evidence.",
    "No evidence found in the text.",
    "Unknown",
    "unknown. but more",
    "Uncertain about this one",
    "",
    "   ",
    "A fine description of the pump. " * 12,   # > 300 cap
    "The pump is a rotary device.",
]
recorded_prompts = []


class _CdsLLM:
    def __init__(self, content):
        self.content = content

    async def call_with_fallback(self, prompt, system_prompt, **kw):
        recorded_prompts.append({"prompt": prompt,
                                 "system_prompt": system_prompt})
        return types.SimpleNamespace(content=self.content)


cds_calls = []
for content in CDS_RESPONSES:
    for prev in ("", "Old description."):
        svc1 = cds_mod.CanonicalEntityDescriptionService(
            llm_service=_CdsLLM(content))
        out = asyncio.run(svc1._call_llm(
            name="Water Pump", type_="component",
            previous_description=prev,
            evidence=["Mention: pump | Context: leaks"]))
        cds_calls.append({"content": content, "prev": prev, "out": out,
                          "prompt": recorded_prompts[-1]["prompt"],
                          "system_prompt":
                          recorded_prompts[-1]["system_prompt"]})
# evidence-less arm
svc1 = cds_mod.CanonicalEntityDescriptionService(llm_service=_CdsLLM("x"))
assert asyncio.run(svc1._call_llm(
    name="X", type_=None, previous_description="p", evidence=[])) is None

# generate_descriptions end to end with a label-keyed fake
CDS_BY_LABEL = {
    "Pump A": "The A pump circulates coolant.",
    "Pump B": "Old B description.",      # == prev -> dropped
    "Pump C": "Insufficient evidence.",  # guard -> prev -> == prev -> drop
    "Pump D": "A new D description.",
}


class _CdsLLM2:
    async def call_with_fallback(self, prompt, system_prompt, **kw):
        label = prompt.split("\n", 1)[0]
        label = label[len("Entity: "):].split(" (")[0]
        return types.SimpleNamespace(content=CDS_BY_LABEL.get(label, "?"))


CDS_ENTITIES = [
    {"id": "c1", "name": "Pump A", "type": "component",
     "metadata": {"description": "Old A description."}},
    {"id": "c2", "name": "Pump B", "type": "component",
     "metadata": {"description": "Old B description."}},
    {"id": "c3", "name": "Pump C", "type": None,
     "metadata": {"description": "Old C description."}},
    {"id": "c4", "name": "Pump D", "type": "component", "metadata": {}},
    {"id": "", "name": "No Id", "type": None, "metadata": {}},
    {"id": "c5", "name": "No Evidence", "type": None,
     "metadata": {"description": "kept"}},
]
CDS_EVMAP = {
    "c1": [{"mention": "Pump A", "context": "circulates coolant"}],
    "c2": [{"mention": "Pump B", "context": "ctx"}],
    "c3": [{"mention": "Pump C", "context": "ctx"}],
    "c4": [{"mention": "Pump D", "context": "ctx"}],
}
svc2 = cds_mod.CanonicalEntityDescriptionService(llm_service=_CdsLLM2())
cds_gen = svc2.generate_descriptions(CDS_ENTITIES, CDS_EVMAP)

dump("canonical_description.json", {
    "clean_text": cds_clean, "attributes": cds_attrs,
    "evidence": [{"case": i, "items": EV_CASES[i], "out": r["out"]}
                 for i, r in enumerate(cds_evidence)],
    "calls": cds_calls,
    "generate": {"entities": CDS_ENTITIES, "evidence_map": CDS_EVMAP,
                 "responses": CDS_BY_LABEL, "out": cds_gen}})

# ---- app/services/embedding_service.py ------------------------------
def put_embed_svc_stubs():
    class _EmbData:
        def __init__(self, vec):
            self.embedding = vec

    class _EmbResp:
        def __init__(self, n):
            self.data = [_EmbData([0.1] * 4) for _ in range(n)]

    class _Creator:
        def __init__(self):
            self.timeout_batches = set()
            self.call = 0

        async def create(self, input=None, model=None):
            self.call += 1
            if (self.call - 1) in self.timeout_batches:
                raise asyncio.TimeoutError()
            n = len(input) if isinstance(input, list) else 1
            return _EmbResp(n)

    class _AsyncClient:
        def __init__(self, **kw):
            self.embeddings = _Creator()

    oa = types.ModuleType("openai")
    oa.OpenAI = lambda **k: None
    oa.AsyncOpenAI = _AsyncClient
    sys.modules["openai"] = oa
    cfg = types.ModuleType("app.config")
    cfg.settings = types.SimpleNamespace(openai_api_key="sk")
    sys.modules["app.config"] = cfg


es_mod = load_file("ref_embsvc", "app/services/embedding_service.py",
                   pre=put_embed_svc_stubs)

SIM_CASES = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0], "cosine"),
    ([1.0, 0.0], [0.0, 1.0], "cosine"),
    ([0.0, 0.0], [1.0, 1.0], "cosine"),     # zero-norm arm
    ([1.0, 2.0], [3.0, 4.0], "euclidean"),
    ([1.0, 2.0], [1.0, 2.0], "euclidean"),  # identical -> 1.0
    ([1.5, -2.5, 0.5], [2.0, 1.0, -4.0], "dot"),
    ([1.0], [1.0], "manhattan"),            # ValueError arm
]
es_sims = []
svc_e = es_mod.EmbeddingService()
for a, b, metric in SIM_CASES:
    try:
        es_sims.append({"a": a, "b": b, "metric": metric,
                        "out": svc_e.calculate_similarity(a, b, metric)})
    except ValueError as e:
        es_sims.append({"a": a, "b": b, "metric": metric,
                        "error": str(e)})

es_info = []
for m in ("text-embedding-3-small", "text-embedding-3-large",
          "text-embedding-ada-002"):
    es_info.append({"model": m,
                    "info": es_mod.EmbeddingService(m).get_model_info()})
try:
    es_mod.EmbeddingService("bogus-model")
    bad_model_error = None
except ValueError as e:
    bad_model_error = str(e)

# embed_text / embed_batch cost arms through the stub client
es_costs = []
for text in ("one two three four five", "", "x", "word " * 37):
    r = asyncio.run(svc_e.embed_text(text))
    es_costs.append({"text": text, "cost": r.cost_estimate,
                     "dimensions": r.dimensions})

BATCH_TEXTS = [f"text number {i} with {'pad ' * (i % 5)}" for i in range(11)]
es_batches = []
for bs in (4, 20, 1):
    svc_b = es_mod.EmbeddingService()
    res = asyncio.run(svc_b.embed_batch(list(BATCH_TEXTS), batch_size=bs))
    es_batches.append({"batch_size": bs,
                       "costs": [r.cost_estimate for r in res],
                       "dims": [r.dimensions for r in res]})
# a timed-out middle batch zero-fills
svc_t = es_mod.EmbeddingService()
svc_t.async_client.embeddings.timeout_batches = {1}
res_t = asyncio.run(svc_t.embed_batch(list(BATCH_TEXTS), batch_size=4))
es_batches.append({"batch_size": 4, "timeout_batch": 1,
                   "costs": [r.cost_estimate for r in res_t],
                   "dims": [r.dimensions for r in res_t]})

dump("embedding_service.json", {
    "similarity": es_sims, "model_info": es_info,
    "bad_model_error": bad_model_error,
    "single_costs": es_costs,
    "batch_texts": BATCH_TEXTS, "batches": es_batches})

# ---- app/services/state_manager.py ----------------------------------
# Supabase is faked with an in-memory table store (the persistence
# seam); datetime.utcnow is the scripted per-op clock in BOTH the
# manager and the document_state model.
SM_STORE = {"documents": [], "document_state_transitions": []}


class _SmQuery:
    def __init__(self, store, name):
        self.store = store
        self.name = name
        self.filters = []
        self.in_filters = []
        self.order_col = None
        self.lim = None
        self.count_mode = None
        self.update_payload = None

    def select(self, cols, count=None):
        self.count_mode = count
        return self

    def eq(self, col, val):
        self.filters.append((col, val))
        return self

    def in_(self, col, vals):
        self.in_filters.append((col, list(vals)))
        return self

    def order(self, col):
        self.order_col = col
        return self

    def limit(self, n):
        self.lim = n
        return self

    def insert(self, data):
        self.insert_payload = dict(data)
        return self

    def update(self, data):
        self.update_payload = dict(data)
        return self

    def _rows(self):
        rows = self.store[self.name]
        for col, val in self.filters:
            rows = [r for r in rows if r.get(col) == val]
        for col, vals in self.in_filters:
            rows = [r for r in rows if r.get(col) in vals]
        if self.order_col:
            rows = sorted(rows, key=lambda r: r.get(self.order_col))
        if self.lim is not None:
            rows = rows[:self.lim]
        return rows

    def execute(self):
        if getattr(self, "insert_payload", None) is not None:
            self.store[self.name].append(dict(self.insert_payload))
            return types.SimpleNamespace(data=[dict(self.insert_payload)],
                                         count=None)
        if self.update_payload is not None:
            for r in self._rows():
                r.update(self.update_payload)
            return types.SimpleNamespace(data=self._rows(), count=None)
        rows = [dict(r) for r in self._rows()]
        return types.SimpleNamespace(
            data=rows,
            count=len(rows) if self.count_mode == "exact" else None)


class _SmClient:
    def table(self, name):
        return _SmQuery(SM_STORE, name)


def put_sm_stubs():
    sb = types.ModuleType("supabase")
    sb.create_client = lambda url, key: _SmClient()
    sb.Client = object
    sys.modules["supabase"] = sb
    dv = types.ModuleType("dotenv")
    dv.load_dotenv = lambda *a, **k: None
    sys.modules["dotenv"] = dv
    os.environ["SUPABASE_URL"] = "http://fake"
    os.environ["SUPABASE_KEY"] = "fake"


sm_mod = load_file("ref_statemgr", "app/services/state_manager.py",
                   pre=put_sm_stubs)
import app.models.document_state as ds_model  # noqa: E402

sm_mod.datetime = _FakeDt
ds_model.datetime = _FakeDt
DS = sm_mod.DocumentState
mgr = sm_mod.DocumentStateManager()

SM_OPS = [
    ("create", "d1", {"filename": "f.pdf", "source_type": "gdrive",
                      "file_type": "pdf", "extra": "m"}, None),
    ("create", "d1", {"filename": "other.pdf"}, None),  # existing arm
    ("create", "dX", None, None),                       # AttributeError arm
    ("transition", "d1", "processing", None),
    ("transition", "d1", "pending_review", None),
    ("transition", "d1", "approved", "looks good"),
    ("transition", "d1", "ingested", None),
    ("transition", "d1", "processing", None),           # terminal -> error
    ("transition", "d2", "processing", None),           # missing -> AttrError
    ("create", "d3", {"filename": "g.txt"}, None),
    ("transition", "d3", "failed", "parse blew up"),
    ("transition", "d3", "failed", None),               # failed->failed
    ("transition", "d3", "processing", None),           # retry stays 0
    ("transition", "d3", "failed", "again"),
    ("reset", "d3", None, None),
    ("reset", "d1", None, None),                        # not error state
    ("reset", "nope", None, None),                      # ValueError
    ("create", "d4", {"filename": "h.md"}, "pending_review"),
    ("bulk", ["d4", "d1", "zz"], "approved", None),
]
sm_log = []
for i, (kind, arg, b, c) in enumerate(SM_OPS):
    _FakeDt.current = _real_dt(2024, 2, 1) + timedelta(minutes=i)
    now_iso = _FakeDt.current.isoformat()
    row = {"op": kind, "arg": arg, "now": now_iso}
    try:
        if kind == "create":
            if c:
                asyncio.run(mgr.create_state(arg, DS(c), b))
                row["initial_state"] = c
            else:
                asyncio.run(mgr.create_state(arg, metadata=b))
            row["metadata"] = b
            row["outcome"] = "ok"
        elif kind == "transition":
            asyncio.run(mgr.transition(arg, DS(b), reason=c))
            row["to"] = b
            row["reason"] = c
            row["outcome"] = "ok"
        elif kind == "reset":
            asyncio.run(mgr.reset_failed_document(arg))
            row["outcome"] = "ok"
        else:
            res = asyncio.run(mgr.bulk_transition(arg, DS(b)))
            row["to"] = b
            row["outcome"] = "ok"
            row["bulk_ok_count"] = len(res)
    except Exception as e:
        if kind == "transition":
            row["to"] = b
        row["outcome"] = f"{type(e).__name__}: {e}"
    sm_log.append(row)

_FakeDt.current = _real_dt(2024, 2, 1) + timedelta(hours=2)
sm_queries = {
    "by_state_discovered": [d.document_id for d in asyncio.run(
        mgr.get_documents_by_state(DS("discovered")))],
    "requiring_action": [d.document_id for d in asyncio.run(
        mgr.get_documents_requiring_action())],
    "statistics": asyncio.run(mgr.get_state_statistics()),
    "metrics": asyncio.run(mgr.get_processing_metrics()),
}

dump("state_manager.json", {
    "ops": sm_log,
    "documents": SM_STORE["documents"],
    "transitions": SM_STORE["document_state_transitions"],
    "queries": sm_queries})

print("wave-2 fixtures written to", OUT)
