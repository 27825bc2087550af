#!/usr/bin/env python3
"""Generate reference-executed parity fixtures.

Runs the PURE reference modules (no app config, no network) from
/root/reference over deterministic adversarial inputs and records
their ACTUAL outputs as JSON under src/test/resources/refparity/.
ReferenceParitySpec replays the same inputs through the Scala
implementations and compares — parity against the reference binary
itself, not a hand-port.

Usage: python3 tools/gen_parity_fixtures.py
Deterministic: fixed input lists, no randomness, no timestamps.
"""
import json
import os
import sys

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
sys.path.insert(0, REF)

os.makedirs(OUT, exist_ok=True)


def dump(name, obj):
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True, ensure_ascii=False)
    print(f"wrote {name}")


# ---- relationship_types.py ------------------------------------------
from app.utils.relationship_types import (  # noqa: E402
    canonicalize_relationship_type, format_relationship_label)

REL_INPUTS = [
    None, "", "  ", "CAUSES", "causes", " may cause ", "located_in",
    "Conflicts With", "part of", "uses!", "DEPENDS_ON", "is-part-of",
    "relates to", "REPLACED_BY", "Mitigates", "123", "a b", "__",
    "\tPREVENTS\n", "caused by", "LOCATED IN", "requires", "Requires!",
    "contains", "component of", "affects", "IS_A", "type of",
    "precedes", "follows", "supports", "contradicts", "unknown junk",
    "RELATES_TO", "relates_to", "USES", "use", "USED_BY", "results in",
    "LEADS_TO", "associated with", "connected to",
]
dump("relationship_types.json", [
    {"input": v,
     "canonical": canonicalize_relationship_type(v),
     "label": format_relationship_label(
         canonicalize_relationship_type(v), v)}
    for v in REL_INPUTS])

# ---- entity_quality.py ----------------------------------------------
from app.utils.entity_quality import EntityQualityValidator  # noqa: E402

Q_NAMES = [
    "NC2045", "nc2045", "USB", "ab", "AB", "it", "This", "Running fast",
    "What is this", "pump", "the pump", "water pump assembly", "system",
    "System", "yesterday", "123", "1 2 3", "check", "Check valve",
    "a very long entity name that keeps going on and on and on beyond",
    "LED", "led display", "install", "installation", "o-ring", "O-Ring",
    "  padded  ", "now", "later stage", "thing", "component",
]
qrows = []
for n in Q_NAMES:
    ok, reason = EntityQualityValidator.is_valid_entity(n)
    qrows.append({
        "name": n, "valid": ok, "reason": reason,
        "score": EntityQualityValidator.calculate_quality_score(
            n, None, 0.5, 0),
        "score_rel3": EntityQualityValidator.calculate_quality_score(
            n, "component", 0.8, 3),
    })
dump("entity_quality.json", qrows)

# ---- entity_deduplication.py ----------------------------------------
from app.utils.entity_deduplication import EntityDeduplicator  # noqa: E402

NORM_INPUTS = [
    "Pump", "  The Pump  ", "pumps", "Water-Pump", "NC2045 sensor",
    "USB cable", "a pump", "an o-ring", "THE SYSTEM", "pump (main)",
    "temp sensor", "temperature sensor", "config file", "spec sheet",
    "pwr supply", "power supply",
]
dump("entity_dedup_normalize.json", [
    {"input": v, "normalized": EntityDeduplicator.normalize_name(v),
     "expanded": EntityDeduplicator.expand_abbreviations(v.lower())}
    for v in NORM_INPUTS])

SIM_PAIRS = [
    ("pump", "pumps"), ("pump", "Pump"), ("water pump", "pump"),
    ("temp sensor", "temperature sensor"), ("USB", "USB cable"),
    ("o-ring", "oring"), ("valve", "valve seat"), ("motor", "rotor"),
    ("power supply", "pwr supply"), ("sensor", "sensors"),
    ("control board", "controller board"), ("abc", "xyz"),
    ("NC2045", "NC2050"), ("water pump assembly", "water pump"),
]
dump("entity_dedup_similarity.json", [
    {"a": a, "b": b,
     "similarity": EntityDeduplicator.calculate_similarity(a, b),
     "singular_plural": EntityDeduplicator._are_singular_plural(
         EntityDeduplicator.normalize_name(a),
         EntityDeduplicator.normalize_name(b)),
     "variants": EntityDeduplicator._are_variants(
         EntityDeduplicator.normalize_name(a),
         EntityDeduplicator.normalize_name(b)),
     "compound": EntityDeduplicator._is_compound_term(
         EntityDeduplicator.normalize_name(a),
         EntityDeduplicator.normalize_name(b))}
    for a, b in SIM_PAIRS])

DEDUP_ENTITIES = [
    {"id": "e1", "name": "Pump", "type": "component", "confidence": 0.9},
    {"id": "e2", "name": "pumps", "type": "component", "confidence": 0.7},
    {"id": "e3", "name": "Water Pump", "type": "component", "confidence": 0.8},
    {"id": "e4", "name": "water pump", "type": "system", "confidence": 0.6},
    {"id": "e5", "name": "Valve", "type": "component", "confidence": 0.95},
    {"id": "e6", "name": "valve seat", "type": "component", "confidence": 0.5},
    {"id": "e7", "name": "Temp Sensor", "type": "component", "confidence": 0.8},
    {"id": "e8", "name": "Temperature Sensor", "type": "component",
     "confidence": 0.85},
    {"id": "e9", "name": "USB", "type": "technology", "confidence": 0.9},
    {"id": "e10", "name": "USB cable", "type": "component", "confidence": 0.4},
]
fixture = []
for cross in (True, False):
    for thr in (0.75, 0.85, 0.95):
        groups = EntityDeduplicator.find_duplicates(
            [dict(e) for e in DEDUP_ENTITIES], threshold=thr,
            cross_type=cross)
        fixture.append({
            "cross_type": cross, "threshold": thr,
            "groups": [[m["id"] for m in g] for g in groups]})
dump("entity_dedup_groups.json", fixture)

# context/chunk_id ride in each entity's metadata dict (:434-445);
# original_names/chunk_ids come off SETS whose iteration order is not
# reproducible across CPython runs — sorted here, compared sorted
merged = EntityDeduplicator.merge_entity_data([
    {"id": "e2", "name": "pumps", "type": "component", "confidence": 0.7,
     "metadata": {"chunk_id": "c2", "context": "ctx2"}},
    {"id": "e1", "name": "Pump", "type": "component", "confidence": 0.9,
     "metadata": {"chunk_id": "c1", "context": "ctx1"}},
    {"id": "e4", "name": "water pump", "type": "system", "confidence": 0.6,
     "metadata": {"chunk_id": "c1", "context": ""}},
])
merged["metadata"]["original_names"] = sorted(
    merged["metadata"]["original_names"])
merged["metadata"]["chunk_ids"] = sorted(merged["metadata"]["chunk_ids"])
dump("entity_dedup_merge.json", merged)

# ---- metadata_taxonomy.py -------------------------------------------
from app.models.metadata_taxonomy import (  # noqa: E402
    DocumentCategory, TagTaxonomy)

CATS = [c.value for c in DocumentCategory] + ["unknown_cat", ""]
TAGS = [
    "NC2045", "nc2045", "pump", "Pump", "leak", "LEAK", "replace",
    "CE", "ce", "urgent", "URGENT", "custom-thing", "sensor", "",
]
dump("taxonomy.json", {
    "display": [{"category": c,
                 "name": DocumentCategory.get_display_name(c)}
                for c in CATS],
    "tags": [{"tag": t, "class": TagTaxonomy.categorize_tag(t)}
             for t in TAGS]})

# ---- path_validator.validate_filename -------------------------------
from app.utils.path_validator import PathValidator  # noqa: E402

FNAMES = [
    "report.pdf", "a.txt", "CON", "con.txt", "COM1", "lpt9.doc",
    ".hidden", "..", "has space.txt", "bad<char>.txt", "tab\tname",
    "x" * 255, "x" * 256, "normal_file-v2.md", "trailing. ", "nul",
]
frows = []
for f in FNAMES:
    try:
        frows.append({"input": f, "ok": True,
                      "value": PathValidator.validate_filename(f)})
    except Exception as e:
        frows.append({"input": f, "ok": False, "error": str(e)})
dump("filename.json", frows)

# ---- python/cocoindex/validation.py ---------------------------------
# loaded standalone from its file: the package __init__ pulls the
# native _engine module, which this sandbox does not build
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "ref_validation", os.path.join(REF, "python", "cocoindex",
                                   "validation.py"))
validation = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(validation)

IDENTS = [
    "flow1", "Flow_1", "1flow", "__reserved", "has space", "has.dot",
    "a" * 64, "a" * 65, "", "ok-dash", "ok_under", "dots.in.full",
]
vrows = []
for n in IDENTS:
    row = {"input": n}
    for fn_name, fn in [
            ("field", validation.validate_field_name),
            ("flow", validation.validate_flow_name),
            ("full_flow", validation.validate_full_flow_name)]:
        try:
            fn(n)
            row[fn_name] = None
        except Exception as e:
            row[fn_name] = str(e)
    vrows.append(row)
dump("naming.json", vrows)

# ---- app/processors/chunker.py --------------------------------------
from app.processors.chunker import DocumentChunker  # noqa: E402
from app.models.chunk import ChunkingStrategy  # noqa: E402

CHUNK_TEXTS = [
    # terminator-at-end (no trailing space) does not split; '?! ' mixes
    "One sentence. Two sentences! Three? Four ends here.",
    # whitespace-only fixed windows must drop
    "abc" + " " * 40 + "def" + " " * 40 + "ghi jkl mno pqr stu vwx",
    # paragraphs, one oversize -> sentence cascade
    ("Para one is short.\n\nPara two is also short.\n\n" +
     "This paragraph is long. " * 8 + "\n\nTail para."),
    # repeated chunk text exercises the find current_position advance
    "dup. dup. dup. dup. dup. dup. dup. dup.",
    # unicode (code-point counting)
    "Héllo wörld. ééé café! Déjà vu? Fin.",
    "",
    "   ",
    "no terminators at all just words " * 6,
]
chunker = DocumentChunker()
crows = []
for ti, text in enumerate(CHUNK_TEXTS):
    for strat in ChunkingStrategy:
        for size, ov in ((40, 10), (80, 0)):
            out = chunker.chunk_text(text, strat, size, ov)
            crows.append({
                "text_id": ti, "strategy": strat.value,
                "chunk_size": size, "chunk_overlap": ov,
                "chunks": [{
                    "text": c["text"],
                    "chunk_index": c["metadata"]["chunk_index"],
                    "chunk_size": c["metadata"]["chunk_size"],
                    "start_index": c["metadata"]["start_index"],
                    "end_index": c["metadata"]["end_index"],
                } for c in out]})
dump("processor_chunker.json", {"texts": CHUNK_TEXTS, "cases": crows})

# real corpus texts: first 20 documents by doc_id at sf0.001
import duckdb  # noqa: E402

docs = duckdb.sql(
    "SELECT doc_id, text FROM "
    "read_parquet('/root/testdata/sf0.001/documents.parquet') "
    "ORDER BY doc_id LIMIT 20").fetchall()
drows = []
for doc_id, text in docs:
    for strat in ("recursive", "sentence", "fixed"):
        out = chunker.chunk_text(text, ChunkingStrategy(strat), 500, 50)
        drows.append({
            "doc_id": doc_id, "strategy": strat,
            "n_chunks": len(out),
            "chunks": [{
                "text": c["text"],
                "start_index": c["metadata"]["start_index"],
                "end_index": c["metadata"]["end_index"],
            } for c in out]})
dump("processor_chunker_corpus.json", drows)

# ---- metadata_extraction_service.py (stub-loaded) -------------------
# app/services/__init__ and app/config pull supabase/pydantic settings;
# the tag-merge tier is pure, so the module FILE loads directly with
# those deps stubbed
import types  # noqa: E402

for _name in ["supabase"]:
    if _name not in sys.modules:
        sys.modules[_name] = types.ModuleType(_name)
sys.modules["supabase"].create_client = lambda *a, **k: None
sys.modules["supabase"].Client = object
_cfg = types.ModuleType("app.config")
_cfg.settings = types.SimpleNamespace(
    openai_api_key=None, gemini_api_key=None, metadata_model="gpt-4o-mini")
sys.modules["app.config"] = _cfg
_mes_spec = importlib.util.spec_from_file_location(
    "ref_mes", os.path.join(REF, "app", "services",
                            "metadata_extraction_service.py"))
mes = importlib.util.module_from_spec(_mes_spec)
_mes_spec.loader.exec_module(mes)

MERGE_CASES = [
    (["NC2045", "pump", "custom"],
     "The NC2045 pump has a leak. PC1234 too."),
    ([], "Routine inspection of the valve and o-ring showed corrosion "
         "and a crack near SM123."),
    (["urgent", "replace", "CE"],
     "Replace the sensor. The display flickers and overheats."),
    (["Pump", "PUMP", "pump"], "pump Pump PUMP pumping pumps"),
    (["a"] * 20, "NC0001 NC0002 NC0003 NC0004 NC0005 leak noise "
                 "motor fan filter valve seal gasket bearing"),
    ([], ""),
]
dump("metadata_merge.json", [
    {"llm_tags": t, "content": c,
     "merged": mes._merge_tags(list(t), c),
     # list(set(...)) in the reference — order is hash-seed noise,
     # recorded sorted and compared sorted
     "products": sorted(mes._regex_product_models(c)),
     "components": mes._regex_components(c),
     "issues": mes._regex_issues(c)}
    for t, c in MERGE_CASES])

# ---- models/document_state.py ---------------------------------------
from app.models.document_state import DocumentState  # noqa: E402

dump("document_state.json", {
    "transitions": {s.value: [t.value for t in
                              DocumentState.valid_transitions()[s]]
                    for s in DocumentState},
    "flags": [{"state": s.value, "terminal": s.is_terminal,
               "error": s.is_error,
               "requires_action": s.requires_action}
              for s in DocumentState]})

# ---- services/document_processor.py (pure stdlib, file-loaded) ------
import asyncio  # noqa: E402

_dp_spec = importlib.util.spec_from_file_location(
    "ref_dp", os.path.join(REF, "app", "services",
                           "document_processor.py"))
dp_mod = importlib.util.module_from_spec(_dp_spec)
_dp_spec.loader.exec_module(dp_mod)
dp = dp_mod.DocumentProcessor()

DP_TEXTS = [
    # markdown headers drive the recursive separator hierarchy
    ("# Title\n\n" + "Intro paragraph with enough text to matter. " * 6 +
     "\n## Section A\n" + "Body line one. Body line two! More text? " * 8 +
     "\n### Sub A1\n" + "Deep content sentence. " * 10 +
     "\n\nAnother paragraph here. " * 5),
    # plain prose (no headers) -> paragraph/sentence/word fallbacks
    ("Sentence one is here. Sentence two follows! Is this three? " * 12),
    # short text below min_chunk_size
    "tiny",
    # text with long runs and no separators at all
    "x" * 900,
    # unicode
    ("Héllo wörld. " * 40 + "\n\n" + "Café déjà vu. " * 30),
]
dprows = []
for ti, text in enumerate(DP_TEXTS):
    for method in ("recursive", "sentence", "fixed"):
        for size, ov, mn in ((300, 50, 100), (200, 0, 50)):
            try:
                out = asyncio.run(dp.chunk_document(
                    text, method, size, ov, "markdown", mn))
                dprows.append({
                    "text_id": ti, "method": method, "chunk_size": size,
                    "chunk_overlap": ov, "min_chunk_size": mn,
                    "chunks": [{"text": c["text"],
                                "start": c["start"], "end": c["end"],
                                "chunk_id": c["chunk_id"]}
                               for c in out]})
            except TypeError:
                # the sentence arm's live TypeError on a second
                # mid-flush (document_processor.py) — a real arm,
                # recorded as such
                dprows.append({
                    "text_id": ti, "method": method, "chunk_size": size,
                    "chunk_overlap": ov, "min_chunk_size": mn,
                    "error": "TypeError"})
dump("doc_processor_chunks.json", {"texts": DP_TEXTS, "cases": dprows})

print("all fixtures written to", OUT)
