#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 10: the app
pydantic models' mutation ladders (app/models/document.py, entity.py,
chunk.py), run FOR REAL: Document.transition_to's per-state side
effects and its enum-repr error string, Entity.verify/edit (the
first-edit original_name snapshot targeting the LEGACY entity_name
field), Chunk.edit (original_text snapshot + embedding_id clear), and
the to_supabase_dict shapes (exclude_none keys, enum coercion, the
chunk_size default).

Output: src/test/resources/refparity/model_rows.json, replayed by
ModelRowsSpec against operators/ModelRows.scala.
"""
import json
import os
import sys
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
os.makedirs(OUT, exist_ok=True)

from app.models.document import Document, DocumentState
from app.models.entity import Entity, EntityRelationship
from app.models.chunk import Chunk

fixture = {}

# ---- 1. Document.transition_to: the side-effect walk ----------------

d = Document(name="N", title="T", source_type="notion", content="c")

def snap(doc):
    return {
        "status": str(doc.status.value if hasattr(doc.status, "value")
                      else doc.status),
        "processing_error": doc.processing_error,
        "retry_count": doc.retry_count,
        "publish_attempts": doc.publish_attempts,
        "last_publish_error": doc.last_publish_error,
        "processed_at_set": doc.processed_at is not None,
        "approved_at_set": doc.approved_at is not None,
        "published_at_set": doc.published_at is not None,
    }

walk = [{"step": "init", **snap(d)}]
for step, state, err in [
    ("to_processing", DocumentState.PROCESSING, None),
    ("to_failed_with_error", DocumentState.FAILED, "boom"),
    ("retry_processing_clears_error", DocumentState.PROCESSING, None),
    ("to_pending_review", DocumentState.PENDING_REVIEW, None),
    ("to_approved", DocumentState.APPROVED, None),
    ("to_publishing", DocumentState.PUBLISHING, None),
    ("to_publish_failed_with_error", DocumentState.PUBLISH_FAILED,
     "store down"),
    ("back_to_publishing", DocumentState.PUBLISHING, None),
    ("to_published_clears_publish_error", DocumentState.PUBLISHED, None),
    ("reprocess_from_published", DocumentState.PROCESSING, None),
]:
    d.transition_to(state, error=err)
    walk.append({"step": step, **snap(d)})
fixture["transition_walk"] = walk

# a FAILED transition WITHOUT an error: neither error nor retry_count
d2 = Document(name="N", title="T", source_type="notion", content="c")
d2.transition_to(DocumentState.PROCESSING)
d2.transition_to(DocumentState.FAILED)
fixture["failed_without_error"] = snap(d2)
# `and error` is truthiness: an EMPTY error string records nothing
d2e = Document(name="N", title="T", source_type="notion", content="c")
d2e.transition_to(DocumentState.PROCESSING)
d2e.transition_to(DocumentState.FAILED, error="")
fixture["failed_empty_error"] = snap(d2e)
# an INGESTED arm (approved -> ingested sets processed_at)
d3 = Document(name="N", title="T", source_type="notion", content="c")
for s in [DocumentState.PROCESSING, DocumentState.PENDING_REVIEW,
          DocumentState.APPROVED, DocumentState.INGESTED]:
    d3.transition_to(s)
fixture["ingested_arm"] = snap(d3)

# invalid transitions: the enum-REPR error string
invalid = []
for frm, to in [(DocumentState.DISCOVERED, DocumentState.INGESTED),
                (DocumentState.DELETED, DocumentState.PROCESSING),
                (DocumentState.PUBLISHED, DocumentState.APPROVED)]:
    dd = Document(name="N", title="T", source_type="notion", content="c")
    dd.status = frm
    try:
        dd.transition_to(to)
        invalid.append({"from": frm.value, "to": to.value,
                        "error": "no error"})
    except ValueError as e:
        invalid.append({"from": frm.value, "to": to.value,
                        "error": str(e)})
fixture["invalid_transitions"] = invalid

# ---- 2. Entity.verify / Entity.edit ---------------------------------

e = Entity(name="X", type="person", entity_name="XLegacy")
steps = []
e.edit("Y")
steps.append({"step": "edit1", "name": e.name,
              "entity_name": e.entity_name,
              "original_name": e.original_name, "is_edited": e.is_edited})
e.edit("Z")
steps.append({"step": "edit2", "name": e.name,
              "entity_name": e.entity_name,
              "original_name": e.original_name, "is_edited": e.is_edited})
e.verify("alice")
steps.append({"step": "verify", "is_verified": e.is_verified,
              "verified_by": e.verified_by,
              "verified_at_set": e.verified_at is not None})
fixture["entity_steps"] = steps

# ---- 3. Chunk.edit --------------------------------------------------

c = Chunk(document_id="d", chunk_text="hello world", chunk_index=0,
          chunking_strategy="recursive", embedding_id="emb1")
csteps = []
c.edit("new text", "bob")
csteps.append({"step": "edit1", "chunk_text": c.chunk_text,
               "original_text": c.original_text, "is_edited": c.is_edited,
               "edited_by": c.edited_by,
               "embedding_id": c.embedding_id})
c.embedding_id = "emb2"
c.edit("newer", "carol")
csteps.append({"step": "edit2", "chunk_text": c.chunk_text,
               "original_text": c.original_text,
               "edited_by": c.edited_by,
               "embedding_id": c.embedding_id})
fixture["chunk_steps"] = csteps

# ---- 4. to_supabase_dict shapes -------------------------------------

dd = Document(name="N", title="T", source_type="notion", content="c")
sd = dd.to_supabase_dict()
fixture["document_dict"] = {
    "keys": sorted(sd.keys()),
    "status": sd["status"], "source_type": sd["source_type"],
    "created_at_is_str": isinstance(sd.get("created_at"), str)}

c2 = Chunk(document_id="d", chunk_text="hello", chunk_index=0,
           chunking_strategy="recursive")
cd = c2.to_supabase_dict()
fixture["chunk_dict"] = {
    "keys": sorted(cd.keys()),
    "chunk_size": cd.get("chunk_size"),
    "chunking_strategy": cd.get("chunking_strategy")}
c3 = Chunk(document_id="d", chunk_text="hello", chunk_index=0,
           chunking_strategy="recursive", chunk_size=3)
fixture["chunk_dict_explicit_size"] = \
    c3.to_supabase_dict().get("chunk_size")
# the falsy check: an EXPLICIT chunk_size of 0 still defaults to len
c4 = Chunk(document_id="d", chunk_text="hello", chunk_index=0,
           chunking_strategy="recursive", chunk_size=0)
fixture["chunk_dict_zero_size"] = c4.to_supabase_dict().get("chunk_size")
# len() counts CODE POINTS: two astral emoji = 2, not 4
c5 = Chunk(document_id="d", chunk_text="\U0001f600\U0001f600",
           chunk_index=0, chunking_strategy="recursive")
fixture["chunk_dict_astral_size"] = c5.to_supabase_dict().get("chunk_size")

en = Entity(name="X", type="person")
ed = en.to_supabase_dict()
fixture["entity_dict_keys"] = sorted(ed.keys())

r = EntityRelationship(source_entity_id="a", target_entity_id="b",
                       relationship_type="uses")
fixture["relationship_dict_keys"] = sorted(r.to_supabase_dict().keys())

with open(os.path.join(OUT, "model_rows.json"), "w") as f:
    json.dump(fixture, f, indent=1, sort_keys=True, ensure_ascii=False)
print("wrote model_rows.json:",
      {k: (len(v) if isinstance(v, list) else "obj")
       for k, v in fixture.items()})
