#!/usr/bin/env python3
"""Parity-fixture wave 4: the Python-side value conversion.

Runs python/cocoindex/convert.py standalone (same stub-package trick
as wave 3) and records:
  - `encode_engine_value` over representative Python values (the
    engine-boundary shapes: positional structs, key-prepended KTable
    rows, passthrough scalars) — temporals/uuids canonicalized via
    str() and ndarrays tagged, so the fixture stays JSON;
  - `make_engine_value_decoder` ERROR ARMS — the exact field-path
    message vocabulary for type/shape mismatches.
Output: src/test/resources/refparity/py_value_conversion.json,
replayed by PyValueConversionSpec.
"""
import dataclasses
import datetime
import importlib.util
import json
import sys
import types
import uuid
from typing import NamedTuple

import numpy as np

REF = "/root/reference/python/cocoindex"

pkg = types.ModuleType("cocoindex")
pkg.__path__ = [REF]
sys.modules["cocoindex"] = pkg
for mod in ["typing", "convert"]:
    spec = importlib.util.spec_from_file_location(
        f"cocoindex.{mod}", f"{REF}/{mod}.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[f"cocoindex.{mod}"] = m
    spec.loader.exec_module(m)
t = sys.modules["cocoindex.typing"]
c = sys.modules["cocoindex.convert"]


def canon(v):
    """Fixture-JSON canonicalization of an engine-boundary value."""
    if isinstance(v, np.ndarray):
        return {"__ndarray__": [float(x) for x in v],
                "dtype": str(v.dtype)}
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time,
                      datetime.timedelta, uuid.UUID)):
        return {"__str__": str(v), "type": type(v).__name__}
    if isinstance(v, list):
        return [canon(x) for x in v]
    if isinstance(v, tuple):
        return {"__tuple__": [canon(x) for x in v]}
    if isinstance(v, dict):
        return {k: canon(x) for k, x in v.items()}
    if isinstance(v, bytes):
        return {"__bytes__": list(v)}
    return v


@dataclasses.dataclass
class Chunk:
    start: int
    text: str
    score: float | None = None


class Pt(NamedTuple):
    x: float
    y: float


E = c.encode_engine_value
enc_cases = [
    ("int", lambda: E(5)),
    ("str", lambda: E("x")),
    ("float", lambda: E(2.5)),
    ("bool", lambda: E(True)),
    ("none", lambda: E(None)),
    ("bytes", lambda: E(b"hi")),
    ("uuid", lambda: E(uuid.UUID("12345678-1234-5678-1234-567812345678"))),
    ("date", lambda: E(datetime.date(2024, 3, 7))),
    ("time", lambda: E(datetime.time(1, 2, 3))),
    ("timedelta", lambda: E(datetime.timedelta(days=1, seconds=2))),
    ("dataclass", lambda: E(Chunk(1, "a"))),
    ("dataclass_default", lambda: E(Chunk(1, "a", 0.5))),
    ("namedtuple", lambda: E(Pt(1.0, 2.0))),
    ("ltable", lambda: E([Chunk(1, "a"), Chunk(2, "b")])),
    ("ktable", lambda: E({"k1": Chunk(1, "a"), "k2": Chunk(2, "b")})),
    ("ktable_tuplekey", lambda: E({("a", 1): Chunk(1, "x")})),
    ("list_int", lambda: E([1, 2, 3])),
    ("ndarray_f32", lambda: E(np.array([1.0, 2.0], dtype=np.float32))),
    ("nested_list", lambda: E([[Chunk(1, "a")], []])),
    ("np_scalar", lambda: E(np.int64(9))),
    # non-struct dicts pass through; tuples become lists
    ("plain_dict", lambda: E({"a": 1})),
    ("empty_dict", lambda: E({})),
    ("tuple", lambda: E((1, 2))),
    ("nested_tuple", lambda: E([(1, 2)])),
]

out = {"encode": {}, "decode_errors": {}}
for name, f in enc_cases:
    try:
        out["encode"][name] = {"ok": canon(f())}
    except Exception as e:  # noqa: BLE001
        out["encode"][name] = {"error": str(e),
                               "error_type": type(e).__name__}


def decoder_err(name, src_type, dst_annotation, value):
    try:
        dec = c.make_engine_value_decoder(
            ["$root"], src_type, t.analyze_type_info(dst_annotation))
        dec(value)
        out["decode_errors"][name] = {"ok": True}
    except Exception as e:  # noqa: BLE001
        out["decode_errors"][name] = {"error": str(e),
                                      "error_type": type(e).__name__}


out["decode_ok"] = {}
STRUCT_T = {"kind": "Struct", "fields": [
    {"name": "start", "type": {"kind": "Int64"}},
    {"name": "text", "type": {"kind": "Str"}}]}


@dataclasses.dataclass
class Chunk2:
    start: int
    text: str


def decoder_ok(name, src_type, dst_annotation, value, canonize):
    dec = c.make_engine_value_decoder(
        ["$root"], src_type, t.analyze_type_info(dst_annotation))
    out["decode_ok"][name] = canonize(dec(value))


decoder_ok("struct", STRUCT_T, Chunk2, [5, "hello"],
           dataclasses.asdict)
decoder_ok("ltable",
           {"kind": "LTable", "row": {"fields": STRUCT_T["fields"]}},
           list[Chunk2], [[1, "a"], [2, "b"]],
           lambda rows: [dataclasses.asdict(r) for r in rows])
decoder_ok("ktable",
           {"kind": "KTable", "row": {"fields":
               [{"name": "_key", "type": {"kind": "Str"}}]
               + STRUCT_T["fields"]}},
           dict[str, Chunk2], [["k", 5, "x"], ["j", 1, "y"]],
           lambda d: {k: dataclasses.asdict(v)
                      for k, v in sorted(d.items())})
decoder_ok("vector",
           {"kind": "Vector", "element_type": {"kind": "Float32"},
            "dimension": 2},
           t.Vector[np.float32,
                    __import__("typing").Literal[2]],
           [1.0, 2.0], canon)

VEC_F32 = {"kind": "Vector", "element_type": {"kind": "Float32"},
           "dimension": 3}
decoder_err("null_nonnull_vector", VEC_F32,
            t.Vector[np.float32], None)
decoder_err("vector_dim_mismatch",
            {"kind": "Vector", "element_type": {"kind": "Float32"},
             "dimension": 3},
            t.Vector[np.float32, __import__("typing").Literal[3]],
            [1.0, 2.0])
decoder_err("struct_for_scalar",
            {"kind": "Struct", "fields": [
                {"name": "x", "type": {"kind": "Int64"}}]},
            int, [1])
decoder_err("ltable_needs_list",
            {"kind": "LTable", "row": {"fields": [
                {"name": "x", "type": {"kind": "Int64"}}]}},
            int, [[1]])

path = "src/test/resources/refparity/py_value_conversion.json"
with open(path, "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=True)
print(f"wrote {path}: {len(out['encode'])} encode, "
      f"{len(out['decode_errors'])} decoder cases")
