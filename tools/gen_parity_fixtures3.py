#!/usr/bin/env python3
"""Parity-fixture wave 3: the Python-side type encoding.

Runs python/cocoindex/typing.py STANDALONE (the package __init__ pulls
the compiled engine, so the module is loaded directly with a stub
package) and records `encode_enriched_type` over a battery of
annotations — every §1.3 mapping arm plus the error vocabulary.
Output: src/test/resources/refparity/py_type_encoding.json, replayed
by PyTypeEncodingSpec against types/PyTypeEncoding.scala.
"""
import dataclasses
import datetime
import importlib.util
import json
import sys
import types
import uuid
from collections.abc import Sequence
from typing import Annotated, Any, Literal, NamedTuple

import numpy as np

REF = "/root/reference/python/cocoindex"

pkg = types.ModuleType("cocoindex")
pkg.__path__ = [REF]
sys.modules["cocoindex"] = pkg
spec = importlib.util.spec_from_file_location(
    "cocoindex.typing", REF + "/typing.py")
m = importlib.util.module_from_spec(spec)
sys.modules["cocoindex.typing"] = m
spec.loader.exec_module(m)
E = m.encode_enriched_type


@dataclasses.dataclass
class Chunk:
    start: int
    text: str
    score: float | None = None


@dataclasses.dataclass
class Row:
    id: int
    v: str


class Pt(NamedTuple):
    x: float
    y: float


@dataclasses.dataclass
class Doc:
    """A custom docstring."""

    id: int


import enum  # noqa: E402


class Color(enum.Enum):
    RED = "r"
    BLUE = "b"


# the docstring overrides the auto-signature, which would embed the
# TypeAttr instance's memory address (non-deterministic fixtures)
@dataclasses.dataclass
class WithAttr:
    """Attr carrier."""

    f: Annotated[str, m.TypeAttr("cocoindex.io/x", 1)]


@dataclasses.dataclass
class BlankDoc:
    x: int


BlankDoc.__doc__ = ""

from typing import Optional  # noqa: E402

cases = [
    ("bytes", lambda: E(bytes)),
    ("str", lambda: E(str)),
    ("bool", lambda: E(bool)),
    ("int", lambda: E(int)),
    ("float", lambda: E(float)),
    ("uuid", lambda: E(uuid.UUID)),
    ("date", lambda: E(datetime.date)),
    ("time", lambda: E(datetime.time)),
    ("local_datetime", lambda: E(m.LocalDateTime)),
    ("datetime", lambda: E(datetime.datetime)),
    ("timedelta", lambda: E(datetime.timedelta)),
    ("range", lambda: E(m.Range)),
    ("json", lambda: E(m.Json)),
    ("np_int64", lambda: E(np.int64)),
    ("np_float32", lambda: E(np.float32)),
    ("np_float64", lambda: E(np.float64)),
    ("opt_str", lambda: E(str | None)),
    ("union_int_str", lambda: E(int | str)),
    ("opt_union", lambda: E(int | str | None)),
    ("vector_f32_dim3", lambda: E(m.Vector[np.float32, Literal[3]])),
    ("vector_f64_nodim", lambda: E(m.Vector[np.float64])),
    ("ndarray_f32", lambda: E(np.typing.NDArray[np.float32])),
    ("list_int", lambda: E(list[int])),
    ("seq_int", lambda: E(Sequence[int])),
    ("dataclass", lambda: E(Chunk)),
    ("namedtuple", lambda: E(Pt)),
    ("list_struct", lambda: E(list[Chunk])),
    ("dict_str_struct", lambda: E(dict[str, Row])),
    ("dict_int_struct", lambda: E(dict[int, Row])),
    ("attr_annotated", lambda: E(Annotated[str, m.TypeAttr(
        "cocoindex.io/content_filename", True)])),
    ("vector_of_struct", lambda: E(m.Vector[Chunk])),
    # quirk pair: Optional[Annotated] keeps attrs, Annotated[Optional]
    # drops them (the union branch's early return)
    ("opt_annotated", lambda: E(
        Optional[Annotated[str, m.TypeAttr("k", 1)]])),
    ("annotated_opt", lambda: E(
        Annotated[str | None, m.TypeAttr("k", 1)])),
    ("field_attrs", lambda: E(WithAttr)),
    ("blank_doc", lambda: E(BlankDoc)),
    ("docstring_dataclass", lambda: E(Doc)),
    ("float32_alias", lambda: E(m.Float32)),
    ("float64_alias", lambda: E(m.Float64)),
    ("offsetdt_alias", lambda: E(m.OffsetDateTime)),
    ("annotated_list_vector", lambda: E(
        Annotated[list[np.float32], m.VectorInfo(dim=4)])),
    ("opt_struct", lambda: E(Doc | None)),
    ("nested_vec_vec", lambda: E(
        m.Vector[m.Vector[np.float32, Literal[2]], Literal[3]])),
    # error arms
    ("err_enum", lambda: E(Color)),
    ("err_set", lambda: E(set[int])),
    ("err_any", lambda: E(Any)),
    ("err_bare_list", lambda: E(list)),
    ("err_bare_dict", lambda: E(dict)),
    ("err_dict_str_str", lambda: E(dict[str, str])),
    ("err_tuple", lambda: E(tuple[int, str])),
    ("err_literal", lambda: E(Literal["a", "b"])),
    ("err_none", lambda: E(type(None))),
]

out = {}
for name, f in cases:
    try:
        out[name] = {"ok": f()}
    except Exception as e:  # noqa: BLE001 - recording the error arm
        out[name] = {"error": str(e), "error_type": type(e).__name__}

path = "src/test/resources/refparity/py_type_encoding.json"
with open(path, "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=True)
print(f"wrote {path}: {len(out)} cases")
