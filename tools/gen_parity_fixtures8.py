#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 8: the custom-op
registration surface (python/cocoindex/op.py) — the decorator naming
rule, the analyze_schema argument-binding ladder with its error
vocabulary and the nullable-output flip, the __call__ required-null
short-circuit, and the cache/behavior-version fallbacks — run FOR
REAL over the reference's own op.py (with real typing.py/convert.py
underneath; only the `_engine` module is a recording stand-in).

Output: src/test/resources/refparity/op_binding.json, replayed by
OpBindingSpec against dataflow/OpBinding.scala.
"""
import asyncio
import importlib.util
import json
import os
import sys
import types
import typing
import inspect

REF = "/root/reference/python/cocoindex"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
os.makedirs(OUT, exist_ok=True)

REGISTERED = []
_engine = types.ModuleType("_engine")
_engine.register_function_factory = (
    lambda name, factory: REGISTERED.append((name, factory)))
class _OpArgSchema:  # annotation-only stand-in
    pass
_engine.OpArgSchema = _OpArgSchema
sys.modules["cocoindex._engine"] = _engine

pkg = types.ModuleType("cocoindex")
pkg.__path__ = [REF]
pkg._engine = _engine
sys.modules["cocoindex"] = pkg

for name in ("typing", "convert", "op"):
    spec = importlib.util.spec_from_file_location(
        f"cocoindex.{name}", os.path.join(REF, f"{name}.py"))
    m = importlib.util.module_from_spec(spec)
    sys.modules[f"cocoindex.{name}"] = m
    spec.loader.exec_module(m)
op = sys.modules["cocoindex.op"]

class ArgSchema:
    """_engine.OpArgSchema stand-in: an engine-typed argument."""
    def __init__(self, kind="Str", nullable=False, analyzed_value=None):
        self.value_type = {"type": {"kind": kind}, "nullable": nullable}
        self.analyzed_value = analyzed_value

fixture = {}

# ---- 1. @op.function: snake_case -> CamelCase op naming -------------

name_cases = []
for fn_name in ["my_func", "extract_entities_v2", "HTTP_call", "a__b",
                "a_", "_a", "x", "\u00dfeta_x", "\u01c6a_b",
                "\U00010428abc_x"]:
    REGISTERED.clear()
    def _f(text: str) -> str: return text
    _f.__name__ = fn_name
    _f.__qualname__ = fn_name
    op.function()(_f)
    name_cases.append({"fn": fn_name, "op_name": REGISTERED[0][0]})
fixture["op_name"] = name_cases

# ---- 2. the analyze_schema binding ladder ---------------------------

def analyze(sig_fn, pos, kw, op_kwargs=None):
    """Register sig_fn via @op.function and run the factory's
    analyze_schema with the given ArgSchemas; returns the encoded
    result type or the ValueError text."""
    REGISTERED.clear()
    op.function(**(op_kwargs or {}))(sig_fn)
    factory = REGISTERED[0][1]
    try:
        result_type, _ex = factory({}, *pos, **kw)
        return {"result_type": result_type}
    except ValueError as e:
        return {"error": str(e)}

def f2(a: str, b: int = 3) -> str: return a
def f_kwonly(a: str, *, flag: int) -> str: return a
def f_varpos(a: str, *rest: str) -> str: return a
def f_varkw(a: str, **kw: typing.Any) -> str: return a
def f_opt(a: typing.Optional[str]) -> str: return a or ""
def f_req(a: str) -> str: return a

bind_cases = [
    {"name": "pos_and_default_kwarg", "sig": "f2",
     "out": analyze(f2, [ArgSchema()], {"b": ArgSchema(kind="Int64")})},
    {"name": "too_many_args", "sig": "f2",
     "out": analyze(f2, [ArgSchema(), ArgSchema(kind="Int64"),
                         ArgSchema()], {})},
    {"name": "kwonly_hit_positionally", "sig": "f_kwonly",
     "out": analyze(f_kwonly, [ArgSchema(), ArgSchema(kind="Int64")],
                    {})},
    {"name": "unexpected_kwarg", "sig": "f2",
     "out": analyze(f2, [ArgSchema()], {"zzz": ArgSchema()})},
    {"name": "missing_required_kwonly", "sig": "f_kwonly",
     "out": analyze(f_kwonly, [ArgSchema()], {})},
    {"name": "missing_positional", "sig": "f2",
     "out": analyze(f2, [], {})},
    {"name": "varpos_absorbs", "sig": "f_varpos",
     "out": analyze(f_varpos, [ArgSchema(), ArgSchema(), ArgSchema()],
                    {})},
    {"name": "varkw_absorbs_unknown", "sig": "f_varkw",
     "out": analyze(f_varkw, [ArgSchema()], {"zzz": ArgSchema()})},
    {"name": "nullable_arg_into_required_flips_output", "sig": "f_req",
     "out": analyze(f_req, [ArgSchema(nullable=True)], {})},
    {"name": "nullable_arg_into_optional_no_flip", "sig": "f_opt",
     "out": analyze(f_opt, [ArgSchema(nullable=True)], {})},
    {"name": "plain_no_flip", "sig": "f_req",
     "out": analyze(f_req, [ArgSchema()], {})},
]
fixture["bind"] = bind_cases

# ---- 3. __call__'s required-null short-circuit ----------------------

def run_call(sig_fn, pos_schemas, pos_values):
    REGISTERED.clear()
    op.function()(sig_fn)
    factory = REGISTERED[0][1]
    _t, ex = factory({}, *pos_schemas)
    return asyncio.run(ex(*pos_values))

fixture["call_null"] = [
    {"name": "required_null_returns_none",
     "result": run_call(f_req, [ArgSchema()], [None])},
    {"name": "required_value_passes",
     "result": run_call(f_req, [ArgSchema()], ["hello"])},
    {"name": "optional_null_decodes",
     "result": run_call(f_opt, [ArgSchema(nullable=True)], [None])},
]

# ---- 4. cache / behavior-version fallbacks --------------------------

class _ExecPlain:
    spec: op.FunctionSpec
    def __call__(self, a: str) -> str: return a
class _SpecCls(op.FunctionSpec):
    pass
_ExecPlain.__annotations__["spec"] = _SpecCls

wrapped = op.executor_class(cache=True, behavior_version=7)(_ExecPlain)
inst = wrapped.__new__(wrapped)
fixture["op_args_fallback"] = {
    "enable_cache": inst.enable_cache(),
    "behavior_version": inst.behavior_version()}

# the no-spec-annotation TypeError
try:
    class _NoSpec:
        def __call__(self, a: str) -> str: return a
    op.executor_class()(_NoSpec)
    fixture["no_spec_error"] = "no error"
except TypeError as e:
    fixture["no_spec_error"] = str(e)

with open(os.path.join(OUT, "op_binding.json"), "w") as f:
    json.dump(fixture, f, indent=1, sort_keys=True, ensure_ascii=False)
print("wrote op_binding.json:",
      {k: (len(v) if isinstance(v, list) else v)
       for k, v in fixture.items()})
