#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 9: the
python-side flow-builder faces (python/cocoindex/flow.py) — the
_NameBuilder generated-name law, _to_snake_case, get_flow_full_name,
the open_flow registry duplicate error, the DSL type-guard error
vocabulary, the GeneratedField UUID validation, and the
transform_flow decorator's parameter validation — run FOR REAL over
the reference's flow.py (real op/typing/convert/validation/setting
underneath; `_engine` and rich are import-time stand-ins; every
recorded arm fires BEFORE any engine call).

Output: src/test/resources/refparity/py_flow_faces.json, replayed by
PyFlowFacesSpec against dataflow/PyFlowFaces.scala.
"""
import importlib.util
import json
import os
import re
import sys
import types
import typing

REF = "/root/reference/python/cocoindex"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
os.makedirs(OUT, exist_ok=True)

# ---- stand-ins ------------------------------------------------------

_engine = types.ModuleType("_engine")
class _EngineDataSlice:  # isinstance target in _DataSliceState
    def field(self, name):
        return None
class _EngineFlowBuilder:
    def __init__(self, full_name): self.full_name = full_name
_engine.DataSlice = _EngineDataSlice
_engine.FlowBuilder = _EngineFlowBuilder
_engine.register_function_factory = lambda name, factory: None
class _OpArgSchema: pass
_engine.OpArgSchema = _OpArgSchema
class _SetupChangeBundle: pass
_engine.SetupChangeBundle = _SetupChangeBundle
class _FlowLiveUpdater: pass
_engine.FlowLiveUpdater = _FlowLiveUpdater
class _TransientFlow: pass
_engine.TransientFlow = _TransientFlow
class _Flow: pass
_engine.Flow = _Flow
_engine.flow_names_with_setup_async = None
sys.modules["cocoindex._engine"] = _engine

_rich = types.ModuleType("rich")
_tree = types.ModuleType("rich.tree")
class _Tree:
    def __init__(self, *a, **k): self.children = []
    def add(self, *a, **k): return _Tree()
_tree.Tree = _Tree
_text = types.ModuleType("rich.text")
class _Text:
    def __init__(self, *a, **k): pass
_text.Text = _Text
sys.modules["rich"] = _rich
sys.modules["rich.tree"] = _tree
sys.modules["rich.text"] = _text

pkg = types.ModuleType("cocoindex")
pkg.__path__ = [REF]
pkg._engine = _engine
sys.modules["cocoindex"] = pkg

runtimemod = types.ModuleType("cocoindex.runtime")
class _Ctx:
    def run(self, coro): raise RuntimeError("engine boundary")
runtimemod.execution_context = _Ctx()
sys.modules["cocoindex.runtime"] = runtimemod

for name in ("validation", "setting", "typing", "convert", "index",
             "op", "setup", "flow"):
    spec = importlib.util.spec_from_file_location(
        f"cocoindex.{name}", os.path.join(REF, f"{name}.py"))
    m = importlib.util.module_from_spec(spec)
    sys.modules[f"cocoindex.{name}"] = m
    spec.loader.exec_module(m)
flow = sys.modules["cocoindex.flow"]
setting = sys.modules["cocoindex.setting"]
op = sys.modules["cocoindex.op"]

fixture = {}

# ---- 1. _to_snake_case ----------------------------------------------

fixture["to_snake_case"] = [
    {"in": s, "out": flow._to_snake_case(s)}
    for s in ["SplitRecursively", "EmbedText", "X", "already_snake",
              "HTTPServer", "ParseJSON5", "lowerThenUpper", "ABC"]]

# ---- 2. _NameBuilder ------------------------------------------------

nb = flow._NameBuilder()
steps = []
def step(name, prefix):
    out = nb.build_name(name, prefix=prefix)
    steps.append({"name": name, "prefix": prefix, "out": out})
step(None, "embed_text_")      # -> embed_text_0
step(None, "embed_text_")      # -> embed_text_1
step("explicit", "embed_text_")  # explicit names register as-is
step(None, "split_")           # independent per-prefix counter
# an explicit name equal to the NEXT generated one forces a skip
step("split_1", "whatever_")
step(None, "split_")           # 1 is taken -> 2? (record actual)
step(None, "embed_text_")      # counter continues -> 2
fixture["name_builder"] = steps

# ---- 3. get_flow_full_name ------------------------------------------

full_names = []
for ns in ["", "myns"]:
    setting.set_app_namespace(ns)
    full_names.append({"ns": ns, "name": "demo",
                       "out": flow.get_flow_full_name("demo")})
setting.set_app_namespace("")
fixture["full_flow_name"] = full_names

# ---- 4. open_flow duplicate + flow_def name default -----------------

def fl_def(builder, scope): pass
f1 = flow.open_flow("wave9_flow", fl_def)
try:
    flow.open_flow("wave9_flow", fl_def)
    dup = "no error"
except KeyError as e:
    dup = e.args[0]
fixture["open_flow_duplicate"] = dup

@flow.flow_def()
def wave9_decorated(builder, scope): pass
fixture["flow_def_default_name"] = "wave9_decorated" in flow.flow_names()

# ---- 5. DSL type-guard error vocabulary (pre-engine arms) -----------

errors = {}

# FlowBuilder.transform with zero args errors BEFORE any state use
fb0 = flow.FlowBuilder.__new__(flow.FlowBuilder)
fb0._state = None
try:
    fb0.transform(op.FunctionSpec.__new__(op.FunctionSpec))
except ValueError as e:
    errors["transform_no_inputs"] = str(e)

try:
    flow._transform_helper(None, object(), [])
except ValueError as e:
    errors["transform_not_function"] = str(e)

fb = flow.FlowBuilder.__new__(flow.FlowBuilder)
try:
    fb.add_source(object())
except ValueError as e:
    errors["add_source_not_source"] = str(e)

state = flow._DataSliceState.__new__(flow._DataSliceState)
state._lazy_lock = None
state._data_slice = None
try:
    state.engine_data_slice
except ValueError as e:
    errors["slice_not_initialized"] = str(e)

import threading
state2 = flow._DataSliceState.__new__(flow._DataSliceState)
state2._lazy_lock = threading.Lock()
state2._data_slice_creator = None
try:
    state2.engine_data_slice
except ValueError as e:
    errors["creator_not_initialized"] = str(e)

state3 = flow._DataSliceState.__new__(flow._DataSliceState)
state3._lazy_lock = None
state3._data_slice = _EngineDataSlice()
try:
    state3.attach_to_scope(None, "f")
except ValueError as e:
    errors["already_attached"] = str(e)

# __getitem__ miss -> KeyError(field_name)
ds2 = flow.DataSlice.__new__(flow.DataSlice)
s4 = flow._DataSliceState.__new__(flow._DataSliceState)
s4._lazy_lock = None
s4._data_slice = _EngineDataSlice()
ds2._state = s4
try:
    ds2["missing_field"]
except KeyError as e:
    errors["getitem_miss"] = e.args[0]

fixture["guards"] = errors

# ---- 6. GeneratedField UUID validation ------------------------------

dc = flow.DataCollector.__new__(flow.DataCollector)
uuid_errors = {}
try:
    dc.collect(a=flow.GeneratedField.UUID, b=flow.GeneratedField.UUID)
except ValueError as e:
    uuid_errors["double_uuid"] = str(e)
fixture["generated_field"] = uuid_errors
fixture["generated_field_values"] = [
    (g.name, g.value) for g in flow.GeneratedField]

# ---- 7. transform_flow decorator parameter validation ---------------

tf_errors = {}
try:
    @flow.transform_flow()
    def bad_varargs(*texts): return texts[0]
except ValueError as e:
    tf_errors["var_positional"] = str(e)

try:
    @flow.transform_flow()
    def bad_unannotated(text): return text
except ValueError as e:
    # the message embeds repr(fn) with a memory address — scrub it
    tf_errors["no_annotation"] = re.sub(r" at 0x[0-9a-f]+", " at 0xADDR",
                                        str(e))
fixture["transform_flow"] = tf_errors

with open(os.path.join(OUT, "py_flow_faces.json"), "w") as f:
    json.dump(fixture, f, indent=1, sort_keys=True, ensure_ascii=False)
print("wrote py_flow_faces.json:",
      json.dumps(fixture, indent=1, sort_keys=True)[:400])
