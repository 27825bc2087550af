#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 5: the
`cocoindex` CLI (python/cocoindex/cli.py), run FOR REAL through
click.testing.CliRunner with real click 8.x.

The engine-backed modules cli.py imports (flow/lib/setting/setup/
runtime) are replaced with deterministic stand-ins whose behavior is
part of each recorded case (flow rosters, persisted-setup names, the
setup/drop bundle's describe()/apply()); rich/watchfiles/dotenv are
import-time stubs (the `show`/`server` commands that need them deeply
are not recorded). Everything actually recorded — specifier parsing,
identifier acceptance, the ls/setup/drop/update/evaluate transcripts,
prompts, exit codes — is the reference's own code running under real
click/CPython.

Output: src/test/resources/refparity/cli.json, replayed by
CliParitySpec against dataflow/Cli.scala.

Usage: python3 tools/gen_parity_fixtures5.py
Deterministic: fixed inputs, frozen clock, no randomness.
"""
import importlib.util
import json
import os
import sys
import types
import asyncio
import dataclasses

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
os.makedirs(OUT, exist_ok=True)

# ---- third-party import stubs (not under test) ----------------------

_watch = types.ModuleType("watchfiles")
_watch.run_process = lambda *a, **k: None
_watch.PythonFilter = lambda *a, **k: None
sys.modules["watchfiles"] = _watch

_dotenv = types.ModuleType("dotenv")
_dotenv.find_dotenv = lambda usecwd=True: ""
_dotenv.load_dotenv = lambda dotenv_path=None: False
sys.modules["dotenv"] = _dotenv

_rich = types.ModuleType("rich")
_rich_console = types.ModuleType("rich.console")
class _Console:
    def __init__(self, *a, **k): pass
    def print(self, *a, **k): pass
    def clear(self): pass
_rich_console.Console = _Console
_rich_panel = types.ModuleType("rich.panel")
class _Panel:
    @staticmethod
    def fit(*a, **k): return None
_rich_panel.Panel = _Panel
_rich_table = types.ModuleType("rich.table")
class _Table:
    def __init__(self, *a, **k): pass
    def add_column(self, *a, **k): pass
    def add_row(self, *a, **k): pass
_rich_table.Table = _Table
sys.modules["rich"] = _rich
sys.modules["rich.console"] = _rich_console
sys.modules["rich.panel"] = _rich_panel
sys.modules["rich.table"] = _rich_table

# ---- the deterministic cocoindex stand-in package -------------------

pkg = types.ModuleType("cocoindex")
pkg.__path__ = []
sys.modules["cocoindex"] = pkg

settingmod = types.ModuleType("cocoindex.setting")
NS = {"value": ""}
def get_app_namespace(*, trailing_delimiter=None):
    ns = NS["value"]
    if ns == "" or trailing_delimiter is None:
        return ns
    return f"{ns}{trailing_delimiter}"
class _Settings:
    @classmethod
    def from_env(cls): return cls()
settingmod.get_app_namespace = get_app_namespace
settingmod.Settings = _Settings
sys.modules["cocoindex.setting"] = settingmod

libmod = types.ModuleType("cocoindex.lib")
libmod.init = lambda settings: None
libmod.stop = lambda: None
libmod.start_server = lambda s: None
sys.modules["cocoindex.lib"] = libmod

flowmod = types.ModuleType("cocoindex.flow")
FLOWS = {}
EVAL_CALLS = []
class FlowStub:
    def __init__(self, name, full_name):
        self.name = name
        self.full_name = full_name
    def evaluate_and_dump(self, options):
        EVAL_CALLS.append({"output_dir": options.output_dir,
                           "use_cache": options.use_cache})
def flow_names(): return list(FLOWS)
def flows(): return dict(FLOWS)
def flow_by_name(name): return FLOWS[name]
@dataclasses.dataclass
class FlowLiveUpdaterOptions:
    live_mode: bool = True
    print_stats: bool = False
@dataclasses.dataclass
class EvaluateAndDumpOptions:
    output_dir: str
    use_cache: bool = True
async def update_all_flows_async(options): pass
class FlowLiveUpdater:
    def __init__(self, fl, options): self._options = options
    def __enter__(self): return self
    def __exit__(self, *a): pass
    def wait(self): pass
BUNDLE = {"desc": "", "up_to_date": True}
class _Bundle:
    def describe(self): return (BUNDLE["desc"], BUNDLE["up_to_date"])
    def apply(self, report_to_stdout=False):
        print(f"[APPLY report_to_stdout={report_to_stdout}]")
def make_setup_bundle(it): list(it); return _Bundle()
def make_drop_bundle(fls): list(fls); return _Bundle()
for _n in ("flow_names", "flows", "flow_by_name", "FlowLiveUpdaterOptions",
           "EvaluateAndDumpOptions", "update_all_flows_async",
           "FlowLiveUpdater", "make_setup_bundle", "make_drop_bundle"):
    setattr(flowmod, _n, locals()[_n])
flowmod.Flow = FlowStub
sys.modules["cocoindex.flow"] = flowmod

setupmod = types.ModuleType("cocoindex.setup")
PERSISTED = {"value": []}
setupmod.flow_names_with_setup = lambda: list(PERSISTED["value"])
sys.modules["cocoindex.setup"] = setupmod

runtimemod = types.ModuleType("cocoindex.runtime")
class _Ctx:
    def run(self, coro): return asyncio.run(coro)
    @property
    def event_loop(self): raise RuntimeError("not used")
runtimemod.execution_context = _Ctx()
sys.modules["cocoindex.runtime"] = runtimemod

pkg.flow = flowmod
pkg.lib = libmod
pkg.setting = settingmod

# ---- load the REAL cli.py as cocoindex.cli --------------------------

spec = importlib.util.spec_from_file_location(
    "cocoindex.cli", os.path.join(REF, "python/cocoindex/cli.py"))
cli_mod = importlib.util.module_from_spec(spec)
cli_mod.__package__ = "cocoindex"
sys.modules["cocoindex.cli"] = cli_mod
spec.loader.exec_module(cli_mod)

import click
from click.testing import CliRunner

# a real (empty) user app file for _load_user_app
APP = "/tmp/cli_parity_app.py"
with open(APP, "w") as f:
    f.write("# parity stand-in user app\n")

# freeze the clock for `evaluate`'s timestamp default
class _FrozenDT:
    class datetime:
        @staticmethod
        def now():
            class _T:
                @staticmethod
                def strftime(fmt): return "250814_120000"
            return _T()
cli_mod.datetime = _FrozenDT

fixture = {}

# ---- 1. specifier parsing (the BadParameter vocabulary) -------------

parse_cases = []
for s in ["app.py", "app.py:MyFlow", "app.py:", "a:b:c", ":Flow",
          "app.py:9bad", "a:_f1", "a:f-1", "a:f 1", "a:f.1", "m.mod:F",
          "a:caf\u00e9", "a:\u6587\u5b57", "a:a\u00adb", "a:a\u200bb",
          "a:a\u0001b", "a:\u00ada", "a:_", "a:A9_z", ":", "x:",
          "dir/app.py:Flow_2"]:
    try:
        app_ref, flow_ref = cli_mod._parse_app_flow_specifier(s)
        parse_cases.append({"input": s, "app_ref": app_ref,
                            "flow_ref": flow_ref})
    except click.BadParameter as e:
        parse_cases.append({"input": s, "error": e.message})
fixture["parse_specifier"] = parse_cases

# ---- 2. CPython str.isidentifier battery ----------------------------

ident_cases = []
for s in ["f", "_f1", "9bad", "f-1", "f 1", "f.1", "", "_",
          "caf\u00e9", "\u6587\u5b57", "a\u00adb", "a\u200bb",
          "a\u0001b", "\u00ada", "a\u0300b", "\u0300a", "A9_z",
          "\u2460", "x\u2460", "a\u00b7b", "\u1885x", "e\u0301",
          # XID exclusions Java's classes admit
          "\u309b", "a\u309b", "\u037a", "a\u037a", "\u0e33",
          "x\u0e33", "\uff9e", "x\uff9e", "\ufdfa", "x\ufdfa",
          # Unicode-14 additions JDK 17's tables miss
          "\u0870", "x\u0870", "\u2c2f", "x\u1ac1",
          # Other_ID survivors + non-BMP letters
          "\u2118", "\u212ex", "\U00010400x"]:
    ident_cases.append({"s": s, "ok": s.isidentifier()})
fixture["isidentifier"] = ident_cases

# ---- helpers for command transcripts --------------------------------

runner = CliRunner()

def invoke(args, *, flows=(), persisted=(), ns="", bundle=None,
           cli_input=None):
    FLOWS.clear()
    for n in flows:
        full = (ns + "." + n) if ns else n
        FLOWS[n] = FlowStub(n, full)
    PERSISTED["value"] = list(persisted)
    NS["value"] = ns
    if bundle:
        BUNDLE.update(bundle)
    EVAL_CALLS.clear()
    res = runner.invoke(cli_mod.cli, args, input=cli_input,
                        catch_exceptions=False)
    try:
        stderr = res.stderr
    except Exception:
        stderr = None
    return {"args": args, "flows": list(flows),
            "persisted": list(persisted), "ns": ns,
            "input": cli_input, "exit_code": res.exit_code,
            "bundle_desc": BUNDLE["desc"],
            "bundle_up_to_date": BUNDLE["up_to_date"],
            "stdout": res.stdout, "stderr": stderr}

# ---- 3. ls ----------------------------------------------------------

ls_cases = [
    invoke(["ls", APP], flows=["b_flow", "a_flow"],
           persisted=["a_flow", "zz"]),
    invoke(["ls", APP], flows=["a"], persisted=["a", "ghost"]),
    invoke(["ls", APP], flows=[], persisted=["x"]),
    invoke(["ls"], persisted=["z", "a"]),
    invoke(["ls"], persisted=[]),
    invoke(["ls", APP + ":Ignored"], flows=["a"], persisted=["a"]),
]
fixture["ls"] = ls_cases

# ---- 4. setup -------------------------------------------------------

setup_cases = [
    invoke(["setup", APP], flows=["a"],
           bundle={"desc": "DESC up-to-date", "up_to_date": True}),
    invoke(["setup", APP], flows=["a"], cli_input="y\n",
           bundle={"desc": "DESC changes", "up_to_date": False}),
    invoke(["setup", APP], flows=["a"], cli_input="n\n",
           bundle={"desc": "DESC changes", "up_to_date": False}),
    invoke(["setup", "-f", APP], flows=["a"],
           bundle={"desc": "DESC changes", "up_to_date": False}),
]
fixture["setup"] = setup_cases

# ---- 5. drop --------------------------------------------------------

drop_cases = [
    invoke(["drop", APP, "a", "ghost"], flows=["a", "b"], ns="ns",
           cli_input="n\n",
           bundle={"desc": "DROP DESC", "up_to_date": False}),
    invoke(["drop", "-f", APP], flows=["a", "b"], ns="ns",
           bundle={"desc": "DROP DESC", "up_to_date": False}),
    invoke(["drop", APP, "ghost1", "ghost2"], flows=["a"], ns="ns",
           bundle={"desc": "DROP DESC", "up_to_date": False}),
    invoke(["drop", APP], flows=["a"], ns="ns",
           bundle={"desc": "DROP DESC", "up_to_date": True}),
    invoke(["drop"]),
    invoke(["drop", APP, "a"], flows=["a", "b"], ns="ns",
           cli_input="y\n",
           bundle={"desc": "DROP DESC", "up_to_date": False}),
]
fixture["drop"] = drop_cases

# ---- 6. update ------------------------------------------------------

update_cases = [
    invoke(["update", APP], flows=["a"]),
    invoke(["update", "-L", APP], flows=["a"]),
    invoke(["update", APP + ":a"], flows=["a"]),
    invoke(["update", "-L", APP + ":a"], flows=["a"]),
    invoke(["update", "--setup", APP], flows=["a"],
           bundle={"desc": "DESC up-to-date", "up_to_date": True}),
    invoke(["update", "--setup", "-q", APP], flows=["a"],
           bundle={"desc": "DESC up-to-date", "up_to_date": True}),
    invoke(["update", "--setup", "-f", APP], flows=["a"],
           bundle={"desc": "DESC changes", "up_to_date": False}),
]
fixture["update"] = update_cases

# ---- 7. evaluate (default output dir, frozen clock) -----------------

eval_cases = []
for ns, flow_name, extra in [("", "demo", []), ("myns", "demo", []),
                             ("", "demo", ["-o", "/tmp/custom_out"]),
                             ("", "demo", ["--no-cache"])]:
    rec = invoke(["evaluate"] + extra + [APP + ":" + flow_name],
                 flows=[flow_name], ns=ns)
    rec["eval_calls"] = list(EVAL_CALLS)
    eval_cases.append(rec)
fixture["evaluate"] = eval_cases

with open(os.path.join(OUT, "cli.json"), "w") as f:
    json.dump(fixture, f, indent=1, sort_keys=True, ensure_ascii=False)
print("wrote cli.json:",
      {k: len(v) for k, v in fixture.items()})
