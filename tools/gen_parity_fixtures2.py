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

print("wave-2 fixtures written to", OUT)
