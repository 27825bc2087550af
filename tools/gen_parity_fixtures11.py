#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 11: the legacy
ingestion API endpoints (archive/legacy_ingestion/ingestion.py), run
FOR REAL with import stand-ins: fastapi (HTTPException mirrors
Starlette's `{status}: {detail}` __str__ — load-bearing for the
recorded 400-collapses-to-500 quirk), celery AsyncResult
(configurable state/info/result), and the task module's .delay.

Records the task-status ladder across every Celery state (incl.
FAILURE's str(None) render), the cancel response, the sources
listing, and trigger_notion_ingestion's validation arms — including
the reference's blanket-except quirk where its own 400 HTTPException
is re-raised as a 500 wrapping the Starlette string.

Output: src/test/resources/refparity/legacy_api.json, replayed by
LegacyIngestionParitySpec.
"""
import asyncio
import importlib.util
import json
import os
import sys
import types

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
os.makedirs(OUT, exist_ok=True)

# ---- fastapi stand-in (HTTPException mirrors Starlette) -------------

fastapi = types.ModuleType("fastapi")
class HTTPException(Exception):
    def __init__(self, status_code, detail=None):
        self.status_code = status_code
        self.detail = detail
        super().__init__(detail)
    def __str__(self):
        return f"{self.status_code}: {self.detail}"
class APIRouter:
    def __init__(self, *a, **k): pass
    def _deco(self, *a, **k):
        return lambda fn: fn
    get = post = delete = put = _deco
class BackgroundTasks: pass
def Depends(x=None): return None
fastapi.HTTPException = HTTPException
fastapi.APIRouter = APIRouter
fastapi.BackgroundTasks = BackgroundTasks
fastapi.Depends = Depends
sys.modules["fastapi"] = fastapi

# ---- celery stand-in ------------------------------------------------

celery = types.ModuleType("celery")
celery_result = types.ModuleType("celery.result")
ASYNC_STATE = {"state": "PENDING", "info": None, "result": None}
class AsyncResult:
    def __init__(self, task_id, app=None):
        self.task_id = task_id
        self.state = ASYNC_STATE["state"]
        self.info = ASYNC_STATE["info"]
        self.result = ASYNC_STATE["result"]
    def revoke(self, terminate=False): pass
celery_result.AsyncResult = AsyncResult
sys.modules["celery"] = celery
sys.modules["celery.result"] = celery_result

# ---- app config / task stand-ins ------------------------------------

def mod(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m
app = mod("app"); app.__path__ = []
cfg = mod("app.config")
class _Settings:
    notion_api_key = "envtok"
    notion_database_ids = ["db_env"]
    google_drive_credentials_path = None
    google_drive_folder_ids = []
cfg.settings = _Settings()
mod("app.tasks")
tasks = mod("app.tasks.ingestion_tasks")
DELAYED = []
class _Task:
    def delay(self, **kw):
        DELAYED.append(kw)
        class _R: id = "task-123"
        return _R()
tasks.celery_app = object()
tasks.ingest_notion_pages = _Task()

spec = importlib.util.spec_from_file_location(
    "legacy_ingestion_api",
    os.path.join(REF, "archive/legacy_ingestion/ingestion.py"))
ing = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ing)

fixture = {}

# ---- 1. the task-status ladder --------------------------------------

status_cases = []
for name, state, info, result in [
    ("pending", "PENDING", None, None),
    ("processing", "PROCESSING", {"status": "Connecting to Notion...",
                                  "started_at": "t0"}, None),
    ("success", "SUCCESS", None, {"status": "completed",
                                  "total_pages": 3}),
    ("failure", "FAILURE", "boom", None),
    ("failure_none_info", "FAILURE", None, None),
    ("revoked", "REVOKED", None, None),
]:
    ASYNC_STATE.update({"state": state, "info": info, "result": result})
    r = asyncio.run(ing.get_task_status("tid1"))
    status_cases.append({"name": name, "state": r.state,
                         "task_id": r.task_id, "info": r.info,
                         "current": r.current, "total": r.total})
fixture["task_status"] = status_cases

# ---- 2. cancel ------------------------------------------------------

fixture["cancel"] = asyncio.run(ing.cancel_task("tid9"))

# ---- 3. sources listing ---------------------------------------------

src_cases = []
for name, notion_key, gdrive_path in [
    ("both_partial", "envtok", None),
    ("none", None, None),
    ("gdrive_only", None, "/creds.json"),
]:
    _Settings.notion_api_key = notion_key
    _Settings.google_drive_credentials_path = gdrive_path
    src_cases.append({"name": name,
                      "out": asyncio.run(ing.list_configured_sources())})
fixture["sources"] = src_cases

# ---- 4. trigger validation arms -------------------------------------

trigger_cases = []
def trig(name, req_kwargs, notion_key="envtok", env_dbs=None):
    _Settings.notion_api_key = notion_key
    _Settings.notion_database_ids = (
        env_dbs if env_dbs is not None else ["db_env"])
    DELAYED.clear()
    req = ing.NotionIngestionRequest(**req_kwargs)
    try:
        r = asyncio.run(ing.trigger_notion_ingestion(req))
        trigger_cases.append({"name": name,
            "response": {"task_id": r.task_id, "status": r.status,
                         "message": r.message, "check_url": r.check_url},
            "delayed": list(DELAYED)})
    except HTTPException as e:
        trigger_cases.append({"name": name,
            "error_status": e.status_code, "error_detail": e.detail,
            "delayed": list(DELAYED)})

trig("ok_with_request_dbs", {"database_ids": ["db1"], "token": "tok"})
trig("ok_env_defaults", {})
# the blanket-except quirk: the 400 re-raises as 500 wrapping
# Starlette's "{status}: {detail}" string
trig("no_token_collapses_to_500", {}, notion_key=None)
trig("no_ids_collapses_to_500", {}, env_dbs=[])
# `request.token or settings.notion_api_key` truthiness: an
# empty-string request token falls back to the env key
trig("empty_token_falls_back", {"token": "", "database_ids": ["db1"]})
trig("empty_token_no_env_500", {"token": ""}, notion_key=None)
fixture["trigger"] = trigger_cases

with open(os.path.join(OUT, "legacy_api.json"), "w") as f:
    json.dump(fixture, f, indent=1, sort_keys=True, ensure_ascii=False)
print("wrote legacy_api.json:",
      {k: (len(v) if isinstance(v, list) else "obj")
       for k, v in fixture.items()})
