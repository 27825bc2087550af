#!/usr/bin/env python3
"""Generate reference-executed parity fixtures — wave 7: the
python-side Settings/ServerSettings environment ladder
(python/cocoindex/setting.py), run FOR REAL over controlled
os.environ states.

setting.py imports only stdlib + .validation (pure), so the real
module runs unmodified; each case snapshots the environment it ran
under. Records the database fork, the absent-vs-present kwarg
semantics (dataclass defaults apply only when the env var is ABSENT),
the exact `{env} is not set` / `failed to parse environment variable
{env}: {value}` error vocabulary, and Python int()'s whitespace/
underscore acceptance.

Output: src/test/resources/refparity/py_settings.json, replayed by
PySettingsSpec against dataflow/PySettings.scala.
"""
import dataclasses
import importlib.util
import json
import os
import sys
import types

REF = "/root/reference/python/cocoindex"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "src", "test", "resources", "refparity")
os.makedirs(OUT, exist_ok=True)

pkg = types.ModuleType("cocoindex")
pkg.__path__ = [REF]
sys.modules["cocoindex"] = pkg
for name in ("validation", "setting"):
    spec = importlib.util.spec_from_file_location(
        f"cocoindex.{name}", os.path.join(REF, f"{name}.py"))
    m = importlib.util.module_from_spec(spec)
    sys.modules[f"cocoindex.{name}"] = m
    spec.loader.exec_module(m)
setting = sys.modules["cocoindex.setting"]

COCO_VARS = [
    "COCOINDEX_DATABASE_URL", "COCOINDEX_DATABASE_USER",
    "COCOINDEX_DATABASE_PASSWORD", "COCOINDEX_DATABASE_MAX_CONNECTIONS",
    "COCOINDEX_DATABASE_MIN_CONNECTIONS",
    "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS",
    "COCOINDEX_SOURCE_MAX_INFLIGHT_BYTES", "COCOINDEX_APP_NAMESPACE",
    "COCOINDEX_SERVER_ADDRESS", "COCOINDEX_SERVER_CORS_ORIGINS",
]

def with_env(env):
    for v in COCO_VARS:
        os.environ.pop(v, None)
    os.environ.update(env)

def settings_case(name, env):
    with_env(env)
    rec = {"name": name, "env": env}
    try:
        s = setting.Settings.from_env()
        rec["settings"] = {
            "database": dataclasses.asdict(s.database) if s.database else None,
            "app_namespace": s.app_namespace,
            "global_execution_options":
                dataclasses.asdict(s.global_execution_options),
        }
    except ValueError as e:
        rec["error"] = str(e)
    return rec

def server_case(name, env):
    with_env(env)
    rec = {"name": name, "env": env}
    try:
        s = setting.ServerSettings.from_env()
        rec["server"] = {"address": s.address,
                         "cors_origins": s.cors_origins}
    except ValueError as e:
        rec["error"] = str(e)
    return rec

fixture = {"settings": [
    settings_case("all_defaults", {}),
    settings_case("db_url_only", {"COCOINDEX_DATABASE_URL": "postgres://x"}),
    settings_case("db_full", {
        "COCOINDEX_DATABASE_URL": "postgres://x",
        "COCOINDEX_DATABASE_USER": "u",
        "COCOINDEX_DATABASE_PASSWORD": "p",
        "COCOINDEX_DATABASE_MAX_CONNECTIONS": "99",
        "COCOINDEX_DATABASE_MIN_CONNECTIONS": "2"}),
    # user/pass without url: the database fork is OFF — all ignored
    settings_case("db_user_without_url",
                  {"COCOINDEX_DATABASE_USER": "u"}),
    settings_case("inflight_overrides", {
        "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS": "5",
        "COCOINDEX_SOURCE_MAX_INFLIGHT_BYTES": "1000000"}),
    settings_case("namespace", {"COCOINDEX_APP_NAMESPACE": "myns"}),
    # Python int() accepts surrounding whitespace and inner
    # underscores; rejects floats/hex-ish text
    settings_case("int_whitespace", {
        "COCOINDEX_DATABASE_URL": "postgres://x",
        "COCOINDEX_DATABASE_MAX_CONNECTIONS": " 64 "}),
    settings_case("int_underscore", {
        "COCOINDEX_DATABASE_URL": "postgres://x",
        "COCOINDEX_DATABASE_MAX_CONNECTIONS": "6_4"}),
    settings_case("int_negative", {
        "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS": "-3"}),
    settings_case("int_bad_float", {
        "COCOINDEX_DATABASE_URL": "postgres://x",
        "COCOINDEX_DATABASE_MAX_CONNECTIONS": "64.0"}),
    settings_case("int_bad_text", {
        "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS": "lots"}),
    settings_case("int_bad_empty", {
        "COCOINDEX_SOURCE_MAX_INFLIGHT_BYTES": ""}),
    settings_case("int_plus_sign", {
        "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS": "+7"}),
    # Python int() accepts any Unicode Nd digit and strips unicode
    # whitespace (incl. NBSP)
    settings_case("int_arabic_digits", {
        "COCOINDEX_DATABASE_URL": "postgres://x",
        "COCOINDEX_DATABASE_MAX_CONNECTIONS": "\u0666\u0664"}),
    settings_case("int_nbsp_padded", {
        "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS": "\u00a064\u00a0"}),
    settings_case("int_devanagari_underscore", {
        "COCOINDEX_SOURCE_MAX_INFLIGHT_ROWS": "\u096d_\u096d"}),
], "server": [
    server_case("defaults", {}),
    server_case("address", {"COCOINDEX_SERVER_ADDRESS": "0.0.0.0:1"}),
    server_case("cors", {"COCOINDEX_SERVER_CORS_ORIGINS":
                         " https://a.com , ,https://b.com,"}),
    server_case("cors_empty", {"COCOINDEX_SERVER_CORS_ORIGINS": ""}),
]}

with open(os.path.join(OUT, "py_settings.json"), "w") as f:
    json.dump(fixture, f, indent=1, sort_keys=True, ensure_ascii=False)
print("wrote py_settings.json:",
      {k: len(v) for k, v in fixture.items()})
