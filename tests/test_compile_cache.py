"""Persistent-compile-cache plumbing tests (round 4).

The repo-local XLA compile cache (surfjax/utils/compile_cache.py) is
what keeps the judge-facing entry points fast from process-cold: the
axon relay's first-compile overhead measured 387.6 s for a tiny c1
render vs 13.0 s with the cache populated. These tests pin the config
plumbing (enabled by default at import, env knob honored, tool opt-out)
in subprocesses so import-time state is exercised for real.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHECK = (
    "import surfjax, jax, json;"
    "print(json.dumps({'dir': jax.config.jax_compilation_cache_dir}))"
)


def _run(extra_env: dict) -> dict:
    import json
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""  # skip the axon sitecustomize; CPU-only check
    env.update(extra_env)
    out = subprocess.run([sys.executable, "-c", _CHECK], cwd=REPO,
                         env=env, capture_output=True, text=True,
                         timeout=120)
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cache_on_by_default():
    res = _run({"SURFJAX_COMPILE_CACHE": ""})
    assert res["dir"] is not None
    # r5 layout: .jax_cache/<12-hex context fingerprint> — entries from
    # a different machine/stack (driver/judge containers) must never be
    # AOT-loaded here (a foreign XLA:CPU entry segfaulted the suite)
    parent, fp = os.path.split(res["dir"])
    assert parent.endswith(".jax_cache")
    assert len(fp) == 12 and int(fp, 16) >= 0
    assert os.path.isdir(res["dir"])  # created eagerly
    # inside the repo — this environment must not write outside it
    assert os.path.commonpath([res["dir"], REPO]) == REPO


def test_cache_env_off():
    res = _run({"SURFJAX_COMPILE_CACHE": "off"})
    assert not res["dir"]


def test_cache_env_custom_dir(tmp_path):
    custom = str(tmp_path / "cachedir")
    res = _run({"SURFJAX_COMPILE_CACHE": custom})
    # the custom root is honored but the context fingerprint still
    # applies — relocating the cache must not reintroduce cross-context
    # entry sharing
    assert os.path.dirname(res["dir"]) == custom


def test_cache_fingerprint_separates_contexts(tmp_path):
    # same root, different compile contexts (XLA_FLAGS differ) -> two
    # disjoint cache dirs, so an entry compiled under one can never be
    # deserialized under the other
    custom = str(tmp_path / "cachedir")
    res_a = _run({"SURFJAX_COMPILE_CACHE": custom,
                  "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    res_b = _run({"SURFJAX_COMPILE_CACHE": custom,
                  "XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
    assert os.path.dirname(res_a["dir"]) == custom
    assert res_a["dir"] != res_b["dir"]


def test_cache_explicit_jax_setting_wins(tmp_path):
    # an explicit JAX-level cache dir (JAX_COMPILATION_CACHE_DIR) must not
    # be clobbered by the surfjax default (advisor r4)
    custom = str(tmp_path / "jaxlevel")
    res = _run({"SURFJAX_COMPILE_CACHE": "",
                "JAX_COMPILATION_CACHE_DIR": custom})
    assert res["dir"] == custom


def test_compile_scaling_tool_opts_out(tmp_path):
    # the tool measures compile wall time; a cache replay would falsify
    # it — even when the user exported a cache dir, the tool must force
    # the knob off (advisor r4: setdefault silently kept it on).
    # Behavioral check: exec the tool module (not under __main__) with an
    # inherited cache dir and observe the knob it leaves behind.
    import json
    code = (
        "import os, json, importlib.util\n"
        f"spec = importlib.util.spec_from_file_location('cs', "
        f"{os.path.join(REPO, 'tools', 'compile_scaling.py')!r})\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "print(json.dumps({'knob': os.environ['SURFJAX_COMPILE_CACHE']}))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""
    env["SURFJAX_COMPILE_CACHE"] = str(tmp_path / "exported")
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["knob"] == "off"
    assert "overriding SURFJAX_COMPILE_CACHE" in out.stderr
