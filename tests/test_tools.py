"""Smoke tests for the tools/ measurement scripts: every tool must import
and its main() must run end-to-end on a tiny system (MOLLYTPU_BENCH_TINY=1,
a 64-water PME+constraints box; see bench._tiny_waterbox_pdb). Guards the
class of failure where a tool references an API that was since removed —
a checked-in measurement tool that crashes is worse than no tool."""

import importlib
import os
import sys

import pytest

TOOLS_DIR = os.path.join(os.path.dirname(__file__), "..", "tools")
REPO_DIR = os.path.join(os.path.dirname(__file__), "..")

# tools whose main() runs a measurement on bench.build(); sweep.py drives
# subprocess bench runs (import-only below) and qtime.py is a library.
# The two heaviest (many interpret-mode kernel variants) sit in -m slow.
RUNNABLE = [pytest.param("step_decompose", marks=pytest.mark.slow),
            "pme_decompose",
            pytest.param("pair_roofline", marks=pytest.mark.slow),
            "constraint_decompose", "rebuild_decompose"]


def _import_tool(name):
    for p in (TOOLS_DIR, REPO_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)
    return importlib.import_module(name)


def test_all_tools_import():
    for f in sorted(os.listdir(TOOLS_DIR)):
        if f.endswith(".py"):
            _import_tool(f[:-3])


@pytest.mark.parametrize("name", RUNNABLE)
def test_tool_runs_tiny(name, monkeypatch, capsys):
    monkeypatch.setenv("MOLLYTPU_BENCH_TINY", "1")
    mod = _import_tool(name)
    from qtime import qtime as real_qtime

    def fast_qtime(fn, *args, **kw):
        kw.update(reps=1, warmup=1)
        return real_qtime(fn, *args, **kw)

    if hasattr(mod, "qtime"):
        monkeypatch.setattr(mod, "qtime", fast_qtime)
    mod.main()
    out = capsys.readouterr().out
    assert "ms" in out, out
