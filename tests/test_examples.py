"""Run every example in CI smoke mode (reference parity: the reference runs
its python examples in CI — python/new_examples in the upstream workflow).

Each example honors NT_SMOKE=1: tiny loops, headless (no GUI serve). They
execute in-process via runpy so they share the suite's CPU/x64 jax config
and the persistent compile cache.
"""

import os
import runpy

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

# Examples that read reference data — skipped when the tree is absent.
NEEDS_DATA = {
    "05_marker_fitting.py":
        "/root/reference/data/osim/LaiArnoldSubject6/LaiArnold2017_refined.osim",
    "08_biomech_real_data.py": "/root/reference/data/b3d/results.b3d",
}


@pytest.mark.parametrize(
    "name", sorted(f for f in os.listdir(EXAMPLES) if f.endswith(".py")))
def test_example_smoke(name, monkeypatch, capsys):
    data = NEEDS_DATA.get(name)
    if data and not os.path.exists(data):
        pytest.skip(f"reference data absent: {data}")
    monkeypatch.setenv("NT_SMOKE", "1")
    monkeypatch.chdir(os.path.join(EXAMPLES, ".."))
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{name} produced no output"
