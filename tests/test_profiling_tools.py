"""Smoke tests for tools/profiling (VERDICT r4 weak #3 / task 5c).

Round 4 shipped ``multichip_evidence.py`` with a launch crash (an attribute
rename never re-run after the last edit). Gate: every profiling tool must at
minimum byte-compile, and the evidence tool must get through its full
construction + trace + lowering path (where that crash lived) in a scrubbed
CPU subprocess — ``EV_SMOKE=1`` stops it just before the expensive compile.
"""

import os
import pathlib
import py_compile
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
TOOLS = sorted((REPO / "tools" / "profiling").glob("*.py"))


@pytest.mark.parametrize("tool", TOOLS, ids=lambda p: p.name)
def test_profiling_tool_compiles(tool):
    py_compile.compile(str(tool), doraise=True)


def test_multichip_evidence_smoke():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env.update(
        LYCORIS_FORCE_CPU="1",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        JAX_PLATFORMS="cpu",
        EV_SMOKE="1",
        EV_SDXL="0",
        EV_BATCH="2",
    )
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "profiling" / "multichip_evidence.py")],
        env=env, cwd=str(REPO), capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, f"stderr tail: {res.stderr[-2000:]}"
    assert '"smoke": true' in res.stdout, res.stdout
