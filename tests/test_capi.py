"""Exportable C ABI (VERDICT r4 missing #5): build libhpddm_tpu_c and run
the pure-C demo — option round-trip, CSR create/SpMM, local
Numfact/Solve, and a two-subdomain Schwarz solve with residual check
(the interface/HPDDM.h:66-123 analogue)."""

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_capi_demo(tmp_path):
    native = os.path.join(ROOT, "hpddm_tpu", "native")
    r = subprocess.run(["make", "-C", native, "capi"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    exe = str(tmp_path / "capi_demo")
    r = subprocess.run(
        ["gcc", "-O2", "-o", exe,
         os.path.join(ROOT, "examples", "capi_demo.c"),
         "-L" + native, "-lhpddm_tpu_c", "-lm",
         "-Wl,-rpath," + native],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    env.pop("HPDDM_TPU_FORCE_PEXCH", None)
    r = subprocess.run([exe], capture_output=True, text=True, env=env,
                       timeout=300)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "PASS" in r.stdout
