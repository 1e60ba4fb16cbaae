"""Automated end-to-end CLI gates for the hard adaptive workloads.

The options92-class eigenmode run (examples/eigenmode1d) is the
workload that exposed the two hardest solver bugs of round 1: the
block preconditioner's rho-row diffusivity bound and the GMRES
fallback escalation.  This gate drives it (shortened to tmax=2e4)
through the REAL CLI and asserts the physical signature, so a
regression in either path turns red in CI instead of waiting for a
manual run.  Reference workload: /root/reference/options92:1-18.
"""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(argv, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["KSFD_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "ksfdsolver.py")] + argv,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )


def _count_peaks(rho):
    above = rho > rho.mean()
    edges = np.diff(np.r_[above, above[0]].astype(int))
    return int((edges == 1).sum())


@pytest.mark.slow
def test_options92_adaptive_gate(tmp_path):
    """Shortened eigenmode1d: exponential growth -> saturation -> h ramp.

    Expected signature (verified against the full options92 run):
    - completes within maxsteps with h accelerating to dt_max=1e4,
    - final pattern has exactly 4 peaks (k0=4 eigenmode),
    - rho spans [~320, ~25300] (capped by the tophat potential).
    """
    optfile = str(tmp_path / "options")
    src = open(os.path.join(REPO, "examples", "eigenmode1d")).read()
    src = "\n".join(
        ln for ln in src.splitlines() if not ln.startswith("tmax=")
    ) + "\ntmax=20000\n"
    with open(optfile, "w") as f:
        f.write(src)
    save = str(tmp_path / "gate")
    res = _run_cli(["@" + optfile, "--save=" + save])
    assert res.returncode == 0, res.stdout + res.stderr
    assert "solve failures" in res.stdout

    with h5py.File(save + "s1r0.h5", "r") as f:
        ks = sorted(int(k[4:]) for k in f if k.startswith("data"))
        # the run must actually adapt: O(200) steps, not thousands
        assert 100 <= ks[-1] <= 500, ks[-1]
        last = f["data%d" % ks[-1]]
        tfinal = float(last.attrs["t"])
        assert tfinal >= 20000.0
        u = np.asarray(last)
        rho = u[0]
        # step size accelerated to dt_max: the final step crossed tmax
        # by a margin only h ~ 1e4 can produce
        prev = f["data%d" % ks[-2]]
        assert tfinal - float(prev.attrs["t"]) > 2000.0
        assert _count_peaks(rho) == 4
        assert 200.0 < rho.min() < 600.0
        assert 20000.0 < rho.max() < 28000.0
        # ligand fields saturate near s/gamma * rho scale, all positive
        assert float(u[1:].min()) > 0.0

@pytest.mark.slow
def test_options92_arkimex_gate(tmp_path):
    """The same shortened eigenmode1d driven with '-ts_type arkimex'
    at the reference block's '-snes_type ksponly' (1 modified-Newton
    iteration per stage).  The DIRK path is Newton-truncation-limited
    on the stiff saturated state, so the GMRES fallback must escalate
    snes_iters for the run to reach large h: without that escalation
    this workload takes ~980 steps with ~330 rejections and h stalls
    near 700 (measured); with it, ~150 steps and h in the thousands.
    """
    optfile = str(tmp_path / "options")
    src = open(os.path.join(REPO, "examples", "eigenmode1d")).read()
    lines = []
    for ln in src.splitlines():
        if ln.startswith("tmax="):
            ln = "tmax=20000"
        elif ln == "-ts_type rosw":
            ln = "-ts_type arkimex"
        lines.append(ln)
    with open(optfile, "w") as f:
        f.write("\n".join(lines) + "\n")
    save = str(tmp_path / "gate")
    res = _run_cli(["@" + optfile, "--save=" + save])
    assert res.returncode == 0, res.stdout + res.stderr
    nfail = int(res.stdout.split("solve failures =")[-1].split()[0])
    assert nfail < 150, nfail

    with h5py.File(save + "s1r0.h5", "r") as f:
        ks = sorted(int(k[4:]) for k in f if k.startswith("data"))
        # far fewer steps than the un-escalated path's ~980
        assert ks[-1] <= 400, ks[-1]
        last = f["data%d" % ks[-1]]
        assert float(last.attrs["t"]) >= 20000.0
        rho = np.asarray(last)[0]
        # same physical end state as the rosw gate
        assert _count_peaks(rho) == 4
        assert 20000.0 < rho.max() < 28000.0
