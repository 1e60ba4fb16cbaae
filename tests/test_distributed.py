"""Multi-process execution + sharded slab checkpoint writing.

The reference capability being covered: 16-rank MPI runs writing one
HDF5 file per rank (/root/reference/README.txt:5-10,
KSFD/ksfdtimeseries.py:188-243), reassembled by tsmerge.

Here: a real 2-process jax.distributed run (Gloo over localhost, 2
virtual CPU devices per process) drives the full CLI; each process
writes its slab into '<save>s2r<rank>.h5' with a '/ranges' dataset;
tsmerge rebuilds the global series; the result must be bit-exact
against a single-process run on the same total device count (same
collective reduction order).
"""

import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPTIONS = """\
dt=1e-8
tmax=100
maxsteps=3
width=1
nelements=32
dim=1
degree=3
atol=0.01
rtol=1e-6
rhomax=28000
cushion=2000
s2=2.78e-4
Nworms=0
'rho0=9000 + 100*sin(2*pi*x)'
srho0=0
ngroups=1
nligands_1=1
alpha_1=1500
beta_1=5.56e-4
s_1_1=0.01
gamma_1_1=0.01
D_1_1=1e-6
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_solver(optfile, save, extra_env, timeout=240):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(KSFD_PLATFORM="cpu", **extra_env)
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "ksfdsolver.py"),
         "@" + optfile, "--save=" + save],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.slow
def test_two_process_slab_write_and_merge(tmp_path):
    optfile = str(tmp_path / "options")
    with open(optfile, "w") as f:
        f.write(OPTIONS)
    port = _free_port()
    save2 = str(tmp_path / "two")
    procs = [
        _run_solver(
            optfile, save2,
            {
                "KSFD_NUM_CPU_DEVICES": "2",
                "KSFD_COORDINATOR": "127.0.0.1:%d" % port,
                "KSFD_NUM_PROCS": "2",
                "KSFD_PROC_ID": str(i),
            },
        )
        for i in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out
    # each process wrote its slab with /ranges
    slabs = sorted(
        f for f in os.listdir(tmp_path) if f.startswith("twos2r")
    )
    assert slabs == ["twos2r0.h5", "twos2r1.h5"]
    boxes = []
    for f in slabs:
        with h5py.File(str(tmp_path / f), "r") as h:
            assert "ranges" in h
            rng = np.asarray(h["ranges"][()])
            boxes.append(tuple(map(tuple, rng)))
            extent = rng[0][1] - rng[0][0]
            assert h["data0"].shape == (2, extent)
    assert boxes == [((0, 16),), ((16, 32),)]

    # single-process run on the same 4 total devices
    save1 = str(tmp_path / "one")
    p = _run_solver(optfile, save1, {"KSFD_NUM_CPU_DEVICES": "4"})
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out

    # merge the slabs and compare bit-exactly
    merged = str(tmp_path / "merged")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["KSFD_PLATFORM"] = "cpu"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tsmerge.py"),
         save2, "-o", merged],
        env=env, cwd=REPO, check=True, timeout=120,
    )
    with h5py.File(merged + "s1r0.h5", "r") as m, \
            h5py.File(save1 + "s1r0.h5", "r") as s:
        mkeys = sorted(k for k in m if k.startswith("data"))
        skeys = sorted(k for k in s if k.startswith("data"))
        assert mkeys == skeys and len(mkeys) >= 3
        for k in mkeys:
            assert np.array_equal(np.asarray(m[k]), np.asarray(s[k])), k
