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


def _run_solver(optfile, save, extra_env, timeout=240, args=()):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(KSFD_PLATFORM="cpu", **extra_env)
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "ksfdsolver.py"),
         "@" + optfile, "--save=" + save, *args],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _launch_procs(optfile, save, nprocs, devs_per_proc, args=()):
    """Start nprocs coordinated solver processes (the mpiexec analog)."""
    port = _free_port()
    return [
        _run_solver(
            optfile, save,
            {
                "KSFD_NUM_CPU_DEVICES": str(devs_per_proc),
                "KSFD_COORDINATOR": "127.0.0.1:%d" % port,
                "KSFD_NUM_PROCS": str(nprocs),
                "KSFD_PROC_ID": str(i),
            },
            args=args,
        )
        for i in range(nprocs)
    ]


def _wait_ok(procs, timeout=420):
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        assert p.returncode == 0, out


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


ADAPTIVE_OPTIONS = """\
dt=0.1
tmax=1e6
maxsteps={maxsteps}
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


@pytest.mark.slow
def test_two_process_adaptive_checkpoint_resume(tmp_path):
    """VERDICT r2 #7: an ADAPTIVE 2-process run with per-rank slab
    checkpoints, resumed THROUGH THE SLAB FILES, reproduces the
    uninterrupted 2-process trajectory bit-exactly (each rank reads
    its own '<cp>s2r<rank>.h5'; /solver_state carries h, k, lastvart,
    PRNG key).  The multi-process analog of
    test_tools.test_driver_cli_resume_bitexact."""
    optA = str(tmp_path / "optsA")
    with open(optA, "w") as f:
        f.write(ADAPTIVE_OPTIONS.format(maxsteps=6))
    optB = str(tmp_path / "optsB")
    with open(optB, "w") as f:
        f.write(ADAPTIVE_OPTIONS.format(maxsteps=3))
    # resume options: no dt= (an explicit dt would override the
    # checkpoint's stored h and restart the adaptive ladder)
    optC = str(tmp_path / "optsC")
    with open(optC, "w") as f:
        f.write(
            "\n".join(
                ln
                for ln in ADAPTIVE_OPTIONS.format(maxsteps=6).splitlines()
                if not ln.startswith("dt=")
            )
            + "\n"
        )

    saveA = str(tmp_path / "A")
    _wait_ok(_launch_procs(optA, saveA, 2, 2))
    saveB = str(tmp_path / "B")
    cpB = str(tmp_path / "cpB")
    _wait_ok(_launch_procs(optB, saveB, 2, 2, args=("--check=" + cpB,)))
    # per-rank slab checkpoints exist for every step
    for k in range(0, 4):
        for r in range(2):
            fn = "cpB_%d_s2r%d.h5" % (k, r)
            assert os.path.isfile(str(tmp_path / fn)), fn

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["KSFD_PLATFORM"] = "cpu"
    rl = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "lastcheckpoint.py"),
         cpB],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert rl.returncode == 0, rl.stderr + rl.stdout
    cp = rl.stdout.strip()
    assert cp.endswith("_3_"), cp

    saveC = str(tmp_path / "C")
    _wait_ok(_launch_procs(optC, saveC, 2, 2, args=("--resume=" + cp,)))

    for r in range(2):
        with h5py.File(str(tmp_path / ("As2r%d.h5" % r)), "r") as a, \
                h5py.File(str(tmp_path / ("Cs2r%d.h5" % r)), "r") as c:
            # numbering continued from the checkpoint
            aks = sorted(int(k[4:]) for k in a if k.startswith("data"))
            cks = sorted(int(k[4:]) for k in c if k.startswith("data"))
            assert aks == list(range(0, 7)), aks
            assert cks == list(range(3, 7)), cks
            assert np.array_equal(
                np.asarray(a["times"]).max(), np.asarray(c["times"]).max()
            )
            for k in cks:
                key = "data%d" % k
                assert np.array_equal(
                    np.asarray(a[key]), np.asarray(c[key])
                ), (r, key)


@pytest.mark.slow
def test_resume_slab_series_single_process_virtual_view(tmp_path):
    """A SINGLE process resuming a 2-rank slab checkpoint gets the
    virtual slab view (r5): the reader assembles the global state
    across the set, so the resume proceeds WITHOUT a tsmerge pass —
    previously this errored with tsmerge advice.  (Multi-process
    resumes from a different-size set still error; ic.resume_values.)
    """
    optB = str(tmp_path / "optsB")
    with open(optB, "w") as f:
        f.write(ADAPTIVE_OPTIONS.format(maxsteps=2))
    saveB = str(tmp_path / "B")
    cpB = str(tmp_path / "cpB")
    _wait_ok(_launch_procs(optB, saveB, 2, 2, args=("--check=" + cpB,)))
    optC = str(tmp_path / "optsC")
    with open(optC, "w") as f:
        f.write(ADAPTIVE_OPTIONS.format(maxsteps=4))
    saveC = str(tmp_path / "C")
    p = _run_solver(
        optC, saveC, {"KSFD_NUM_CPU_DEVICES": "4"},
        args=("--resume=" + cpB + "_2_",),
    )
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out
    # the resumed run continued past the checkpoint's 2 steps and its
    # first snapshot equals the checkpoint state assembled globally
    with h5py.File(saveC + "s1r0.h5", "r") as hc:
        ks = sorted(int(k[4:]) for k in hc if k.startswith("data"))
        assert ks[-1] >= 3, ks
        first = np.asarray(hc["data%d" % ks[0]])
    from ksfd_tpu.io.timeseries import TimeSeries

    cp = TimeSeries(cpB + "_2_", mode="r")
    assert cp.virtual
    np.testing.assert_allclose(
        first, cp.retrieve_by_time(cp.sorted_times()[-1]),
        rtol=0, atol=1e-12,
    )
    cp.close()


ENSEMBLE_OPTIONS = """\
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
rho0=9000
srho0=30
ngroups=1
nligands_1=1
alpha_1=1500
beta_1=5.56e-4
s_1_1=0.01
gamma_1_1=0.01
D_1_1=1e-6
"""


@pytest.mark.slow
def test_two_process_ensemble_bitexact(tmp_path):
    """VERDICT r3 #7: --ensemble over 2 processes.  Members are
    communication-free data parallelism: process p integrates its own
    contiguous member slab on its local devices and writes those
    members' series itself.  Every per-member series
    ('<save>_m<i>s1r0.h5' — whole-domain, single-writer) must be
    bit-identical to the single-process run's (global member index
    drives both the IC seed and the noise key chain).  Reference
    analog: N independent cluster jobs, options84s16.sh."""
    optfile = str(tmp_path / "options")
    with open(optfile, "w") as f:
        f.write(ENSEMBLE_OPTIONS)

    save2 = str(tmp_path / "two" / "e")
    procs = _launch_procs(
        optfile, save2, 2, 2, args=("--ensemble=4", "--seed=5")
    )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out
        outs.append(out)
    assert "members 0-1" in outs[0] + outs[1]
    assert "members 2-3" in outs[0] + outs[1]

    save1 = str(tmp_path / "one" / "e")
    p = _run_solver(
        optfile, save1, {"KSFD_NUM_CPU_DEVICES": "4"},
        args=("--ensemble=4", "--seed=5"),
    )
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, out

    for i in range(4):
        f2 = "%s_m%ds1r0.h5" % (save2, i)
        f1 = "%s_m%ds1r0.h5" % (save1, i)
        assert os.path.isfile(f2), f2
        with h5py.File(f2, "r") as a, h5py.File(f1, "r") as b:
            aks = sorted(k for k in a if k.startswith("data"))
            bks = sorted(k for k in b if k.startswith("data"))
            assert aks == bks and len(aks) >= 3, (i, aks, bks)
            for k in aks:
                assert np.array_equal(
                    np.asarray(a[k]), np.asarray(b[k])
                ), (i, k)
    # members actually differ (distinct global IC seeds)
    with h5py.File("%s_m0s1r0.h5" % save2, "r") as a, \
            h5py.File("%s_m3s1r0.h5" % save2, "r") as b:
        d = np.abs(
            np.asarray(a["data0"]) - np.asarray(b["data0"])
        ).max()
        assert d > 1.0, d

    # indivisible member counts must fail loudly, on every process
    bad = _launch_procs(
        optfile, str(tmp_path / "bad" / "e"), 2, 2,
        args=("--ensemble=3", "--seed=5"),
    )
    for p in bad:
        out, _ = p.communicate(timeout=240)
        assert p.returncode != 0
        assert "divide evenly" in out, out


OPTIONS_2D = """\
dt=1e-8
tmax=100
maxsteps=3
width=1
height=1
nelements=32
nwidth=32
nheight=32
dim=2
degree=3
atol=0.01
rtol=1e-6
rhomax=28000
cushion=2000
s2=2.78e-4
Nworms=0
'rho0=9000 + 100*sin(2*pi*(x+y))'
srho0=0
ngroups=1
nligands_1=1
alpha_1=1500
beta_1=5.56e-4
s_1_1=0.01
gamma_1_1=0.01
D_1_1=1e-6
"""


@pytest.mark.slow
def test_two_process_exact_lu_bitexact(tmp_path):
    """VERDICT r3 missing #1: the exact direct tier under
    multi-process.  The reference LU-factors its exact Jacobian with
    parallel MUMPS (/root/reference/options84 PETSc block); here a
    2-process run with '-ksp_type preonly -pc_type lu' (routed to
    -ksp_type lu on a 2D grid) uses the replicated-host-solve pattern:
    each process gathers the global state, performs the identical
    SuperLU factorization + stage solves, and places the result back
    with the slab sharding.  The written slabs must be bit-identical
    to a single-process LU run on the same total device count."""
    optfile = str(tmp_path / "options")
    with open(optfile, "w") as f:
        f.write(OPTIONS_2D)
        f.write("--petsc\n-ksp_type preonly\n-pc_type lu\n--\n")

    save2 = str(tmp_path / "lu2")
    procs = _launch_procs(optfile, save2, 2, 2)
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out
        outs.append(out)
    assert "routed to the exact direct tier" in outs[0], outs[0]

    save1 = str(tmp_path / "lu1")
    p = _run_solver(optfile, save1, {"KSFD_NUM_CPU_DEVICES": "4"})
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, out

    merged = str(tmp_path / "merged")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["KSFD_PLATFORM"] = "cpu"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tsmerge.py"),
         save2, "-o", merged],
        env=env, cwd=REPO, check=True, timeout=180,
    )
    with h5py.File(merged + "s1r0.h5", "r") as m, \
            h5py.File(save1 + "s1r0.h5", "r") as s:
        mkeys = sorted(k for k in m if k.startswith("data"))
        skeys = sorted(k for k in s if k.startswith("data"))
        assert mkeys == skeys and len(mkeys) >= 3
        for k in mkeys:
            assert np.array_equal(np.asarray(m[k]), np.asarray(s[k])), k


@pytest.mark.slow
def test_four_process_2d_slab_write_and_merge(tmp_path):
    """VERDICT r2 #7: a 4-process 2D run (the options84s16.sh analog,
    one device per process) writes four x-slabs with /ranges; tsmerge
    reassembles them bit-exactly against a single-process run on the
    same 4 total devices."""
    optfile = str(tmp_path / "options")
    with open(optfile, "w") as f:
        f.write(OPTIONS_2D)
    save4 = str(tmp_path / "four")
    _wait_ok(_launch_procs(optfile, save4, 4, 1))

    slabs = sorted(
        f for f in os.listdir(tmp_path) if f.startswith("fours4r")
    )
    assert slabs == ["fours4r%d.h5" % r for r in range(4)]
    boxes = []
    for f in slabs:
        with h5py.File(str(tmp_path / f), "r") as h:
            rng = np.asarray(h["ranges"][()])
            boxes.append(tuple(map(tuple, rng)))
            ext = tuple(hi - lo for lo, hi in rng)
            assert h["data0"].shape == (2,) + ext
    # x-only decomposition (the kernel-compatible default factoring)
    assert boxes == [
        ((8 * r, 8 * (r + 1)), (0, 32)) for r in range(4)
    ]

    save1 = str(tmp_path / "one")
    p = _run_solver(optfile, save1, {"KSFD_NUM_CPU_DEVICES": "4"})
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, out

    merged = str(tmp_path / "merged")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["KSFD_PLATFORM"] = "cpu"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tsmerge.py"),
         save4, "-o", merged],
        env=env, cwd=REPO, check=True, timeout=180,
    )
    with h5py.File(merged + "s1r0.h5", "r") as m, \
            h5py.File(save1 + "s1r0.h5", "r") as s:
        mkeys = sorted(k for k in m if k.startswith("data"))
        skeys = sorted(k for k in s if k.startswith("data"))
        assert mkeys == skeys and len(mkeys) >= 3
        for k in mkeys:
            assert np.array_equal(np.asarray(m[k]), np.asarray(s[k])), k
