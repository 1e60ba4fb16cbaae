"""Tests for the driver CLI, Solution reader, and command-line tools."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ksfd_tpu import NumericsOptions
from ksfd_tpu.io import TimeSeries, Solution, make_save_monitor, make_checkpoint_monitor, write_info
from ksfd_tpu.solvers import Solver
from manufactured import make_problem, exact_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def stored_run(tmp_path_factory):
    """A 4-step stored run with checkpoints, via the library."""
    tmp = tmp_path_factory.mktemp("run")
    ps, grid, ops = make_problem(nx=32)
    numerics = NumericsOptions(ksp_type="dense", adapt_type="none")
    prefix = str(tmp / "solutions/run")
    cp = str(tmp / "checks/run")
    ts = TimeSeries(prefix, grid=grid, mode="w")
    write_info(ts, clargs=ps.clargs, ps=ps)
    solver = Solver(ops, numerics, t0=0.0, dt=1.0, tmax=1e9, maxsteps=4,
                    rtol=1e-6, atol=0.01, rng_key=jax.random.PRNGKey(1))
    sm, _ = make_save_monitor(ts)
    solver.add_monitor(sm)
    solver.add_monitor(make_checkpoint_monitor(cp, grid, clargs=ps.clargs))
    u = solver.solve(jnp.asarray(exact_state(ps, grid, 0.0)))
    ts.close()
    return tmp, prefix, cp, np.asarray(u), ps, grid


def test_solution_reader(stored_run):
    tmp, prefix, cp, ufinal, ps, grid = stored_run
    soln = Solution(prefix)
    assert soln.tmin == 0.0 and soln.tmax == 4.0
    assert soln.grid == grid
    np.testing.assert_array_equal(soln.images(4.0), ufinal)
    # problem reconstructed from /info
    assert soln.ps.nligands == 2
    assert soln.clargs.params == ps.clargs.params
    # operators rebuild lazily
    assert soln.derivatives.nligands == 2
    vals = soln.params(0.0)
    assert vals["alpha_1"] == 1500
    soln.close()


def _run_tool(args):
    return subprocess.run(
        [sys.executable] + args,
        capture_output=True, text=True,
        env=dict(os.environ, KSFD_PLATFORM="cpu", PYTHONPATH=REPO),
        cwd=REPO,
    )


def test_lastcheckpoint_tool(stored_run):
    tmp, prefix, cp, *_ = stored_run
    r = _run_tool([os.path.join(REPO, "tools/lastcheckpoint.py"), cp])
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == cp + "_4_"
    r2 = _run_tool(
        [os.path.join(REPO, "tools/lastcheckpoint.py"), "--gather", cp]
    )
    assert r2.stdout.strip() == cp + "_4_@"


def test_tsmerge_tool(stored_run):
    tmp, prefix, cp, ufinal, ps, grid = stored_run
    out = str(tmp / "solutions/merged")
    r = _run_tool(
        [os.path.join(REPO, "tools/tsmerge.py"), cp + "@", "-o", out]
    )
    assert r.returncode == 0, r.stderr + r.stdout
    merged = TimeSeries(out, mode="r")
    np.testing.assert_array_equal(
        merged.sorted_times(), [0.0, 1.0, 2.0, 3.0, 4.0]
    )
    np.testing.assert_array_equal(merged.retrieve_by_time(4.0), ufinal)
    merged.close()


def test_moviemaker_tool(stored_run):
    tmp, prefix, cp, *_ = stored_run
    frames = str(tmp / "frames/f")
    r = _run_tool(
        [os.path.join(REPO, "tools/moviemaker.py"), "-n", "3",
         prefix, frames]
    )
    assert r.returncode == 0, r.stderr + r.stdout
    for i in range(3):
        assert os.path.exists("{p}{n:04d}.png".format(p=frames, n=i))


def test_h5images_tool(stored_run):
    tmp, prefix, cp, ufinal, ps, grid = stored_run
    out = str(tmp / "images.h5")
    r = _run_tool(
        [os.path.join(REPO, "tools/h5images.py"), "-n", "2", prefix, out]
    )
    assert r.returncode == 0, r.stderr + r.stdout
    import h5py

    with h5py.File(out, "r") as f:
        assert f["images1"].shape == grid.Vshape
        np.testing.assert_array_equal(f["images1"][()], ufinal)
        assert "params" in f["images1"].attrs


def test_driver_cli_end_to_end(tmp_path):
    """ksfdsolver.py runs a tiny problem from an options file."""
    optfile = tmp_path / "opts"
    optfile.write_text(
        "--save={d}/solutions/cli\n"
        "dt=1\nmaxsteps=2\ntmax=1e6\nwidth=1\nnelements=16\ndim=1\n"
        "degree=3\natol=0.01\nrtol=1e-6\nsigma=0.02357\ns2=sigma**2/2\n"
        "Nworms=0\nsrho0=0\nrho0=9000\n"
        "ngroups=1\nnligands_1=1\nalpha_1=1500\nbeta_1=5.56e-4\n"
        "s_1_1=0.01\ngamma_1_1=0.01\nD_1_1=1e-6\n"
        "--petsc\n-ts_type rosw\n-ts_adapt_type none\n--\n".format(
            d=tmp_path
        )
    )
    r = _run_tool([os.path.join(REPO, "ksfdsolver.py"), "@" + str(optfile)])
    assert r.returncode == 0, r.stderr + r.stdout
    assert "step   2" in r.stdout
    soln = Solution(str(tmp_path / "solutions/cli"))
    assert soln.tmax == 2.0
    assert soln.grid.nx == 16
    soln.close()


def test_tsmerge_single_checkpoint_gather(stored_run):
    """lastcheckpoint --gather output ('<prefix>_<k>_@') must be a
    valid tsmerge input."""
    tmp, prefix, cp, ufinal, ps, grid = stored_run
    out = str(tmp / "solutions/lastonly")
    r = _run_tool(
        [os.path.join(REPO, "tools/tsmerge.py"), cp + "_4_@", "-o", out]
    )
    assert r.returncode == 0, r.stderr + r.stdout
    merged = TimeSeries(out, mode="r")
    np.testing.assert_array_equal(merged.sorted_times(), [4.0])
    merged.close()


def test_resume_continues_step_numbering(stored_run, tmp_path):
    """Resumed runs continue the step counter, so new checkpoints do
    not overwrite the earlier run's (reviewer finding)."""
    import jax

    tmp, prefix, cp, ufinal, ps, grid = stored_run
    from ksfd_tpu import ic as ksfd_ic
    from helpers import make_clargs
    from ksfd_tpu.io import make_checkpoint_monitor
    from ksfd_tpu.ops import PDEOperators

    clargs = make_clargs(resume=cp + "_4_", params=[])
    u4, t4, extras = ksfd_ic.resume_values(clargs, grid, ps)
    assert extras.get("k") == 4
    ops = PDEOperators(ps, grid)
    numerics = NumericsOptions(ksp_type="dense", adapt_type="none")
    solver = Solver(ops, numerics, t0=t4, dt=1.0, tmax=1e9, maxsteps=6,
                    rtol=1e-6, atol=0.01, k0=int(extras["k"]))
    cp2 = str(tmp_path / "cont/cp")
    solver.add_monitor(make_checkpoint_monitor(cp2, grid))
    import jax.numpy as jnp

    solver.solve(jnp.asarray(u4), t=t4)
    assert solver.k == 6  # k0=4 + 2 more steps up to maxsteps
    assert os.path.exists(cp2 + "_5_s1r0.h5")
    assert os.path.exists(cp2 + "_6_s1r0.h5")
    assert not os.path.exists(cp2 + "_0_s1r0.h5")


def test_gatherer_merges_multirank_files(tmp_path):
    """Reference-style per-rank files (each owning an x-slab, with a
    /ranges dataset) must gather and merge into one full series —
    the tsmerge workflow for runs produced by the MPI reference
    (SURVEY §2 TimeSeries protocol)."""
    import h5py
    from ksfd_tpu import Grid
    from ksfd_tpu.io import Gatherer

    grid = Grid(dim=1, nx=16, dof=2)
    rng = np.random.default_rng(7)
    full = {t: rng.standard_normal(grid.Vshape) for t in (0.0, 1.0)}
    prefix = str(tmp_path / "mr")
    # two rank files, each holding its half of the domain
    for rank, (lo, hi) in enumerate(((0, 8), (8, 16))):
        ts = TimeSeries(prefix, grid=grid, mode="w", size=2, rank=rank)
        ts.try_to_set("ranges", np.asarray([[lo, hi]]))
        for k, (t, v) in enumerate(full.items()):
            data = np.zeros(grid.Vshape)
            data[:, lo:hi] = v[:, lo:hi]
            ts.store(data, t, k=k)
        ts.close()
    assert os.path.exists(prefix + "s2r0.h5")
    assert os.path.exists(prefix + "s2r1.h5")
    ranks = list(Gatherer(prefix))
    assert [ts.ranges for ts in ranks] == [((0, 8),), ((8, 16),)]
    # merge through the tool
    out = str(tmp_path / "merged")
    r = _run_tool([os.path.join(REPO, "tools/tsmerge.py"),
                   prefix + "@", "-o", out])
    assert r.returncode == 0, r.stderr + r.stdout
    for ts in ranks:
        ts.close()
    merged = TimeSeries(out, mode="r")
    for t, v in full.items():
        np.testing.assert_allclose(merged.retrieve_by_time(t), v)
    merged.close()


def test_driver_save_every_thins_series(tmp_path):
    """--save_every=N stores every Nth accepted step plus the final
    state (always), with no duplicate snapshot for the last step."""
    optfile = tmp_path / "opts"
    optfile.write_text(
        "--save={d}/solutions/thin\n"
        "--save_every=3\n"
        "dt=1\nmaxsteps=7\ntmax=1e6\nwidth=1\nnelements=16\ndim=1\n"
        "degree=3\natol=0.01\nrtol=1e-6\nsigma=0.02357\ns2=sigma**2/2\n"
        "Nworms=0\nsrho0=0\nrho0=9000\n"
        "ngroups=1\nnligands_1=1\nalpha_1=1500\nbeta_1=5.56e-4\n"
        "s_1_1=0.01\ngamma_1_1=0.01\nD_1_1=1e-6\n"
        "--petsc\n-ts_type rosw\n-ts_adapt_type none\n--\n".format(
            d=tmp_path
        )
    )
    r = _run_tool([os.path.join(REPO, "ksfdsolver.py"), "@" + str(optfile)])
    assert r.returncode == 0, r.stderr + r.stdout
    ts = TimeSeries(str(tmp_path / "solutions/thin"), mode="r")
    ks = sorted(int(k) for k in np.asarray(ts.ks))
    ts.close()
    # k=0 (initial), k=3, k=6, and the forced final k=7 — not 0..7
    assert ks == [0, 3, 6, 7], ks


def test_driver_cli_ensemble(tmp_path):
    """--ensemble=N: N members integrate as one vmapped program and
    save to <prefix>_m<i> series with distinct IC seeds, each readable
    by the Solution API."""
    optfile = tmp_path / "opts"
    optfile.write_text(
        "--save={d}/solutions/ens\n"
        "dt=1\nmaxsteps=3\ntmax=1e6\nwidth=1\nnelements=16\ndim=1\n"
        "degree=3\natol=0.01\nrtol=1e-6\nsigma=0.02357\ns2=sigma**2/2\n"
        "Nworms=0\nsrho0=30\nrho0=9000\n"
        "ngroups=1\nnligands_1=1\nalpha_1=1500\nbeta_1=5.56e-4\n"
        "s_1_1=0.01\ngamma_1_1=0.01\nD_1_1=1e-6\n".format(d=tmp_path)
    )
    r = _run_tool(
        [os.path.join(REPO, "ksfdsolver.py"), "@" + str(optfile),
         "--ensemble=2"]
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert "members = 2, diverged = 0" in r.stdout
    # --ensemble=1 must run the ensemble path too (same _m0 naming and
    # summary line), not silently fall back to the scalar solver
    r1 = _run_tool(
        [os.path.join(REPO, "ksfdsolver.py"), "@" + str(optfile),
         "--ensemble=1", "--save=%s/solutions/ens1" % tmp_path]
    )
    assert r1.returncode == 0, r1.stderr + r1.stdout
    assert "members = 1, diverged = 0" in r1.stdout
    s = Solution(str(tmp_path / "solutions/ens1_m0"))
    assert len(s.tstimes) >= 1
    s.close()
    s0 = Solution(str(tmp_path / "solutions/ens_m0"))
    s1 = Solution(str(tmp_path / "solutions/ens_m1"))
    a0 = np.asarray(s0.images(s0.tstimes[-1]))
    a1 = np.asarray(s1.images(s1.tstimes[-1]))
    assert a0.shape == a1.shape
    assert np.abs(a0 - a1).max() > 1.0  # per-member IC seeds differ
    s0.close()
    s1.close()


def test_lastcheckpoint_zip_mode(stored_run, tmp_path):
    """Zip-mode runs: the literal --check value (ending '.zip') must
    find the newest archived checkpoint, extract its files (they were
    deleted at archive time), and print a directly-resumable prefix."""
    import zipfile

    _, _, _, ufinal, ps, grid = stored_run
    d = tmp_path / "checks"
    d.mkdir()
    pref = str(d / "zrun")
    for k in (0, 2):
        cpname = "%s_%d_" % (pref, k)
        ts = TimeSeries(cpname, grid=grid, mode="w")
        ts.store(ufinal, float(k), k=k)
        ts.close()
        fn = cpname + "s1r0.h5"
        with zipfile.ZipFile(pref + "s1r0.zip", "a") as z:
            z.write(fn, arcname=os.path.basename(fn))
        os.remove(fn)
    r = _run_tool(
        [os.path.join(REPO, "tools/lastcheckpoint.py"), pref + ".zip"]
    )
    assert r.returncode == 0, r.stderr + r.stdout
    assert r.stdout.strip() == pref + "_2_"
    ts = TimeSeries(pref + "_2_", mode="r")
    np.testing.assert_array_equal(ts.retrieve_by_time(2.0), ufinal)
    ts.close()
    # only the newest checkpoint is extracted
    assert not os.path.exists(pref + "_0_s1r0.h5")


def test_moviemaker_names_mismatch(stored_run):
    """--names with the wrong count must error out loudly instead of
    silently dropping fields via zip truncation."""
    tmp, prefix, *_ = stored_run
    frames = str(tmp / "frames_nm/f")
    r = _run_tool(
        [os.path.join(REPO, "tools/moviemaker.py"), "-n", "1",
         "--names", "OnlyOne", prefix, frames]
    )
    assert r.returncode == 2
    assert "--names" in r.stderr


def test_solution_empty_series_raises(stored_run, tmp_path):
    """A crash before the first monitor write leaves a valid file with
    /info but zero snapshots; Solution must name the problem instead
    of dying on IndexError."""
    from ksfd_tpu import KSFDException

    _, _, _, _, ps, grid = stored_run
    ts = TimeSeries(str(tmp_path / "empty"), grid=grid, mode="w")
    write_info(ts, clargs=ps.clargs, ps=ps)
    ts.close()
    with pytest.raises(KSFDException, match="no snapshots"):
        Solution(str(tmp_path / "empty"))


def test_driver_cli_resume_bitexact(tmp_path):
    """The reference's crash-resume pipeline through the REAL CLI:
    run 6 adaptive steps uninterrupted; separately run 3 steps with
    checkpoints, then --resume from the lastcheckpoint output with
    the same options.  The resumed run must continue the step
    numbering and reproduce the uninterrupted trajectory bit-exactly
    (/solver_state carries t, dt, k, PRNG key)."""
    common = (
        "dt=0.1\ntmax=1e6\nwidth=1\nnelements=16\ndim=1\n"
        "degree=3\natol=0.01\nrtol=1e-6\nsigma=0.02357\ns2=sigma**2/2\n"
        "Nworms=0\nsrho0=0\nrho0=9000+100*sin(2*pi*x)\n"
        "ngroups=1\nnligands_1=1\nalpha_1=1500\nbeta_1=5.56e-4\n"
        "s_1_1=0.01\ngamma_1_1=0.01\nD_1_1=1e-6\n"
    )
    optA = tmp_path / "optsA"
    optA.write_text("--save={d}/A\nmaxsteps=6\n".format(d=tmp_path) + common)
    optB = tmp_path / "optsB"
    optB.write_text(
        "--save={d}/B\n--check={d}/cpB\nmaxsteps=3\n".format(d=tmp_path)
        + common
    )
    rA = _run_tool([os.path.join(REPO, "ksfdsolver.py"), "@" + str(optA)])
    assert rA.returncode == 0, rA.stderr + rA.stdout
    rB = _run_tool([os.path.join(REPO, "ksfdsolver.py"), "@" + str(optB)])
    assert rB.returncode == 0, rB.stderr + rB.stdout
    rl = _run_tool(
        [os.path.join(REPO, "tools/lastcheckpoint.py"), str(tmp_path / "cpB")]
    )
    assert rl.returncode == 0, rl.stderr
    cp = rl.stdout.strip()
    assert cp.endswith("_3_")
    # the resume options OMIT dt: an explicit dt= parameter overrides
    # the checkpoint's stored dt by the reference's priority rules
    # (ksfdsolver2.py:540-552) and would restart the adaptive ladder
    common_nodt = "\n".join(
        ln for ln in common.splitlines() if not ln.startswith("dt=")
    ) + "\n"
    optC = tmp_path / "optsC"
    optC.write_text(
        "--save={d}/C\n--resume={cp}\nmaxsteps=6\n".format(
            d=tmp_path, cp=cp
        )
        + common_nodt
    )
    rC = _run_tool([os.path.join(REPO, "ksfdsolver.py"), "@" + str(optC)])
    assert rC.returncode == 0, rC.stderr + rC.stdout
    a = TimeSeries(str(tmp_path / "A"), mode="r")
    c = TimeSeries(str(tmp_path / "C"), mode="r")
    ta, tc = a.sorted_times()[-1], c.sorted_times()[-1]
    assert ta == tc, (a.sorted_times(), c.sorted_times())
    np.testing.assert_array_equal(
        a.retrieve_by_time(ta), c.retrieve_by_time(tc)
    )
    # step numbering continued (ks in C start at the checkpoint's k)
    assert min(int(k) for k in c.ks) >= 3
    a.close()
    c.close()


def test_peakstats_counts_and_cli(stored_run, tmp_path):
    """tools/peakstats.py: periodic peak counting (1D runs, 2D wrap-
    merged components) + the CLI over a saved series.  The analysis
    half of the options80 'N sharp peaks' parity claim
    (/root/reference/options80:6-7)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from peakstats import count_peaks_1d, count_peaks_nd
    finally:
        sys.path.pop(0)

    x = np.linspace(0, 1, 256, endpoint=False)
    base = np.full_like(x, 100.0)

    def bump(c):
        d = np.mod(x - c + 0.5, 1.0) - 0.5
        return 2e4 * np.exp(-d * d / 1e-4)

    rho = base + bump(0.1) + bump(0.4) + bump(0.7)
    assert count_peaks_1d(rho) == 3
    # one peak straddling the periodic boundary counts ONCE
    assert count_peaks_1d(base + bump(0.999)) == 1
    # 2D: 5 spots, one crossing the x edge, wrap-merged
    X, Y = np.meshgrid(x, x, indexing="ij")
    r2 = np.full_like(X, 100.0)
    for cx, cy in [(0.0, 0.3), (0.25, 0.1), (0.6, 0.55),
                   (0.75, 0.85), (0.2, 0.65)]:
        dx = np.mod(X - cx + 0.5, 1.0) - 0.5
        dy = np.mod(Y - cy + 0.5, 1.0) - 0.5
        r2 += 2e4 * np.exp(-(dx * dx + dy * dy) / 2e-4)
    assert count_peaks_nd(r2) == 5

    # CLI over a real saved series
    _, prefix, _, _, _, _ = stored_run
    r = _run_tool([os.path.join(REPO, "tools/peakstats.py"), prefix])
    assert r.returncode == 0, r.stderr + r.stdout
    assert "peaks=" in r.stdout
