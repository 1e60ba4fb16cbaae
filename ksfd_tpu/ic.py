"""Initial values: fresh starts and checkpoint resume.

Reference parity: initial_values/start_values/resume_values
(ksfdsolver2.py:500-639).
"""

import numpy as np

from .grid import Grid
from .ops.spatial import SpatialExpression
from .randomfield import Generator, random_function
from .io.timeseries import TimeSeries
from .utils.debug import logger

logMAIN = logger("MAIN")

__all__ = ["initial_values", "start_values", "resume_values"]


def initial_values(clargs, grid, ps):
    """(state array, t0[, extras dict]) for a fresh or resumed run."""
    if clargs.resume or clargs.restart:
        return resume_values(clargs, grid, ps)
    u, t = start_values(clargs, grid, ps)
    return u, t, {}


def start_values(clargs, grid, ps):
    """Fresh start: rho0 + smooth random field; U0 or local steady state.

    Reference: ksfdsolver2.py:580-639.
    """
    p0 = ps.params0
    rnx = p0["randgridnw"] or ps.nwidth // 4
    rny = p0["randgridnh"] or ps.nheight // 4
    rnz = p0["randgridnd"] or ps.ndepth // 4
    rgrid = Grid(
        dim=ps.dim, width=ps.width, height=ps.height, depth=ps.depth,
        nx=rnx, ny=rny, nz=rnz, dof=1, order=ps.degree,
    )
    values0 = ps.values0
    murho0 = values0["Nworms"] / (ps.width**ps.dim)
    sigma = values0["srho0"]
    if np.isscalar(sigma) and sigma == 0.0:
        rva = np.full(rgrid.Sshape, murho0)
    else:
        rva = np.asarray(SpatialExpression(ps, rgrid, sigma)(t=ps.t0))
        stn = Generator.get_rng().normal(size=rva.shape)
        rva = rva * stn + murho0
    randrho = random_function(grid, randgrid=rgrid, vals=rva)
    u = np.zeros(grid.Vshape)
    if values0["rho0"]:
        u[0] = np.asarray(SpatialExpression(ps, grid, values0["rho0"])(t=ps.t0))
    u[0] += randrho
    for dof, lig in enumerate(ps.groups.ligands()):
        name = "U0" + lig.name()[1:]
        v = values0.get(name)
        if v is not None and v is not False and v != "":
            u[dof + 1] = np.asarray(SpatialExpression(ps, grid, v)(t=ps.t0))
        else:
            # local steady state U = rho*s/gamma (ksfdsolver2.py:637).
            # s/gamma may be expression-valued parameters; use the
            # DAG-resolved t0 values rather than the raw attributes.
            suffix = lig.name()[1:]  # "_<g>_<l>"
            sval = values0.get("s" + suffix, lig.s)
            gval = values0.get("gamma" + suffix, lig.gamma)
            u[dof + 1] = u[0] * (float(sval) / float(gval))
    return u, float(ps.t0)


def resume_values(clargs, grid, ps):
    """Resume (keep t) or restart (reset t=t0) from a TimeSeries.

    dt/lastvart priority: explicit CLI parameter > file > inter-
    snapshot spacing > default (ksfdsolver2.py:525-578).  Returns
    (state, t, extras) where extras may hold rng_key / step counter
    for bit-exact resume.

    Multi-process runs resume THROUGH THE SLAB FILES: each process
    opens its own '<prefix>s<size>r<rank>.h5' (the reference's
    per-rank read chain, KSFD/ksfdtimeseries.py:188-243) and returns
    its slab plus its box in extras['box']; the driver reassembles the
    global sharded state with global_from_local.  A SINGLE process
    resuming a multi-rank slab set gets the virtual slab view (the
    TimeSeries assembles the global state across the set — no tsmerge
    needed); only multi-process resumes from a DIFFERENT process
    count still require tsmerge first, like the reference.
    """
    import jax

    prefix = clargs.resume or clargs.restart
    nprocs = jax.process_count()
    cpf = TimeSeries(
        prefix, grid=grid, mode="r",
        size=nprocs, rank=jax.process_index(),
        retries=clargs.series_retries,
        retry_interval=clargs.series_retry_interval,
    )
    full_box = tuple((0, int(n)) for n in grid.nps)
    box = cpf.ranges if cpf.ranges is not None else full_box
    if box != full_box:
        # the fallback filename chain may have found SOME rank's slab
        # of a differently-sized run; only this process's own slab of
        # a same-size run is resumable
        from .utils.exceptions import KSFDException
        from .io.timeseries import parse_filename
        import os as _os

        _, fsize, frank, _ = parse_filename(
            _os.path.basename(cpf.filename)
        )
        if fsize != nprocs or frank != jax.process_index():
            raise KSFDException(
                "cannot resume slab series %r (written by %d ranks) "
                "with %d process(es); merge it first: "
                "python tools/tsmerge.py %s -o <merged>"
                % (cpf.filename, fsize, nprocs, prefix)
            )
    stimes = cpf.sorted_times()
    tlast = stimes[-1]
    state = cpf.load_solver_state()
    dtparams = [p for p in clargs.params if p.startswith("dt=")]
    lastvartparams = [p for p in clargs.params if p.startswith("lastvart=")]
    extras = {}
    if clargs.resume:
        t = float(tlast)
        if dtparams:
            ps.params0["dt"] = float(dtparams[0][3:])
        elif "dt" in state:
            ps.params0["dt"] = float(state["dt"])
        elif len(stimes) >= 2:
            ps.params0["dt"] = float(tlast - stimes[-2])
        if lastvartparams:
            ps.params0["lastvart"] = float(lastvartparams[0][9:])
        elif "lastvart" in state:
            ps.params0["lastvart"] = float(state["lastvart"])
        elif len(stimes) >= 2:
            ps.params0["lastvart"] = float(tlast - stimes[-2])
        else:
            ps.params0["lastvart"] = t
        if "rng_key" in state:
            extras["rng_key"] = state["rng_key"]
        if "k" in state:
            extras["k"] = int(state["k"])
    else:
        t = float(ps.t0)
        if lastvartparams:
            ps.params0["lastvart"] = float(lastvartparams[0][9:])
        else:
            ps.params0["lastvart"] = float(ps.t0)
    values = cpf.retrieve_by_time(tlast)
    shape = cpf.local_shape
    cpf.close()
    u = np.asarray(values).reshape(shape)
    if box != full_box:
        extras["box"] = box
    logMAIN("resumed at t", t, "box", box if box != full_box else "full")
    return u, t, extras
