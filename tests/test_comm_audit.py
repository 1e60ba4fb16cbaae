"""Sharded-communication audit of the implicit step (VERDICT r2 #4).

Lowers the sharded step on the 8-device virtual mesh and inspects the
compiled HLO's collectives.  The reference's per-step communication is
halo exchange + scalar reductions only (SURVEY §2 'Distributed
communication backend'); here one extra class is inherent to the
spectral stage preconditioner: its transform must combine information
across shards, costing ONE state-sized all-reduce per M^{-1} apply.
That is the communication FLOOR for a spectral method on a sharded
grid (an all-reduce's 2x-state wire bytes equal the reduce-scatter +
reduce-scatter of the mode-sharded alternative, measured identical in
r3 — see docs/PERF.md 'Sharded-communication audit'), so the audit
asserts the step stays AT the floor:

- NO state-sized all-gather anywhere (a gather means the partitioner
  replicated state or pallas operands — the failure mode this guards);
- state-sized all-reduces bounded by the preconditioner apply count
  (sweeps x stages + base-RHS extras), never per-kernel;
- collective-permutes only at halo size (kernel ppermute / XLA roll
  edges), never state-sized.
"""

import re
from collections import Counter

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ksfd_tpu import Grid, NumericsOptions, SolutionParameters
from ksfd_tpu.ops import PDEOperators
from ksfd_tpu.parallel import distribute, grid_mesh
from ksfd_tpu.solvers import make_step_fn
from helpers import make_clargs, OPTIONS92_PARAMS

NX = NY = 64
DOF = 3
STATE_ELEMS = DOF * NX * NY


@pytest.fixture(scope="module")
def ops2d():
    params = [
        p for p in OPTIONS92_PARAMS
        if p.split("=", 1)[0]
        not in ("nelements", "dim", "rho0", "U0_1_1", "U0_2_1")
    ] + ["nelements=%d" % NX, "dim=2", "height=1", "rho0=murho",
         "U0_1_1=", "U0_2_1="]
    ps = SolutionParameters(make_clargs(params=params))
    grid = Grid(dim=2, width=1.0, height=1.0, nx=NX, ny=NY, dof=DOF,
                order=3)
    return ps, grid, PDEOperators(ps, grid)


def _shape_elems(shape_str):
    """'f32[3,8,64]{2,1,0}' -> (element count, bytes per element)."""
    m = re.match(r"([a-z]+)(\d+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0, 0
    dims = [int(d) for d in m.group(3).split(",") if d] or [1]
    elems = int(np.prod(dims))
    return elems, int(m.group(2)) // 8


def collect_collectives(txt):
    """{op: [(elems, bytes_per_elem), ...]} from compiled HLO text."""
    out = {}
    for m in re.finditer(
        r"= (\S+) (all-gather|all-reduce|reduce-scatter|"
        r"collective-permute|all-to-all)\(",
        txt,
    ):
        out.setdefault(m.group(2), []).append(_shape_elems(m.group(1)))
    return out


def _lower_sharded_step(ops, grid, numerics, monkeypatch):
    monkeypatch.setenv("KSFD_PALLAS_INTERPRET", "1")
    mesh = grid_mesh(grid, shape=(8, 1))
    step, _ = make_step_fn(ops, numerics, atol=0.01, rtol=1e-6,
                           mesh=mesh)
    rng = np.random.default_rng(0)
    u = np.stack([
        6000 + 3000 * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + 1000 * np.abs(rng.standard_normal(grid.Sshape)),
        6000 + 500 * np.abs(rng.standard_normal(grid.Sshape)),
    ])
    dtype = (
        jnp.float32
        if numerics.precision in ("float32", "f32")
        else jnp.float64
    )
    u_sh, _ = distribute(jnp.asarray(u, dtype=dtype), grid, mesh=mesh)
    t = jnp.asarray(0.0, dtype=dtype)
    h = jnp.asarray(1e-3, dtype=dtype)
    compiled = jax.jit(step).lower(u_sh, t, h).compile()
    return compiled.as_text(), numerics


def _audit(txt, numerics, max_permutes=None):
    coll = collect_collectives(txt)
    # 1. no state-sized (or half-state) all-gather, ever
    for elems, _ in coll.get("all-gather", []):
        assert elems < STATE_ELEMS // 2, (
            "state-sized all-gather in the sharded step HLO: "
            "the partitioner replicated state", coll)
    # 2. state-sized all-reduces only at the preconditioner floor:
    #    one per M^{-1} apply (ksp_iters sweeps x 4 stages) plus the
    #    base apply.  Measured 11 at the default 3 sweeps (XLA CSEs a
    #    back-to-back pair), so 4*iters+1 = 13 is measured + small
    #    slack — a ~1.5x comm regression FAILS here (the old
    #    4*(iters+2) = 20 bound let one through; VERDICT r3 #8)
    big_ar = [
        e for e, _ in coll.get("all-reduce", [])
        if e >= STATE_ELEMS // 2
    ]
    bound = 4 * numerics.ksp_iters + 1
    assert len(big_ar) <= bound, (len(big_ar), bound, coll)
    # 3. collective-permutes stay halo-sized (<= dof * halo_rows * ny
    #    per edge; halo rounds to 8 rows), and their COUNT stays at
    #    the measured per-path level + slack (passed by each test) so
    #    a halo-exchange regression is caught too, not just a size one
    perms = coll.get("collective-permute", [])
    for elems, _ in perms:
        assert elems <= DOF * 8 * NY, (elems, coll)
    if max_permutes is not None:
        assert len(perms) <= max_permutes, (len(perms), max_permutes)
    # 4. communication bytes per step, for the record
    total = sum(
        e * b for ops_ in coll.values() for e, b in ops_
    )
    return total, coll


def test_sharded_f64_mixed_step_comm_floor(ops2d, monkeypatch):
    """The DEFAULT f64 mixed-precision sharded step (fused kernels +
    f32 sweeps) stays at the spectral-pc communication floor — and its
    pc all-reduces REQUEST bf16 on the wire (pc_dtype 'auto' resolves
    to bfloat16 under the >1-device mesh and engages the explicitly
    sharded one-psum apply; VERDICT r4 #2: the wire lever is the
    default, not opt-in)."""
    ps, grid, ops = ops2d
    txt, nm = _lower_sharded_step(
        ops, grid, NumericsOptions(), monkeypatch
    )
    # measured 50 permutes (kernel ppermute halos + XLA roll edges)
    total, coll = _audit(txt, nm, max_permutes=56)
    # the fused kernels' halo exchange must actually be present
    assert "collective-permute" in coll
    # floor sanity: SOME pc all-reduces exist (sweeps ran sharded)
    assert any(
        e >= STATE_ELEMS // 2 for e, _ in coll.get("all-reduce", [])
    )
    # the default's pc psums are REQUESTED on bf16 mode coefficients
    # (the CPU backend of this virtual mesh legalizes through f32
    # converts — the request is what the TPU backend honors over ICI)
    psum_reqs = re.findall(
        r"bf16\[%d,%d,%d\][^\n]*convert[^\n]*psum" % (DOF, NX, NY),
        txt,
    )
    assert len(psum_reqs) >= nm.ksp_iters * 4, (len(psum_reqs), coll)


def test_sharded_f32_fast_step_comm_floor(ops2d, monkeypatch):
    """The f32 fast path's sharded step obeys the same bounds."""
    ps, grid, ops = ops2d
    txt, nm = _lower_sharded_step(
        ops, grid, NumericsOptions(precision="float32"), monkeypatch
    )
    _audit(txt, nm, max_permutes=30)  # measured 24


def test_sharded_xla_path_step_no_gathers(ops2d, monkeypatch):
    """The sharding-transparent XLA path (use_pallas off) also stays
    gather-free: jnp.roll halos lower to edge-sized permutes."""
    ps, grid, ops = ops2d
    txt, nm = _lower_sharded_step(
        ops, grid, NumericsOptions(use_pallas=False), monkeypatch
    )
    _audit(txt, nm, max_permutes=280)  # measured 252 roll edges


def test_sharded_pc_bf16_psum_requests(ops2d, monkeypatch):
    """-pc_dtype bf16 under a sharded mesh routes the pc through the
    explicitly-sharded apply (linalg.make_sharded_block_apply): ONE
    psum per apply, REQUESTED on bf16 mode coefficients — the
    multi-chip wire-byte knob (VERDICT r3 #1).  The XLA:CPU backend of
    this virtual-mesh test legalizes a bf16 all-reduce through
    f32 converts (visible in the HLO), so the assertion pins the
    REQUEST — state-sized bf16 converts feeding the psums — which the
    TPU backend honors natively over ICI (bf16 collectives are the
    standard gradient-reduction path).  Since r5 this IS the default
    under a >1-device mesh (pc_dtype 'auto'; see the test above);
    this test pins the EXPLICIT -pc_dtype bf16 spelling and the
    one-psum-per-apply merge."""
    ps, grid, ops = ops2d
    txt16, nm16 = _lower_sharded_step(
        ops, grid, NumericsOptions(pc_dtype="bfloat16"), monkeypatch
    )
    _audit(txt16, nm16)
    # state-sized bf16 psum-request converts, one per M^{-1} apply
    psum_reqs = re.findall(
        r"bf16\[3,64,64\][^\n]*convert[^\n]*psum", txt16
    )
    applies = 4 * nm16.ksp_iters + 1
    assert len(psum_reqs) >= nm16.ksp_iters * 4, (
        len(psum_reqs), applies,
    )
    # and the explicitly-sharded apply merges the einsum path's
    # fwd/inv all-reduce pair: the per-step state-sized all-reduce
    # count stays at one-per-apply
    coll = collect_collectives(txt16)
    big_ar = [
        e for e, _ in coll.get("all-reduce", [])
        if e >= STATE_ELEMS // 2
    ]
    assert len(big_ar) <= applies, (len(big_ar), applies)
