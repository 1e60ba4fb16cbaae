"""Tests for ligand groups and SolutionParameters."""

import math

import pytest
import sympy as sy

from ksfd_tpu import KSFDException, LigandGroups, SolutionParameters
from helpers import make_clargs, OPTIONS92_PARAMS


def test_ligand_groups_from_params():
    clargs = make_clargs(params=OPTIONS92_PARAMS)
    groups = LigandGroups(clargs)
    assert len(groups.groups) == 2
    assert groups.nligands() == 2
    names = list(groups.names())
    assert names == ["U_1_1", "U_2_1"]


def test_group_potential_expression():
    groups = LigandGroups(ngroups=2)
    g1, g2 = groups.groups
    g1.alpha, g1.beta = 1500.0, 5.56e-4
    g2.alpha, g2.beta = 1500.0, -5.56e-4
    U1, U2 = sy.symbols("U1 U2")
    V = groups.V([U1, U2])
    expected = -5.56e-4 * sy.log(1500.0 + U1) + 5.56e-4 * sy.log(1500.0 + U2)
    diff = (V - expected).subs({U1: 123.0, U2: 4567.0})
    assert abs(float(diff)) < 1e-15


def test_potential_wrong_count_raises():
    groups = LigandGroups(ngroups=1)
    with pytest.raises(KSFDException):
        groups.V([1.0, 2.0])


def test_fourier_series_expansion():
    groups = LigandGroups(ngroups=1)
    lig = groups.groups[0].ligands[0]
    lig.s, lig.gamma, lig.D = 0.01, 0.01, 1e-6
    lig.series, lig.depth = 3, 0.4
    groups.fourier_series()
    ligs = groups.groups[0].ligands
    assert len(ligs) == 3
    assert groups.nligands() == 3
    # component i decays faster by D*(pi*i/depth)**2
    for i, l in enumerate(ligs):
        omega = math.pi * i / 0.4
        assert float(l.gamma) == pytest.approx(0.01 + 1e-6 * omega**2)
    # steady-state total conc adjusted to match the single ligand
    ss = sum(float(l.s / l.gamma) for l in ligs)
    assert ss == pytest.approx(0.01 / 0.01)
    # names renumbered
    assert [l.name() for l in ligs] == ["U_1_1", "U_1_2", "U_1_3"]


def test_solution_parameters_options92():
    ps = SolutionParameters(make_clargs(params=OPTIONS92_PARAMS))
    assert ps.dim == 1
    assert ps.nwidth == 128
    assert ps.nligands == 2
    v0 = ps.values0
    # s2 = sigma**2/2 resolved through the dependency DAG
    assert v0["s2"] == pytest.approx(0.02357**2 / 2)
    assert v0["alpha_1"] == 1500
    assert v0["beta_2"] == -5.56e-4
    # rho0 stays a spatial expression
    assert sy.Symbol("x") in ps.values0["rho0"].free_symbols
    # 't' is always time-dependent
    assert "t" in ps.tdfuncs


def test_solution_parameters_time_dependent():
    ps = SolutionParameters(
        make_clargs(params=["foo=2*t", "bar=3*foo", "baz=4.0"])
    )
    assert "foo" in ps.tdfuncs and "bar" in ps.tdfuncs
    assert "baz" not in ps.tdfuncs
    vals = ps.values(2.0)
    assert vals["foo"] == 4.0
    assert vals["bar"] == 12.0
    # JAX-traceable version agrees
    import jax

    f = jax.jit(ps.td_jax["bar"])
    assert float(f(2.0)) == pytest.approx(12.0)


def test_solution_parameters_cycle_raises():
    with pytest.raises(KSFDException):
        SolutionParameters(make_clargs(params=["p1=2*p2", "p2=2*p1"]))


def test_potential_function_tophat():
    ps = SolutionParameters(make_clargs(params=OPTIONS92_PARAMS))
    U1, U2, rho = sy.symbols("U1 U2 rho")
    V = ps.V([U1, U2], rho, params=ps.values0)
    s2 = 0.02357**2 / 2
    expected = (
        -5.56e-4 * sy.log(1500 + U1)
        + 5.56e-4 * sy.log(1500 + U2)
        + 2.0 * s2 * (sy.tanh((rho - 28000) / 2000) + 1)
    )
    assert abs(float((V - expected).subs({U1: 9000, U2: 9000, rho: 9000}))) < 1e-12


def test_nelements_shortcut_and_override():
    ps = SolutionParameters(make_clargs(params=["nelements=64", "nwidth=32"]))
    assert ps.nwidth == 32
    assert ps.nheight == 64


def test_ligand_group_collect():
    """collect() builds complete ligands from (group, value) pairs."""
    from ksfd_tpu import LigandGroup

    g = LigandGroup()
    g.alpha, g.beta = 1500.0, 5.56e-4
    g.collect([(1, 0.01), (1, 0.02)], "s", groupnum=1)
    g.collect([(1, 0.1), (1, 0.2)], "gamma", groupnum=1)
    assert g.nligands == 2
    assert [l.name() for l in g.ligands] == ["U_1_1", "U_1_2"]
    assert [l.s for l in g.ligands] == [0.01, 0.02]
    assert [l.gamma for l in g.ligands] == [0.1, 0.2]
    # untouched parameters keep their defaults
    assert all(l.D == 1.0 and l.weight == 1.0 for l in g.ligands)
    assert all(l.alpha == 1500.0 for l in g.ligands)


def test_multi_ligand_group():
    """A group with nligands_g > 1 keeps a consistent count and V().

    Regression: the count attribute used to be clobbered back to the
    default 1, so V() rejected the correct number of concentrations.
    """
    clargs = make_clargs(
        params=["ngroups=1", "nligands_1=2", "s_1_2=0.02", "weight_1_2=0.5"]
    )
    groups = LigandGroups(clargs)
    g = groups.groups[0]
    assert g.nligands == 2 and groups.nligands() == 2
    assert list(groups.names()) == ["U_1_1", "U_1_2"]
    U1, U2 = sy.symbols("U1 U2")
    V = groups.V([U1, U2])
    assert sy.Symbol("U1") in V.free_symbols
    assert sy.Symbol("U2") in V.free_symbols
    # and the full SolutionParameters path resolves the per-ligand params
    ps = SolutionParameters(clargs)
    assert ps.nligands == 2
    ligs = list(ps.groups.ligands())
    assert float(ligs[1].s) == 0.02 and float(ligs[1].weight) == 0.5


def test_nligands_assignment_resizes():
    from ksfd_tpu import LigandGroup

    g = LigandGroup(groupnum=2, nligands=1)
    g.alpha = 99.0
    g.nligands = 3
    assert len(g.ligands) == 3
    assert [l.name() for l in g.ligands] == ["U_2_1", "U_2_2", "U_2_3"]
    assert all(l.alpha == 99.0 for l in g.ligands)
    g.nligands = 2
    assert len(g.ligands) == 2
