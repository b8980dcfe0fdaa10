"""Multifrontal sparse LU tests: orderings, symbolic, numeric, solves.

UMFPACK-parity gates (SURVEY.md §4c, BASELINE config 3): residual-based
checks at 1e-10+ on Poisson operators, staged reuse, A^H mode, complex
shifted factorizations — the exact usage FEAST makes of the reference solver
(Feast.hs:210-218)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from sparse_linear_tpu.ops.linalg import spmv
from sparse_linear_tpu.solve import api as solve_api
from sparse_linear_tpu.solve import multifrontal as mf
from sparse_linear_tpu.solve.ordering import (
    nested_dissection_grid,
    rcm,
)
from sparse_linear_tpu.utils.grids import laplacian_1d, poisson_2d, poisson_3d
from tests.conftest import random_coo


def residual(a, x, b):
    return float(
        jnp.linalg.norm(spmv(a, x) - jnp.asarray(b)) / np.linalg.norm(b)
    )


# ----------------------------------------------------------------- orderings


def test_orderings_are_permutations():
    a = poisson_2d(8, dtype=np.float64)
    for perm in [
        nested_dissection_grid((8, 8)),
        rcm(np.asarray(a.indptr), np.asarray(a.indices), 64),
    ]:
        assert sorted(perm.tolist()) == list(range(64))


def test_nd_tree_shallower_than_natural():
    g = 32
    a = poisson_2d(g, dtype=np.float64)
    s_nat = mf.analyze(a, ordering="natural")
    s_nd = mf.analyze(a, dims=(g, g))
    # ND produces a balanced elimination forest; natural ordering a chain
    assert s_nd.schedule["height"] <= s_nat.schedule["height"]


def test_nested_dissection_general():
    """General-graph ND (native George-Liu level-set bisection, AMD leaves):
    valid permutations on degenerate graphs, lower fill than AMD on an
    unstructured (label-shuffled grid) pattern, and a working factor+solve
    through analyze(ordering='nd') without dims."""
    from sparse_linear_tpu.solve.ordering import amd, nested_dissection

    # degenerate graphs: path, star, empty
    def path_graph(nn):
        ip = np.zeros(nn + 1, np.int64)
        ix = []
        for i in range(nn):
            ix += [j for j in (i - 1, i + 1) if 0 <= j < nn]
            ip[i + 1] = len(ix)
        return ip, np.asarray(ix, np.int32)

    for ip, ix, nn in [
        (*path_graph(200), 200),
        (np.zeros(31, np.int64), np.zeros(0, np.int32), 30),  # no edges
    ]:
        p = nested_dissection(ip, ix, nn)
        assert sorted(p.tolist()) == list(range(nn))

    # shuffled 2D Poisson: structure hidden from the geometric path
    g = 32
    n = g * g
    a = poisson_2d(g, dtype=np.float64)
    sh = np.random.default_rng(0).permutation(n)
    ish = np.empty(n, dtype=np.int64)
    ish[sh] = np.arange(n)
    rows0 = np.repeat(np.arange(n), np.diff(np.asarray(a.indptr)))
    import sparse_linear_tpu as sl

    b_mat = sl.from_triples(
        (n, n), ish[rows0], ish[np.asarray(a.indices)], np.asarray(a.data)
    ).tocsr()
    ip, ix = np.asarray(b_mat.indptr), np.asarray(b_mat.indices)

    def front_volume(sym):
        return sum(
            len(b["sup_ids"]) * (b["Ns"] + b["Us"]) ** 2
            for b in sym.schedule["flat"]
        )

    vol_amd = front_volume(mf.analyze(b_mat, perm=amd(ip, ix, n)))
    sym_nd = mf.analyze(b_mat, ordering="nd")  # no dims -> general ND
    assert front_volume(sym_nd) < vol_amd  # ND cuts fill on mesh-like graphs
    f = mf.factor(b_mat, sym_nd, kind="cholesky")
    rhs = np.random.default_rng(1).standard_normal(n)
    x = mf.solve(f, jnp.asarray(rhs))
    assert residual(b_mat, x, rhs) < 1e-12


# ------------------------------------------------------------------- numeric


@pytest.mark.parametrize("ordering,dims", [("natural", None), ("rcm", None),
                                           ("nd", (12, 12))])
def test_poisson_solve_all_orderings(ordering, dims, rng):
    g = 12
    a = poisson_2d(g, dtype=np.float64)
    sym = mf.analyze(a, ordering=ordering, dims=dims)
    f = mf.factor(a, sym)
    b = rng.standard_normal(g * g)
    x = mf.solve(f, jnp.asarray(b))
    assert residual(a, x, b) < 1e-12


def test_poisson_3d(rng):
    a = poisson_3d(6, dtype=np.float64)  # 216 dof
    sym = mf.analyze(a, dims=(6, 6, 6))
    f = mf.factor(a, sym)
    b = rng.standard_normal(216)
    x = mf.solve(f, jnp.asarray(b))
    assert residual(a, x, b) < 1e-12


def test_laplacian_1d(rng):
    a = laplacian_1d(200, dtype=np.float64)
    sym = mf.analyze(a, dims=(200,))
    f = mf.factor(a, sym)
    b = rng.standard_normal(200)
    assert residual(a, mf.solve(f, jnp.asarray(b)), b) < 1e-12


@pytest.mark.slow
def test_unsymmetric_values_symmetric_pattern(rng):
    """LU (not Cholesky): unsymmetric values on a symmetric pattern."""
    g = 10
    a = poisson_2d(g, dtype=np.float64)
    # perturb off-diagonal values asymmetrically but keep diagonal dominance
    d = np.asarray(a.todense())
    pert = 0.3 * rng.standard_normal(d.shape) * (d != 0) * (1 - np.eye(g * g))
    d2 = d + pert
    a2 = sl.from_dense(d2)
    sym = mf.analyze(a2, dims=(g, g))
    f = mf.factor(a2, sym)
    b = rng.standard_normal(g * g)
    x = mf.solve(f, jnp.asarray(b))
    assert np.linalg.norm(d2 @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-11


def test_trans_solve(rng):
    g = 10
    a = poisson_2d(g, dtype=np.float64)
    d = np.asarray(a.todense())
    pert = 0.2 * rng.standard_normal(d.shape) * (d != 0) * (1 - np.eye(g * g))
    a2 = sl.from_dense(d + pert)
    f = mf.factor(a2, mf.analyze(a2, dims=(g, g)))
    b = rng.standard_normal(g * g)
    xt = mf.solve(f, jnp.asarray(b), trans=True)
    r = np.linalg.norm((d + pert).T @ np.asarray(xt) - b) / np.linalg.norm(b)
    assert r < 1e-11


@pytest.mark.slow
def test_staged_reuse_shifts(rng):
    """One symbolic, many numerics (the FEAST pattern) incl. complex shifts."""
    g = 8
    a = poisson_2d(g, dtype=np.float64)
    n = g * g
    i = sl.eye(n, dtype=jnp.float64)
    pattern = sl.lin(1.0 + 0j, i, -1.0 + 0j, a)
    sym = mf.analyze(pattern, dims=(g, g))
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    for z in [0.5 + 0.3j, 2.0 + 1.0j, -1.0 + 0.1j]:
        zb_a = sl.lin(z, i, -1.0 + 0.0j, a)
        f = mf.factor(zb_a, sym)
        x = mf.solve(f, jnp.asarray(b))
        assert residual(zb_a, x, b) < 1e-12
        xt = mf.solve(f, jnp.asarray(b), trans=True)
        assert residual(zb_a.ctrans().tocsr(), xt, b) < 1e-12


def test_multi_rhs(rng):
    g = 10
    a = poisson_2d(g, dtype=np.float64)
    f = mf.factor(a, mf.analyze(a, dims=(g, g)))
    bs = rng.standard_normal((g * g, 5))
    xs = mf.solve(f, jnp.asarray(bs))
    assert xs.shape == (g * g, 5)
    r = np.linalg.norm(
        np.asarray(a.todense()) @ np.asarray(xs) - bs
    ) / np.linalg.norm(bs)
    assert r < 1e-12


def test_pattern_mismatch_rejected(rng):
    a = poisson_2d(6, dtype=np.float64)
    sym = mf.analyze(a, dims=(6, 6))
    other = laplacian_1d(36, dtype=np.float64)
    with pytest.raises(ValueError, match="pattern"):
        mf.factor(other, sym)


def test_api_dispatch(rng):
    a = poisson_2d(8, dtype=np.float64)
    x = solve_api.linear_solve(
        a, jnp.asarray(rng.standard_normal(64)),
        backend="multifrontal", dims=(8, 8),
    )
    assert x.shape == (64,)


def test_random_spd_rcm(rng):
    """General (non-grid) SPD matrix through the RCM path."""
    n = 40
    m = rng.standard_normal((n, n)) * (rng.random((n, n)) < 0.15)
    spd = m @ m.T + n * np.eye(n)
    spd[np.abs(spd) < 1e-10] = 0.0
    a = sl.from_dense(spd)
    sym = mf.analyze(a, ordering="rcm")
    f = mf.factor(a, sym)
    b = rng.standard_normal(n)
    x = mf.solve(f, jnp.asarray(b))
    assert np.linalg.norm(spd @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-11


def test_iterative_refinement_mixed_precision(rng):
    """f32 factors + f64 refinement reach 1e-10 (the TPU accuracy path)."""
    g = 16
    a32 = poisson_2d(g, dtype=np.float32)
    a64 = poisson_2d(g, dtype=np.float64)
    f = mf.factor(a32, mf.analyze(a32, dims=(g, g)))
    b = rng.standard_normal(g * g)
    x, info = solve_api.solve_refined(f, a64, jnp.asarray(b), tol=1e-11)
    assert float(info.residual_norm) < 1e-11
    assert residual(a64, x, b) < 1e-10


# ----------------------------------------- indefinite / unsymmetric (UMFPACK
# robustness envelope, reference Internal.hs:69-148; VERDICT r1 item 4)


def _poisson_interior_shift(g):
    """sigma strictly inside the 2D Poisson spectrum, centred in the widest
    interior gap (analytic eigenvalues 4 - 2cos(i pi/(g+1)) - 2cos(j ...)),
    so A - sigma I is indefinite but safely nonsingular."""
    lam1 = 2.0 - 2.0 * np.cos(np.arange(1, g + 1) * np.pi / (g + 1))
    lam = np.sort((lam1[:, None] + lam1[None, :]).ravel())
    gaps = np.diff(lam)
    lo, hi = len(lam) // 3, 2 * len(lam) // 3
    k = lo + int(np.argmax(gaps[lo:hi]))
    return 0.5 * (lam[k] + lam[k + 1]), gaps[k]


@pytest.mark.slow
def test_indefinite_shifted_interior(rng):
    """A - sigma*I with sigma strictly inside the spectrum: restricted
    pivoting + refinement must still reach 1e-10."""
    g = 64
    a = poisson_2d(g, dtype=np.float64)
    sigma, gap = _poisson_interior_shift(g)
    assert gap > 1e-6
    ash = sl.lin(1.0, a, -sigma, sl.eye(g * g, dtype=jnp.float64)).tocsr()
    sym = mf.analyze(ash, dims=(g, g))
    f = mf.factor(ash, sym, pivot_eps=1e-10)
    b = rng.standard_normal(g * g)
    x, info = solve_api.solve_refined(f, ash, jnp.asarray(b), tol=1e-10)
    assert float(info.residual_norm) < 1e-10
    assert np.isfinite(float(info.residual_norm))


@pytest.mark.slow
def test_unsymmetric_convection_diffusion(rng):
    """Convection-dominated (genuinely unsymmetric) operator to 1e-10."""
    g = 48
    c = 1.2  # cell Peclet > 1: centered convection, not diagonally dominant
    rows, cols, vals = [], [], []
    for i in range(g):
        for j in range(g):
            k0 = i * g + j
            rows.append(k0), cols.append(k0), vals.append(4.0)
            if j > 0:
                rows.append(k0), cols.append(k0 - 1), vals.append(-1.0 - c)
            if j < g - 1:
                rows.append(k0), cols.append(k0 + 1), vals.append(-1.0 + c)
            if i > 0:
                rows.append(k0), cols.append(k0 - g), vals.append(-1.0 - c)
            if i < g - 1:
                rows.append(k0), cols.append(k0 + g), vals.append(-1.0 + c)
    a = sl.from_triples(
        (g * g, g * g), rows, cols, np.array(vals, dtype=np.float64)
    ).tocsr()
    sym = mf.analyze(a, dims=(g, g))
    f = mf.factor(a, sym, pivot_eps=1e-10)
    b = rng.standard_normal(g * g)
    x, info = solve_api.solve_refined(f, a, jnp.asarray(b), tol=1e-10)
    assert float(info.residual_norm) < 1e-10


def test_cholesky_breakdown_reported(rng):
    """Non-SPD input through the Cholesky path is REPORTED (breakdown flag,
    SURVEY.md §5 failure detection) instead of silently emitting NaNs."""
    g = 12
    a = poisson_2d(g, dtype=np.float64)
    ash = sl.lin(1.0, a, -4.0, sl.eye(g * g, dtype=jnp.float64)).tocsr()
    sym = mf.analyze(ash, dims=(g, g))
    f_bad = mf.factor(ash, sym, kind="cholesky")
    assert f_bad.breakdown
    assert f_bad.n_flagged > 0
    f_ok = mf.factor(a, mf.analyze(a, dims=(g, g)), kind="cholesky")
    assert not f_ok.breakdown


def test_solve_info_converged_flag(rng):
    """SolveInfo.converged distinguishes a healthy refined solve from a
    breakdown (NaN residual) on a singular operator."""
    g = 12
    a = poisson_2d(g, dtype=np.float64)
    sym = mf.analyze(a, dims=(g, g))
    b = rng.standard_normal(g * g)
    f_ok = mf.factor(a, sym)
    _, info_ok = solve_api.solve_refined(f_ok, a, jnp.asarray(b))
    assert info_ok.converged
    g2 = 32  # sigma=2 is an exact eigenvalue of the 32^2 Poisson operator
    a2_32 = poisson_2d(g2, dtype=np.float32)
    a2_64 = poisson_2d(g2, dtype=np.float64)
    ash32 = sl.lin(
        1.0, a2_32, -2.0, sl.eye(g2 * g2, dtype=jnp.float32)
    ).tocsr()
    ash64 = sl.lin(
        1.0, a2_64, -2.0, sl.eye(g2 * g2, dtype=jnp.float64)
    ).tocsr()
    f_bad = mf.factor(ash32, mf.analyze(ash32, dims=(g2, g2)))
    _, info_bad = solve_api.solve_refined(
        f_bad, ash64, jnp.asarray(rng.standard_normal(g2 * g2)),
        max_iter=6,
    )
    assert not info_bad.converged


def test_pivot_eps_flags_near_singular(rng):
    """Static pivot perturbation fires (and is counted) on a singular
    shift, and the perturbed factorization stays finite."""
    g = 16
    a = poisson_2d(g, dtype=np.float64)
    lam1 = 2.0 - 2.0 * np.cos(np.arange(1, g + 1) * np.pi / (g + 1))
    sigma = float(lam1[g // 2] * 2.0)  # an exact eigenvalue: singular shift
    ash = sl.lin(1.0, a, -sigma, sl.eye(g * g, dtype=jnp.float64)).tocsr()
    sym = mf.analyze(ash, dims=(g, g))
    f = mf.factor(ash, sym, pivot_eps=1e-8)
    assert f.n_flagged > 0
    for blk in f.blocks.values():
        for v in blk.values():
            assert np.all(np.isfinite(np.asarray(v)))
