"""Staged direct-solver API: analyze -> factor -> solve.

Reproduces the capability of the reference's UMFPACK layer
(reference: suitesparse/src/Numeric/LinearAlgebra/Umfpack.hs):

* ``analyze``  (:60-69)  — symbolic analysis, reusable across all numeric
  factorizations with the same pattern ("the shape of the result never
  changes", feast/src/.../Feast.hs:210-212).
* ``factor``   (:71-83)  — numeric factorization into a reusable artifact.
* ``solve``    (:85-102) — triangular solves; ``trans`` selects A x = b
  (UmfpackNormal, sys=0), A^H x = b (UmfpackTrans, sys=1), or — beyond the
  two modes the reference binds — the plain transpose A^T x = b
  (``trans="T"``, UMFPACK sys=2 / UMFPACK_Aat).
* ``linear_solve`` / ``solve_many`` (:38-46) and the ``<\\>`` operator
  (:48-50) as the one-shot convenience path — but batched over RHS via a
  single dense solve instead of the reference's serial list traversal.

Unlike the reference's opaque C pointers with finalizers (Umfpack.hs:65,76),
artifacts here are pytrees of device arrays: they jit, vmap (batch over
shifted factorizations — the FEAST pattern), shard, and serialize.

Backends:
  * ``dense``        — pivoted dense LU on the MXU (jax.scipy lu_factor).
    Right for fronts and small/medium n; memory O(n^2).
  * ``multifrontal`` — supernodal multifrontal sparse LU
    (sparse_linear_tpu.solve.multifrontal): host symbolic analysis, batched
    dense frontal kernels on device.

Status/error reporting follows SURVEY.md §5: a structured ``SolveInfo``
instead of printed status codes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.formats.base import pytree_dataclass
from sparse_linear_tpu.ops.linalg import spmv, spmm

__all__ = [
    "analyze",
    "factor",
    "solve",
    "solve_many",
    "solve_part",
    "SOLVE_PART_SYS",
    "solve_refined",
    "factor_batched",
    "solve_batched",
    "linear_solve",
    "slogdet",
    "det",
    "rcond",
    "get_factors",
    "lunz",
    "condest",
    "solve_gmres",
    "SolveInfo",
]


def _trans_mode(trans) -> str:
    """Normalize a ``trans`` argument to one of "N"/"H"/"T".

    Accepts the reference's two modes as booleans (False = UmfpackNormal /
    sys=0, True = UmfpackTrans / sys=1 = A^H) plus the string spellings,
    and adds UMFPACK's sys=2 (UMFPACK_Aat: plain transpose A^T x = b,
    umfpack.h — the reference binds only sys=0/1, Umfpack.hs:85-102).
    For real data "T" and "H" coincide."""
    if trans is False or trans is None:
        return "N"
    if trans is True:
        return "H"
    mode = str(trans).upper()
    if mode in ("N", "H", "T"):
        return mode
    raise ValueError(
        f"trans must be False/'N', True/'H', or 'T', got {trans!r}"
    )


class SolveInfo(NamedTuple):
    residual_norm: jax.Array
    refinement_steps: int
    tol: float = float("nan")

    @property
    def converged(self) -> bool:
        """True when the refined RELATIVE residual is finite and met the
        requested tolerance (SURVEY.md §5 failure detection: NaN/inf or a
        large residual means the factorization broke down — singular
        operator, indefinite input through the Cholesky path — or the
        refinement stalled, and the solution must not be trusted)."""
        v = float(jnp.asarray(self.residual_norm))
        gate = self.tol if np.isfinite(self.tol) else 1e-6
        return bool(np.isfinite(v) and v <= gate)


@pytree_dataclass(meta_fields=("n", "backend", "meta"))
class Symbolic:
    """Reusable symbolic-analysis artifact (reference ``Analysis``,
    Umfpack.hs:56,60-69)."""

    n: int
    backend: str
    meta: object = None  # backend-specific static data (hashable)


@pytree_dataclass(meta_fields=("n", "backend"))
class Factors:
    """Numeric factorization artifact (reference ``Factors``,
    Umfpack.hs:58,71-83).  A pytree: payload are device arrays."""

    payload: object
    n: int
    backend: str


def analyze(mat, backend: str = "dense", **opts) -> Symbolic:
    """Symbolic analysis of the pattern (reference ``analyze``,
    Umfpack.hs:60-69).  ``opts`` pass through to the backend (multifrontal:
    ordering=..., dims=..., relax_small=..., relax_frac=...)."""
    nr, nc = mat.shape
    if nr != nc:
        raise ValueError(f"analyze: matrix must be square, got {mat.shape}")
    if backend == "dense":
        return Symbolic(n=nr, backend="dense")
    if backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.analyze(mat, **opts)
    raise ValueError(f"unknown backend: {backend}")


def factor(mat, symbolic: Symbolic | None = None, backend: str = "dense",
           kind: str = "lu", **opts) -> Factors:
    """Numeric factorization (reference ``factor``, Umfpack.hs:71-83).

    ``kind`` (multifrontal backend): "lu" for general matrices or
    "cholesky" for SPD ones (3-7x faster fronts on TPU).
    ``scale`` (multifrontal backend): "sum"/"max" equilibration — UMFPACK's
    default row scaling (umfpack.h UMFPACK_SCALE_SUM); dense LAPACK LU
    pivots fully and takes no scale option.
    Jit-compatible for the dense backend (matrix values may be traced)."""
    if symbolic is None:
        symbolic = analyze(mat, backend=backend,
                           **{k: v for k, v in opts.items()
                              if k not in ("mesh", "batch_axis", "pivot_eps",
                                           "scale")})
    if symbolic.backend == "dense":
        if opts.get("scale", "none") != "none":
            raise ValueError(
                "scale= equilibration is a multifrontal-backend option "
                "(dense LAPACK LU pivots fully)"
            )
        a = mat.todense()
        lu, piv = jax.scipy.linalg.lu_factor(a)
        return Factors(payload=(lu, piv), n=symbolic.n, backend="dense")
    if symbolic.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.factor(
            mat, symbolic, kind=kind,
            **{k: v for k, v in opts.items()
               if k in ("mesh", "batch_axis", "pivot_eps", "scale")},
        )
    raise ValueError(f"unknown backend: {symbolic.backend}")


def solve(factors: Factors, b, trans: bool = False):
    """Triangular solves on an existing factorization (reference
    ``linearSolve_``, Umfpack.hs:85-102).  ``trans=True`` (or "H") solves
    A^H x = b (UmfpackTrans / sys=1); ``trans="T"`` solves the plain
    transpose A^T x = b (UMFPACK sys=2, beyond the two modes the reference
    binds).  All modes reuse the same factorization, exactly as FEAST's
    ijob=20 is a no-op (Feast.hs:226)."""
    b = jnp.asarray(b)
    mode = _trans_mode(trans)
    if mode == "T":
        # A^T x = b  <=>  A^H conj(x) = conj(b): one conjugated H-solve.
        # For real dtypes conj is the identity and this is exactly "H".
        return jnp.conj(solve(factors, jnp.conj(b), trans="H"))
    do_h = mode == "H"
    if factors.backend == "dense":
        lu, piv = factors.payload
        # lu_solve trans: 0 = A x = b, 2 = A^H x = b — both reuse (lu, piv)
        return jax.scipy.linalg.lu_solve((lu, piv), b, trans=2 if do_h else 0)
    if factors.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.solve(factors, b, trans=do_h)
    raise ValueError(f"unknown backend: {factors.backend}")


def solve_many(factors: Factors, bs, trans: bool = False):
    """Batched multi-RHS solve: ``bs`` of shape (n, k).  The reference solves
    RHS serially (Umfpack.hs:43-46, Feast.hs:197-201); here the batch is one
    device call (build component P2, SURVEY.md §2.4)."""
    return solve(factors, bs, trans=trans)


SOLVE_PART_SYS = ("Pt_L", "L", "Lt_P", "Lat_P", "Lt", "Lat",
                  "U_Qt", "U", "Ut_Q", "Uat_Q", "Ut", "Uat")


def solve_part(factors: Factors, b, sys: str):
    """Partial solves with the stored factors — the rest of UMFPACK's
    ``umfpack_*_solve`` subsystem surface (sys codes UMFPACK_Pt_L ..
    UMFPACK_Uat, umfpack.h; the reference binds only sys=0/1,
    Internal.hs:141-142).  ``sys`` is spelled after the UMFPACK constant
    with the ``UMFPACK_`` prefix dropped; systems are defined over
    ``get_factors``'s exported (L, U, row_perm, col_perm), e.g.
    ``sys="Pt_L"`` solves P^T L x = b and ``sys="U_Qt"`` solves
    U Q^T x = b.  ``t`` = conjugate transpose, ``at`` = plain ("array")
    transpose, matching UMFPACK's naming.  Like UMFPACK, the factors are
    used AS STORED (no equilibration scaling is applied)."""
    if sys not in SOLVE_PART_SYS:
        raise ValueError(
            f"solve_part: unknown sys {sys!r} (expected one of "
            f"{SOLVE_PART_SYS})")
    if factors.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.solve_part(factors, b, sys)
    if factors.backend != "dense":
        raise ValueError(f"unknown backend: {factors.backend}")
    if sys in ("Lat", "Lat_P", "Uat", "Uat_Q"):
        x = solve_part(factors, jnp.conj(jnp.asarray(b)),
                       {"Lat": "Lt", "Lat_P": "Lt_P", "Uat": "Ut",
                        "Uat_Q": "Ut_Q"}[sys])
        return jnp.conj(x)
    lu, piv = factors.payload
    if getattr(factors, "batch", None) is not None:
        raise ValueError("solve_part: batched factors are not supported — "
                         "index one value-set out first")
    b = jnp.asarray(b)
    if b.shape[0] != lu.shape[-1]:
        # validate before indexing with rp/irp: JAX gather clipping would
        # otherwise turn a wrong-length rhs into silently wrong answers
        raise ValueError(
            f"solve_part: rhs has {b.shape[0]} rows, expected {lu.shape[-1]}")
    # LAPACK ipiv (sequential swaps) -> row order rp with A[rp] = L U
    piv_np = np.asarray(piv)
    n = lu.shape[-1]
    rp = np.arange(n)
    for i, pi in enumerate(piv_np):
        rp[[i, pi]] = rp[[pi, i]]
    irp = np.empty(n, dtype=np.int64)
    irp[rp] = np.arange(n)
    tri = jax.scipy.linalg.solve_triangular
    if sys == "Pt_L":
        return tri(lu, b[rp], lower=True, unit_diagonal=True)
    if sys == "L":
        return tri(lu, b, lower=True, unit_diagonal=True)
    if sys == "Lt":
        return tri(lu, b, lower=True, unit_diagonal=True, trans="C")
    if sys == "Lt_P":
        return tri(lu, b, lower=True, unit_diagonal=True, trans="C")[irp]
    if sys in ("U", "U_Qt"):       # col_perm is identity for dense LU
        return tri(lu, b, lower=False)
    # "Ut" / "Ut_Q" (col_perm identity)
    return tri(lu, b, lower=False, trans="C")


def factor_batched(pattern_mat, data_stack, symbolic: Symbolic,
                   kind: str = "lu", scale: str = "none"):
    """Batched numeric factorization of many value-sets over one pattern
    (contour parallelism P3; SURVEY.md §2.4).  ``data_stack``: (ne, nnz)
    values in the canonical entry order of ``pattern_mat``.  ``kind`` and
    ``scale`` (equilibration) apply on the multifrontal backend."""
    import jax.numpy as jnp

    data_stack = jnp.asarray(data_stack)
    if symbolic.backend == "dense":
        if scale != "none":
            raise ValueError(
                "scale= equilibration is a multifrontal-backend option "
                "(dense LAPACK LU pivots fully)"
            )
        from sparse_linear_tpu.ops.build import trim as _trim

        m = _trim(pattern_mat.tocsr())
        rows, cols = m.row_ids(), m.indices
        n = symbolic.n
        ne = data_stack.shape[0]
        dense = jnp.zeros((ne, n, n), data_stack.dtype).at[:, rows, cols].add(
            data_stack, mode="drop"
        )
        lu, piv = jax.vmap(jax.scipy.linalg.lu_factor)(dense)
        out = Factors(payload=(lu, piv), n=n, backend="dense")
        object.__setattr__(out, "batch", ne)
        return out
    if symbolic.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.factor_batched(data_stack, symbolic,
                                           kind=kind, scale=scale)
    raise ValueError(f"unknown backend: {symbolic.backend}")


def solve_batched(factors, b_stack, trans: bool = False):
    """Solves on batched factors: (ne, n, k) -> (ne, n, k)."""
    import jax.numpy as jnp

    b_stack = jnp.asarray(b_stack)
    mode = _trans_mode(trans)
    if mode == "T":
        return jnp.conj(solve_batched(factors, jnp.conj(b_stack), trans="H"))
    trans = mode == "H"
    if factors.backend == "dense":
        lu, piv = factors.payload
        return jax.vmap(
            lambda l, p, b: jax.scipy.linalg.lu_solve(
                (l, p), b, trans=2 if trans else 0
            )
        )(lu, piv, b_stack)
    if factors.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.solve_batched(factors, b_stack, trans=trans)
    raise ValueError(f"unknown backend: {factors.backend}")


def linear_solve(mat, bs, backend: str = "dense", trans: bool = False,
                 **opts):
    """One-shot: factor once, solve all RHS (reference ``linearSolve``,
    Umfpack.hs:38-46 and ``<\\>`` :48-50)."""
    f = factor(mat, backend=backend, **opts)
    return solve_many(f, bs, trans=trans)


def _op_and_trans(mat, trans):
    """Residual operator + factor-solve trans flag for a requested mode:
    the refinement entry points compute residuals against A / A^H / A^T and
    back-solve in the matching mode on the same factors."""
    mode = _trans_mode(trans)
    op = {"N": lambda: mat,
          "H": lambda: mat.ctrans().tocsr(),
          "T": lambda: mat.T.tocsr()}[mode]()
    return op, {"N": False, "H": True, "T": "T"}[mode]


def solve_refined(factors: Factors, mat, b, trans: bool = False,
                  tol: float = 1e-10, max_iter: int = 20,
                  residual_dtype=jnp.float64):
    """Mixed-precision iterative refinement (Wilkinson): solve with the
    (possibly low-precision) factors, then correct with residuals computed
    in ``residual_dtype``.

    The TPU-native accuracy path: the MXU factors in f32, the residual SpMV
    streams in (emulated) f64, and refinement recovers ~f64 backward error
    whenever kappa(A) * eps_f32 < 1.  Returns (x, SolveInfo).
    """
    b = jnp.asarray(b)
    op, trans = _op_and_trans(mat, trans)
    hi = jnp.promote_types(residual_dtype, b.dtype)
    b_hi = b.astype(hi)
    bnorm = jnp.maximum(jnp.linalg.norm(b_hi), jnp.finfo(hi).tiny)
    x = solve(factors, b, trans=trans).astype(hi)
    steps = 0
    rnorm = jnp.inf
    for it in range(max_iter):
        ax = spmm(op, x) if x.ndim == 2 else spmv(op, x)
        r = b_hi - ax
        rnorm = jnp.linalg.norm(r) / bnorm
        steps = it
        if float(rnorm) <= tol:
            break
        dx = solve(factors, r.astype(b.dtype), trans=trans)
        x = x + dx.astype(hi)
    return x, SolveInfo(residual_norm=rnorm, refinement_steps=steps,
                        tol=float(tol))


def solve_gmres(factors: Factors, mat, b, trans: bool = False,
                tol: float = 1e-10, restart: int = 30,
                max_outer: int = 10, residual_dtype=jnp.float64):
    """Right-preconditioned (F)GMRES with the factorization as the
    preconditioner — the fallback when stationary refinement
    (``solve_refined``) stalls: GMRES converges whenever the preconditioned
    spectrum is clustered, even if the refinement iteration matrix has
    spectral radius >= 1 (statically perturbed pivots on indefinite
    systems, aggressive ``pivot_eps``).

    Each inner step costs one factor solve + one SpMV in
    ``residual_dtype``; the Arnoldi recurrence runs on host in f64 (the
    basis is (restart+1) device vectors).  Returns (x, SolveInfo)."""
    b = jnp.asarray(b)
    if b.ndim != 1:
        raise ValueError("solve_gmres: expected a single RHS (n,); loop "
                         "columns or use solve_refined for blocks")
    op, trans = _op_and_trans(mat, trans)
    hi = jnp.promote_types(residual_dtype, b.dtype)
    b_hi = b.astype(hi)
    bnorm = float(jnp.linalg.norm(b_hi))
    if bnorm == 0.0:
        return jnp.zeros_like(b_hi), SolveInfo(
            residual_norm=jnp.zeros((), hi), refinement_steps=0,
            tol=float(tol))
    cplx = np.issubdtype(np.dtype(hi), np.complexfloating)
    hdt = np.complex128 if cplx else np.float64

    def psolve(v):
        return solve(factors, v.astype(b.dtype), trans=trans).astype(hi)

    x = psolve(b_hi)
    rnorm = np.inf
    steps = 0
    for _ in range(max_outer):
        r = b_hi - spmv(op, x)
        beta = float(jnp.linalg.norm(r))
        rnorm = beta / bnorm
        if rnorm <= tol:
            break
        v = [r / beta]
        z = []
        h = np.zeros((restart + 1, restart), dtype=hdt)
        j_used = 0
        for j in range(restart):
            zj = psolve(v[j])
            z.append(zj)
            w = spmv(op, zj)
            for i in range(j + 1):
                hij = complex(jnp.vdot(v[i], w)) if cplx else float(
                    jnp.vdot(v[i], w))
                h[i, j] = hij
                w = w - hij * v[i]
            hlast = float(jnp.linalg.norm(w))
            h[j + 1, j] = hlast
            j_used = j + 1
            steps += 1
            # small-residual estimate via the Arnoldi least-squares problem
            e1 = np.zeros(j_used + 1, dtype=hdt)
            e1[0] = beta
            y, res_ls, *_ = np.linalg.lstsq(h[: j_used + 1, :j_used], e1,
                                            rcond=None)
            est = float(np.linalg.norm(
                e1 - h[: j_used + 1, :j_used] @ y))
            if est / bnorm <= tol or hlast == 0.0:
                break
            v.append(w / hlast)
        e1 = np.zeros(j_used + 1, dtype=hdt)
        e1[0] = beta
        y, *_ = np.linalg.lstsq(h[: j_used + 1, :j_used], e1, rcond=None)
        for i in range(j_used):
            x = x + y[i] * z[i]
    r = b_hi - spmv(op, x)
    rnorm = float(jnp.linalg.norm(r)) / bnorm
    return x, SolveInfo(residual_norm=jnp.asarray(rnorm),
                        refinement_steps=steps, tol=float(tol))


def slogdet(factors: Factors):
    """(sign, logabsdet) of the factored operator, from its LU/Cholesky
    pivots — UMFPACK's ``umfpack_*_get_determinant`` capability (umfpack.h;
    it returns mantissa + exponent for the same overflow reason slogdet
    exists).  The reference binds only the solve entry points
    (Internal.hs:69-148); this extends toward UMFPACK's full API surface.
    Host-side query; batched factors return (ne,) arrays."""
    if factors.backend == "dense":
        lu, piv = factors.payload
        lu_np = np.asarray(lu)
        piv_np = np.asarray(piv)
        d = np.diagonal(lu_np, axis1=-2, axis2=-1)
        with np.errstate(invalid="ignore", divide="ignore"):
            logabs = np.sum(np.log(np.abs(d)), axis=-1)
            unit = np.where(d == 0, 1.0, d / np.abs(d))
        sign = np.prod(unit, axis=-1)
        # LAPACK ipiv: row i was swapped with piv[i]; each non-fixed entry
        # is one executed transposition
        n = piv_np.shape[-1]
        swaps = np.sum(piv_np != np.arange(n), axis=-1)
        sign = sign * np.where(swaps % 2, -1.0, 1.0)
        # numpy slogdet convention: singular -> sign 0 (complex included)
        sign = np.where(logabs == -np.inf, 0.0 * sign, sign)
        return sign, logabs
    if factors.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.slogdet(factors)
    raise ValueError(f"unknown backend: {factors.backend}")


def det(factors: Factors):
    """Determinant of the factored operator (overflow-prone at scale — use
    ``slogdet`` for large n, exactly why UMFPACK's API splits mantissa and
    exponent)."""
    sign, logabs = slogdet(factors)
    with np.errstate(over="ignore", invalid="ignore"):
        return sign * np.exp(logabs)


def rcond(factors: Factors):
    """Cheap reciprocal-condition estimate min|U_ii| / max|U_ii| — the
    ``Info[UMFPACK_RCOND]`` statistic UMFPACK reports after every numeric
    factorization (umfpack.h).  0 means numerically singular; pair small
    values with ``solve_refined`` and check ``SolveInfo.converged``."""
    if factors.backend == "dense":
        lu, _ = factors.payload
        d = np.abs(np.diagonal(np.asarray(lu), axis1=-2, axis2=-1))
        dmax = d.max(axis=-1)
        return np.where(
            dmax > 0,
            d.min(axis=-1) / np.maximum(dmax, np.finfo(np.float64).tiny),
            0.0,
        )
    if factors.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.rcond(factors)
    raise ValueError(f"unknown backend: {factors.backend}")


def condest(factors: Factors, mat, itmax: int = 5):
    """1-norm condition estimate kappa_1(A) ~= ||A||_1 * est(||A^-1||_1)
    via the Hager-Higham power method on the factor solves (the LAPACK
    ``gecon``-class diagnostic; a sharper companion to the pivot-ratio
    ``rcond`` UMFPACK reports in Info).  Each iteration costs one solve
    with A and one with A^H — both reuse the factorization.  The estimate
    is a lower bound on kappa_1, in practice within a small factor."""
    if getattr(factors, "batch", None) is not None:
        raise ValueError(
            "condest: batched factors are not supported — estimate each "
            "value-set on its own (unbatched) factorization"
        )
    n = factors.n
    csr = mat.tocsr()
    data = np.abs(np.asarray(csr.data))
    colsums = np.zeros(n)
    np.add.at(colsums, np.asarray(csr.indices), data)
    anorm = float(colsums.max()) if n else 0.0

    dt = jnp.asarray(csr.data).dtype
    x = jnp.full((n,), 1.0 / n, dtype=dt)
    est = 0.0
    prev_j = -1
    for _ in range(max(1, itmax)):
        y = solve(factors, x)
        # ||x||_1 == 1 throughout, so est = ||A^-1 x||_1 is always a valid
        # lower bound on ||A^-1||_1 — the loop only sharpens it
        est = max(est, float(jnp.sum(jnp.abs(y))))
        absy = jnp.abs(y)
        xi = jnp.where(absy == 0, 1.0, y / jnp.where(absy == 0, 1.0, absy))
        z = np.asarray(solve(factors, xi.astype(dt), trans="H"))
        zabs = np.abs(z)
        j = int(np.argmax(zabs))
        if zabs[j] <= float(np.real(np.vdot(z, np.asarray(x)))) or j == prev_j:
            break
        prev_j = j
        x = jnp.zeros((n,), dt).at[j].set(1.0)
    return anorm * est


def get_factors(factors: Factors, index: int | None = None):
    """Export the triangular factors as sparse matrices — UMFPACK's
    ``umfpack_*_get_numeric`` capability (umfpack.h; the reference binds
    only the opaque solve entry points, Internal.hs:69-148).

    Returns ``(L, U, row_perm, col_perm)`` with L unit-lower / U upper CSR
    (Cholesky: L non-unit, U = L^H) satisfying

        (L @ U).todense() == A.todense()[np.ix_(row_perm, col_perm)]

    ``index`` selects one value-set of a batched artifact.  Host-side
    introspection/interop API."""
    if factors.backend == "dense":
        from sparse_linear_tpu.formats.matrix import from_triples

        lu, piv = factors.payload
        ne = getattr(factors, "batch", None)
        if ne is not None and index is None:
            raise ValueError(
                f"get_factors: batched factors — pass index in [0, {ne})"
            )
        lu_np = np.asarray(lu)
        piv_np = np.asarray(piv)
        if ne is not None:
            lu_np, piv_np = lu_np[index], piv_np[index]
        n = lu_np.shape[-1]
        l_np = np.tril(lu_np, -1) + np.eye(n, dtype=lu_np.dtype)
        u_np = np.triu(lu_np)
        # LAPACK ipiv (sequential swaps) -> row order: A[row_perm] = L U
        row_perm = np.arange(n)
        for i, pi in enumerate(piv_np):
            row_perm[[i, pi]] = row_perm[[pi, i]]

        def to_csr(d):
            r, c = np.nonzero(d)
            return from_triples((n, n), r, c, d[r, c]).tocsr()

        return to_csr(l_np), to_csr(u_np), row_perm, np.arange(n)
    if factors.backend == "multifrontal":
        from sparse_linear_tpu.solve import multifrontal

        return multifrontal.get_factors(factors, index=index)
    raise ValueError(f"unknown backend: {factors.backend}")


def lunz(factors: Factors, index: int | None = None):
    """(lnz, unz): stored entries of the exported L and U — UMFPACK's
    ``umfpack_*_get_lunz`` (umfpack.h)."""
    L, U, _, _ = get_factors(factors, index=index)
    return int(L.nnz), int(U.nnz)


def residual_norm(mat, x, b, trans: bool = False):
    """||Ax - b|| / ||b|| (or A^H / A^T per ``trans``), for SolveInfo
    reporting."""
    mode = _trans_mode(trans)
    op = {"N": lambda: mat,
          "H": lambda: mat.ctrans(),
          "T": lambda: mat.T.tocsr()}[mode]()
    x = jnp.asarray(x)
    ax = spmm(op, x) if x.ndim == 2 else spmv(op, x)
    b = jnp.asarray(b)
    return jnp.linalg.norm(ax - b) / jnp.maximum(
        jnp.linalg.norm(b), jnp.finfo(b.dtype).tiny
    )
