"""FEAST-style contour-integral interval eigensolver, TPU-native.

Replaces the reference's binding to the FEAST Fortran library
(reference: feast/src/Numeric/LinearAlgebra/Feast.hs:115-240 and
Feast/Internal.hs:24-79).  The reference drives FEAST through its
reverse-communication (RCI) protocol — control ping-pongs Haskell <-> Fortran
on every ijob event (Feast.hs:220-232).  Here the loop is *owned natively*
(SURVEY.md §7 "RCI inversion"): quadrature nodes/weights are computed
directly, the shifted solves are batched, the reduced Rayleigh-Ritz problem
is a dense eigh, and the convergence loop is plain code.

RCI event mapping (Feast.hs:224-229):
  ijob=10 (factorize zB - A)   -> one factorization per contour node, done
                                  ONCE up front and reused across all
                                  refinement loops (the reference re-factors
                                  every loop; we cache — symbolic is shared
                                  anyway, cf. Feast.hs:210-218)
  ijob=11 (solve)              -> batched multi-RHS solve (P2 parallelism)
  ijob=20/21 (A^H solve)       -> solve(..., trans=True) on the same factors
                                  (for Hermitian pencils (zB-A)^H = conj(z)B-A,
                                  which covers the lower semicircle nodes)
  ijob=30/40 (A@X / B@X)       -> spmm
  fpm parameter array          -> FeastParams dataclass
  info codes (Feast.hs:246-258)-> EigResult.info + structured diagnostics

Accuracy gate: the analytic 2x2 problem at 1e-10 relative error
(feast/tests/test-feast.hs:14-32) is part of the test suite.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import complex_of, is_complex
from sparse_linear_tpu.ops.linalg import lin, spmm
from sparse_linear_tpu.solve import api as solve_api

__all__ = ["FeastParams", "EigResult", "eigsh", "geigsh", "INFO_OK",
           "INFO_NO_EIGENVALUES", "INFO_NOT_CONVERGED", "INFO_SUBSPACE_TOO_SMALL"]

INFO_OK = 0
INFO_NO_EIGENVALUES = 1
INFO_NOT_CONVERGED = 2
INFO_SUBSPACE_TOO_SMALL = 3


@dataclasses.dataclass(frozen=True)
class FeastParams:
    """Solver configuration (reference ``FeastParams`` + fpm array,
    Feast.hs:76-89, Feast/Internal.hs:73-79).

    contour_points: quadrature nodes on the upper semicircle (fpm[1]; the
        reference default is 8, Feast.hs:83-89).
    tol: convergence tolerance on the max in-interval residual (fpm[2] holds
        the exponent in FEAST; default 1e-12).
    max_loops: refinement-loop cap.
    debug: per-loop convergence printing (fpm[0]).
    backend: direct-solver backend for the shifted systems.
    """

    contour_points: int = 8
    tol: float = 1e-12
    max_loops: int = 20
    debug: bool = False
    backend: str = "dense"
    dims: tuple | None = None   # grid dims for the multifrontal ND ordering
    complex_strategy: str = "auto"  # "native" | "embedded" | "auto"
    contour_batching: str = "auto"  # "vmap" | "loop" | "auto"
    refine_solves: int = 0      # per-node mixed-precision refinement steps
    check_hermitian: bool = True
    seed: int = 0


class EigResult(NamedTuple):
    """Structured output (SURVEY.md §5: keep epsout/loop/res instead of
    discarding them like the reference driver, Feast.hs:140-155)."""

    values: np.ndarray       # (m,) eigenvalues found inside the interval
    vectors: np.ndarray      # (n, m) B-orthonormal eigenvectors
    n_found: int
    iterations: int
    epsout: float            # reached max residual (FEAST's epsout analog)
    residuals: np.ndarray    # (m,) per-pair relative residuals
    info: int                # INFO_* code (reference decode, Feast.hs:246-258)
    subspace: np.ndarray     # (n, m0) full final subspace for warm restart


def _check_hermitian(mat, name):
    """Reference precondition (Feast.hs:129-130): ctrans m == m."""
    d = np.asarray(mat.todense())
    if not np.allclose(d, d.conj().T, atol=1e-12 * max(1.0, np.abs(d).max())):
        raise ValueError(f"geigsh: matrix {name} is not hermitian")


def _contour(emin, emax, ne):
    """Gauss-Legendre nodes/weights on the upper semicircle.

    The projector P = (1/2pi) Int_0^{2pi} r e^{i t} (z(t)B - A)^{-1} B dt
    with z(t) = c + r e^{i t}.  For a Hermitian pencil the lower semicircle
    integrand is the conjugate-transpose solve on the same factors, so only
    upper-half nodes are materialized.
    """
    c = 0.5 * (emin + emax)
    r = 0.5 * (emax - emin)
    x, w = np.polynomial.legendre.leggauss(ne)
    theta = 0.5 * np.pi * (x + 1.0)  # (0, pi)
    z = c + r * np.exp(1j * theta)
    # weight for each node: w_k * (pi/2) / (2 pi) * r e^{i theta_k}
    sigma = w * (np.pi / 2.0) / (2.0 * np.pi) * r * np.exp(1j * theta)
    return z, sigma


def _reduced_geig(aq, bq):
    """Generalized symmetric-definite reduced problem via spectral filtering
    of Bq (robust to rank-deficient subspaces)."""
    aq = np.asarray(aq)
    bq = np.asarray(bq)
    wb, vb = np.linalg.eigh(bq)
    keep = wb > max(1e-14 * max(wb.max(), 0.0), 0.0)
    if not np.any(keep):
        raise FloatingPointError("reduced Bq is numerically zero")
    binv_half = vb[:, keep] / np.sqrt(wb[keep])
    m = binv_half.conj().T @ aq @ binv_half
    lam, w = np.linalg.eigh(0.5 * (m + m.conj().T))
    coeff = binv_half @ w
    return lam, coeff


def _solve_all(factors, b_stack, trans):
    """Stacked solves under either contour-batching strategy."""
    from sparse_linear_tpu.solve import api as solve_api

    if isinstance(factors, list):
        return jnp.stack(
            [solve_api.solve_many(f, b_stack[k], trans=trans)
             for k, f in enumerate(factors)]
        )
    return solve_api.solve_batched(factors, b_stack, trans=trans)


def _refine_stack(factors, x64, b64, solve_dtype, data64, rows, cols, trans):
    """One mixed-precision refinement step on a batched embedded solve:
    r_k = b_k - E_k x_k computed in f64, correction solved in the factors'
    (lower) precision, accumulation kept in f64 — the result must NOT be
    rounded back to f32 or the refinement floor is the f32 representation."""
    if trans:
        # E^T x: swap roles of rows/cols in the scatter
        ax = jnp.zeros_like(x64).at[:, cols, :].add(
            data64[:, :, None] * x64[:, rows, :], mode="drop"
        )
    else:
        ax = jnp.zeros_like(x64).at[:, rows, :].add(
            data64[:, :, None] * x64[:, cols, :], mode="drop"
        )
    r = b64 - ax
    dx = _solve_all(factors, r.astype(solve_dtype), trans)
    return x64 + dx.astype(jnp.float64)


def _host_embed_matrix(mat, dtype=np.float64):
    """Complex sparse matrix -> embedded real CSR with host-side data
    movement (complex gathers are unsupported on TPU)."""
    from sparse_linear_tpu.formats.matrix import CSR as _CSR
    from sparse_linear_tpu.solve import complex_embed as ce

    pat, perm = ce.embed_pattern(mat)
    data = ce.embed_data(np.asarray(mat.data), np.asarray(perm))
    return _CSR(indptr=pat.indptr, indices=pat.indices,
                data=jnp.asarray(data.astype(dtype)), shape=pat.shape)


def _np_embed(x):
    """Host interleave: complex (n, ...) -> real f64 (2n, ...)."""
    x = np.asarray(x)
    out = np.empty((2 * x.shape[0],) + x.shape[1:], np.float64)
    out[0::2] = x.real
    out[1::2] = x.imag
    return out


def _geigsh_embedded_complex(*, m0, n, ne, emin, emax, params, guess, cdtype,
                             union_a, union_b, factors, factors_dtype_f32,
                             refine_data, refine_rows, refine_cols,
                             sigma) -> EigResult:
    """Complex-Hermitian FEAST through the real 2n embedding, end to end.

    The reference's zfeast path (Feast/Internal.hs:61-65) runs native complex
    arithmetic; TPUs have no complex sparse ops, so every stage here is real:
    SpMMs through the embedded operators, shifted solves on the embedded
    factors, quadrature as split re/im scalar combinations, the subspace
    Gram/whitening and Rayleigh-Ritz products as real MXU matmuls
    (complex_embed.gram_embedded / rmul_embedded).  Only the m0 x m0 reduced
    eigenproblem and the whitening Cholesky run in host complex arithmetic.
    """
    from sparse_linear_tpu.solve import complex_embed as ce

    a_e = _host_embed_matrix(union_a)
    b_e = _host_embed_matrix(union_b)

    sig_re = jnp.asarray(np.real(sigma))
    sig_im = jnp.asarray(np.imag(sigma))
    sdt = jnp.float32 if factors_dtype_f32 else jnp.float64

    if guess is not None:
        y0 = np.asarray(guess, dtype=cdtype)
        if y0.shape != (n, m0):
            raise ValueError(f"geigsh: guess must have shape {(n, m0)}")
    else:
        rng0 = np.random.default_rng(params.seed)
        y0 = (rng0.standard_normal((n, m0))
              + 1j * rng0.standard_normal((n, m0)))
    ye = jnp.asarray(_np_embed(y0))

    lam_scale = max(abs(emin), abs(emax), 1.0)
    info = INFO_NOT_CONVERGED
    epsout = np.inf
    eps_prev = np.inf
    lam_np = np.zeros((0,))
    res_np = np.zeros((0,))
    x_np = np.zeros((n, 0), dtype=cdtype)
    loops_done = 0

    for loop in range(params.max_loops):
        loops_done = loop + 1
        by_e64 = spmm(b_e, ye)                       # f64 embedded B y
        by_stack64 = jnp.broadcast_to(by_e64, (ne,) + by_e64.shape)
        by_stack = by_stack64.astype(sdt)
        s_stack = _solve_all(factors, by_stack, False).astype(jnp.float64)
        t_stack = _solve_all(factors, by_stack, True).astype(jnp.float64)
        for _ in range(params.refine_solves):
            s_stack = _refine_stack(factors, s_stack, by_stack64, sdt,
                                    refine_data, refine_rows, refine_cols,
                                    trans=False)
            t_stack = _refine_stack(factors, t_stack, by_stack64, sdt,
                                    refine_data, refine_rows, refine_cols,
                                    trans=True)
        sr, si = s_stack[:, 0::2, :], s_stack[:, 1::2, :]
        tr, ti = t_stack[:, 0::2, :], t_stack[:, 1::2, :]
        # q = sum_k sigma_k S_k + conj(sigma_k) T_k, split into re/im
        q_re = (jnp.einsum("k,knm->nm", sig_re, sr)
                - jnp.einsum("k,knm->nm", sig_im, si)
                + jnp.einsum("k,knm->nm", sig_re, tr)
                + jnp.einsum("k,knm->nm", sig_im, ti))
        q_im = (jnp.einsum("k,knm->nm", sig_im, sr)
                + jnp.einsum("k,knm->nm", sig_re, si)
                - jnp.einsum("k,knm->nm", sig_im, tr)
                + jnp.einsum("k,knm->nm", sig_re, ti))
        qe = ce.merge_embedded(q_re, q_im)

        # whitening (the complex analog of the real path's QR): Gram via
        # real matmuls, spectral inverse square root on host
        gre, gim = ce.gram_embedded(qe, qe)
        g = np.asarray(gre) + 1j * np.asarray(gim)
        wb, vb = np.linalg.eigh(0.5 * (g + g.conj().T))
        floor = max(float(wb.max()), 0.0) * 1e-14 + np.finfo(float).tiny
        white = vb / np.sqrt(np.maximum(wb, floor))
        qe = ce.rmul_embedded(qe, jnp.asarray(white.real),
                              jnp.asarray(white.imag))

        # Rayleigh-Ritz: reduced complex blocks from embedded products
        aq_full = spmm(a_e, qe)
        bq_full = spmm(b_e, qe)
        aq_re, aq_im = ce.gram_embedded(qe, aq_full)
        bq_re, bq_im = ce.gram_embedded(qe, bq_full)
        aq = np.asarray(aq_re) + 1j * np.asarray(aq_im)
        bq = np.asarray(bq_re) + 1j * np.asarray(bq_im)
        lam, coeff = _reduced_geig(aq, bq)
        xe = ce.rmul_embedded(qe, jnp.asarray(np.ascontiguousarray(coeff.real)),
                              jnp.asarray(np.ascontiguousarray(coeff.imag)))

        # residuals: ||A x - lam B x|| == embedded norms (lam is real)
        ax_e = spmm(a_e, xe)
        bx_e = spmm(b_e, xe)
        r_e = np.asarray(ax_e) - np.asarray(bx_e) * lam[None, :]
        rnorm = np.linalg.norm(r_e, axis=0)
        xnorm = np.maximum(np.linalg.norm(np.asarray(xe), axis=0),
                           np.finfo(float).tiny)
        res = rnorm / (lam_scale * xnorm)

        inside = (lam >= emin) & (lam <= emax)
        m_found = int(inside.sum())
        epsout = float(res[inside].max()) if m_found else float(res.max())
        if params.debug:
            print(f"feast(zembed) loop {loop}: m={m_found}, "
                  f"epsout={epsout:.3e}")

        xe_np = np.asarray(xe)
        x_all = (xe_np[0::2] + 1j * xe_np[1::2]).astype(cdtype)
        lam_np, res_np, x_np = lam[inside], res[inside], x_all[:, inside]

        # warm-restart subspace: kept Ritz vectors + random refill
        y_next = np.zeros((n, m0), dtype=cdtype)
        y_next[:, : x_all.shape[1]] = x_all
        if x_all.shape[1] < m0:
            rng_fill = np.random.default_rng(params.seed + loop + 1)
            fill = (rng_fill.standard_normal((n, m0 - x_all.shape[1]))
                    + 1j * rng_fill.standard_normal((n, m0 - x_all.shape[1])))
            y_next[:, x_all.shape[1]:] = fill.astype(cdtype)
        ye = jnp.asarray(_np_embed(y_next))

        if m_found and epsout <= params.tol:
            info = INFO_OK
            break
        if m_found == 0 and loop >= 2:
            info = INFO_NO_EIGENVALUES
            break
        if loop >= 2 and epsout > 0.5 * eps_prev:
            break
        eps_prev = epsout

    if len(lam_np) == m0:
        info = INFO_SUBSPACE_TOO_SMALL

    order = np.argsort(lam_np)
    ye_np = np.asarray(ye)
    return EigResult(
        values=lam_np[order],
        vectors=x_np[:, order],
        n_found=len(lam_np),
        iterations=loops_done,
        epsout=epsout,
        residuals=res_np[order],
        info=info,
        subspace=(ye_np[0::2] + 1j * ye_np[1::2]).astype(cdtype),
    )


def geigsh(m0, interval, mat_a, mat_b, params: FeastParams = FeastParams(),
           guess=None, mesh=None, contour_axis: str = "cp",
           rows_axis: str = "rows") -> EigResult:
    """Generalized Hermitian interval eigenproblem A x = lambda B x,
    eigenvalues in ``interval`` = (emin, emax), subspace dimension m0.

    Reference: ``geigSH``/``geigSH_`` (Feast.hs:62-70,102-113,115-240),
    including the subspace warm start through ``guess`` (Feast.hs:119,157-168,
    fpm[4]=1).

    Distribution (P3/P4, SURVEY.md §2.4): with ``mesh`` given, the contour
    node axis is sharded over ``mesh[contour_axis]`` (each device group owns
    quadrature nodes; XLA inserts the psum for the accumulated subspace),
    and when the mesh also names ``rows_axis`` the n-row subspace arrays are
    row-sharded over it (SpMMs and Gram products distribute; XLA inserts
    the reduction collectives over ICI).
    """
    emin, emax = float(interval[0]), float(interval[1])
    if emax <= emin:
        raise ValueError("geigsh: empty interval")
    n = mat_a.shape[0]
    if mat_a.shape != (n, n) or mat_b.shape != (n, n):
        raise ValueError("geigsh: A and B must be square and equal-sized")
    if m0 < 1 or m0 > n:
        raise ValueError(f"geigsh: m0 must be in [1, {n}]")

    in_dtype = np.result_type(mat_a.dtype, mat_b.dtype)
    real_input = not np.issubdtype(in_dtype, np.complexfloating)
    cdtype = complex_of(in_dtype)

    # complex sparse construction/dense ops (sort/segment/scatter) are
    # unsupported on TPU: pin the input matrices and all host-side complex
    # algebra (hermitian checks, the union lin) to the CPU; the embedded
    # pipeline below returns everything to the device as real arrays.
    import contextlib

    if real_input:
        host_ctx = contextlib.nullcontext
    else:
        cpu = jax.devices("cpu")[0]
        mat_a = jax.device_put(mat_a, cpu)
        mat_b = jax.device_put(mat_b, cpu)
        host_ctx = lambda: jax.default_device(cpu)  # noqa: E731

    with host_ctx():
        if params.check_hermitian:
            _check_hermitian(mat_a, "A")
            _check_hermitian(mat_b, "B")

    # ---- contour + shifted factorizations (ijob=10, hoisted out of the loop)
    # All contour nodes share one pattern (union of A and B); one symbolic,
    # ONE batched numeric factorization over the stacked shifted value-sets
    # (z_k B - A) — contour parallelism P3.  With ``mesh`` given, the node
    # axis is sharded over it and XLA inserts the quadrature psum (P4/dist).
    z_nodes, sigma = _contour(emin, emax, params.contour_points)
    ne = len(z_nodes)
    opts = {"dims": params.dims} if params.dims is not None else {}
    # union-pattern matrices carrying B resp. A values; keep them in the
    # input's real dtype for real pencils
    one = 1.0 if real_input else 1.0 + 0.0j
    zero = 0.0 if real_input else 0.0 + 0.0j
    with host_ctx():
        union_b = lin(one, mat_b, zero, mat_a)  # union pattern, B values
        union_a = lin(zero, mat_b, one, mat_a)  # union pattern, A values

    use_embed = params.complex_strategy == "embedded" or (
        params.complex_strategy == "auto"
        and jax.default_backend() not in ("cpu",)
    )
    data_stack_c = (
        np.asarray(z_nodes)[:, None] * np.asarray(union_b.data)[None, :]
        - np.asarray(union_a.data)[None, :]
    )
    if use_embed:
        # complex solves through the real 2n x 2n ring embedding (TPU has no
        # complex sparse support); see solve/complex_embed.py
        from sparse_linear_tpu.solve import complex_embed as ce
        from sparse_linear_tpu.solve import ordering as ord_mod

        pattern_r, eperm = ce.embed_pattern(union_b)
        if params.backend == "multifrontal":
            if params.dims is not None:
                base = ord_mod.nested_dissection_grid(params.dims)
                symbolic = solve_api.analyze(
                    pattern_r, backend="multifrontal",
                    perm=ce.embed_perm(base),
                )
            else:
                symbolic = solve_api.analyze(pattern_r, backend="multifrontal")
        else:
            symbolic = solve_api.analyze(pattern_r, backend=params.backend)
        solve_dtype = (
            np.float32 if jax.default_backend() != "cpu" else np.float64
        )
        # host-side embedding: data_stack_c is host complex data and complex
        # device ops are unsupported on TPU
        data_stack = jnp.asarray(
            ce.embed_data(data_stack_c, eperm).astype(solve_dtype)
        )
        pattern_mat = pattern_r
    else:
        symbolic = solve_api.analyze(union_b, backend=params.backend, **opts)
        data_stack = jnp.asarray(data_stack_c, dtype=cdtype)
        pattern_mat = union_b
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_stack = jax.device_put(
            data_stack, NamedSharding(mesh, P(contour_axis))
        )
    # contour batching: "vmap" compiles ONE batched program over all nodes
    # (best on CPU / small patterns); "loop" reuses the single-matrix
    # compiled programs per node (the remote TPU compiler cannot handle the
    # vmapped multifrontal program)
    batching = params.contour_batching
    if batching == "auto":
        batching = (
            "loop"
            if (params.backend == "multifrontal"
                and jax.default_backend() != "cpu")
            else "vmap"
        )
    if batching == "vmap":
        factors = solve_api.factor_batched(pattern_mat, data_stack, symbolic)
    else:
        from sparse_linear_tpu.formats.matrix import CSR as _CSR

        pm = pattern_mat.tocsr()
        factors = [
            solve_api.factor(
                _CSR(indptr=pm.indptr, indices=pm.indices,
                     data=data_stack[k], shape=pm.shape),
                symbolic,
            )
            for k in range(ne)
        ]
    factors_dtype_f32 = use_embed and jax.default_backend() != "cpu" 
    refine_data = refine_rows = refine_cols = None
    if use_embed and params.refine_solves > 0:
        # f64 embedded data for residual SpMVs in per-node refinement
        refine_data = jnp.asarray(
            ce.embed_data(data_stack_c, eperm).astype(np.float64)
        )
        refine_rows = pattern_r.row_ids()
        refine_cols = pattern_r.indices
    sig_re = jnp.asarray(np.real(sigma))
    sig_im = jnp.asarray(np.imag(sigma))

    if use_embed and not real_input:
        # complex Hermitian pencil on an accelerator: the whole subspace
        # iteration runs through the real 2n embedding — SpMMs and Gram
        # products as real MXU matmuls, solves on the embedded factors,
        # only the m0 x m0 reduced eigenproblem in host complex arithmetic.
        return _geigsh_embedded_complex(
            m0=m0, n=n, ne=ne, emin=emin, emax=emax, params=params,
            guess=guess, cdtype=cdtype, union_a=union_a, union_b=union_b,
            factors=factors, factors_dtype_f32=factors_dtype_f32,
            refine_data=refine_data, refine_rows=refine_rows,
            refine_cols=refine_cols, sigma=sigma,
        )

    def shard_rows_arr(arr):
        """Row-shard an (n, m) subspace array over mesh[rows_axis] (P4)."""
        if mesh is not None and rows_axis in getattr(mesh, "axis_names", ()):
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                arr, NamedSharding(mesh, P(rows_axis, None))
            )
        return arr

    # ---- initial subspace (fpm[4]: warm start when guess given)
    if guess is not None:
        y = np.asarray(guess, dtype=cdtype if not real_input else in_dtype)
        if y.shape != (n, m0):
            raise ValueError(f"geigsh: guess must have shape {(n, m0)}")
        y = jnp.asarray(y)
    else:
        key = jax.random.key(params.seed)
        y = jax.random.normal(key, (n, m0), dtype=np.dtype(in_dtype)
                              if real_input else np.dtype(complex_of(in_dtype)))
    y = shard_rows_arr(y)

    lam_scale = max(abs(emin), abs(emax), 1.0)
    info = INFO_NOT_CONVERGED
    epsout = np.inf
    eps_prev = np.inf
    lam_np = np.zeros((0,))
    res_np = np.zeros((0,))
    x_np = np.zeros((n, 0))
    loops_done = 0

    for loop in range(params.max_loops):
        loops_done = loop + 1
        # ---- quadrature: ONE batched solve over all nodes (ijob=11 / 21)
        if use_embed:
            # fully real pipeline: solve the embedded systems, then combine
            # Re(sigma S) = Re(sigma) S_re - Im(sigma) S_im directly from the
            # interleaved (re, im) rows — no complex dtype on device.
            from sparse_linear_tpu.solve import complex_embed as ce

            by = spmm(mat_b, y)
            sdt = jnp.float32 if factors_dtype_f32 else jnp.float64
            by_e64 = ce.embed_vec(by.astype(jnp.float64))
            by_stack64 = jnp.broadcast_to(by_e64, (ne,) + by_e64.shape)
            by_stack = by_stack64.astype(sdt)
            s_stack = _solve_all(factors, by_stack, False).astype(jnp.float64)
            t_stack = _solve_all(factors, by_stack, True).astype(jnp.float64)
            if params.refine_solves > 0:
                for _ in range(params.refine_solves):
                    s_stack = _refine_stack(
                        factors, s_stack, by_stack64, sdt, refine_data,
                        refine_rows, refine_cols, trans=False,
                    )
                    t_stack = _refine_stack(
                        factors, t_stack, by_stack64, sdt, refine_data,
                        refine_rows, refine_cols, trans=True,
                    )
            sr, si = s_stack[:, 0::2, :], s_stack[:, 1::2, :]
            tr, ti = t_stack[:, 0::2, :], t_stack[:, 1::2, :]
            # q = sum_k Re(sigma_k S_k) + Re(conj(sigma_k) T_k)
            q = (
                jnp.einsum("k,knm->nm", sig_re, sr)
                - jnp.einsum("k,knm->nm", sig_im, si)
                + jnp.einsum("k,knm->nm", sig_re, tr)
                + jnp.einsum("k,knm->nm", sig_im, ti)
            ).astype(in_dtype)
        else:
            by = spmm(mat_b, y).astype(cdtype)
            by_stack = jnp.broadcast_to(by, (ne,) + by.shape)
            s_stack = _solve_all(factors, by_stack, False)
            t_stack = _solve_all(factors, by_stack, True)
            sig = jnp.asarray(sigma)
            q = (
                jnp.einsum("k,knm->nm", sig, s_stack)
                + jnp.einsum("k,knm->nm", jnp.conj(sig), t_stack)
            )
            if real_input:
                q = q.real.astype(in_dtype)

        # ---- orthonormalize the filtered subspace before the reduced solve:
        # keeps Bq well-conditioned so the Ritz residual floor reaches
        # machine precision (the Fortran FEAST works on the raw Q and floors
        # around 1e-12)
        q = shard_rows_arr(q)
        q, _ = jnp.linalg.qr(q, mode="reduced")
        q = shard_rows_arr(q)

        # ---- Rayleigh-Ritz (the m0 x m0 reduced problem, Feast.hs:153-154)
        aq_full = spmm(mat_a, q)  # ijob=30
        bq_full = spmm(mat_b, q)  # ijob=40
        aq = np.asarray(jnp.conj(q.T) @ aq_full)
        bq = np.asarray(jnp.conj(q.T) @ bq_full)
        lam, coeff = _reduced_geig(aq, bq)
        x = np.asarray(q) @ coeff  # (n, m_kept) Ritz vectors, B-orthonormal

        # ---- residuals (per pair): ||A x - lam B x|| / (lam_scale ||x||)
        ax = np.asarray(spmm(mat_a, jnp.asarray(x)))
        bx = np.asarray(spmm(mat_b, jnp.asarray(x)))
        rnorm = np.linalg.norm(ax - bx * lam[None, :], axis=0)
        xnorm = np.maximum(np.linalg.norm(x, axis=0), np.finfo(float).tiny)
        res = rnorm / (lam_scale * xnorm)

        inside = (lam >= emin) & (lam <= emax)
        m_found = int(inside.sum())
        epsout = float(res[inside].max()) if m_found else float(res.max())
        if params.debug:
            print(
                f"feast loop {loop}: m={m_found}, epsout={epsout:.3e}, "
                f"lam_in={np.sort(lam[inside])[:8]}"
            )

        lam_np, res_np, x_np = lam[inside], res[inside], x[:, inside]
        # full subspace for warm restart: pad kept columns back to m0
        y_next = np.zeros((n, m0), dtype=x.dtype)
        y_next[:, : x.shape[1]] = x
        if x.shape[1] < m0:
            # refill dropped directions randomly to keep the subspace full
            rng_fill = np.random.default_rng(params.seed + loop + 1)
            fill = rng_fill.standard_normal((n, m0 - x.shape[1]))
            if np.issubdtype(x.dtype, np.complexfloating):
                fill = fill + 1j * rng_fill.standard_normal((n, m0 - x.shape[1]))
            y_next[:, x.shape[1]:] = fill.astype(x.dtype)
        y = jnp.asarray(y_next)

        if m_found and epsout <= params.tol:
            info = INFO_OK
            break
        if m_found == 0 and loop >= 2:
            info = INFO_NO_EIGENVALUES
            break
        # stagnation: the residual floor of the solver accuracy has been
        # reached (inexact solves); further subspace iterations cannot help
        if loop >= 2 and epsout > 0.5 * eps_prev:
            break
        eps_prev = epsout

    if len(lam_np) == m0:
        # all m0 Ritz pairs land inside the interval: the subspace is (or may
        # be) too small to capture the full invariant subspace — the reference
        # warning case (Feast.hs:252-257).  Flagged regardless of convergence,
        # since a too-small subspace also prevents convergence.
        info = INFO_SUBSPACE_TOO_SMALL

    order = np.argsort(lam_np)
    return EigResult(
        values=lam_np[order],
        vectors=x_np[:, order],
        n_found=len(lam_np),
        iterations=loops_done,
        epsout=epsout,
        residuals=res_np[order],
        info=info,
        subspace=np.asarray(y),
    )


def eigsh(m0, interval, mat_a, params: FeastParams = FeastParams(),
          guess=None, mesh=None, contour_axis: str = "cp") -> EigResult:
    """Standard Hermitian interval problem: B = I (reference ``eigSH``,
    Feast.hs:53-60,91-100)."""
    from sparse_linear_tpu.dtypes import real_of
    from sparse_linear_tpu.formats.matrix import eye

    b = eye(mat_a.shape[0], dtype=real_of(mat_a.dtype))
    return geigsh(m0, interval, mat_a, b, params=params, guess=guess,
                  mesh=mesh, contour_axis=contour_axis)
