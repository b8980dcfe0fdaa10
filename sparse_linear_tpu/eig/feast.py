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
from sparse_linear_tpu.utils.precision import dot64
from sparse_linear_tpu.solve import api as solve_api

__all__ = ["FeastParams", "EigResult", "eigsh", "geigsh",
           "count_eigenvalues", "eigsh_sliced", "geigsh_sliced", "INFO_OK",
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
    refine_solves: int | None = None  # per-node mixed-precision refinement
                                # steps; None = auto (2 when the shifted
                                # factors are f32 — the TPU embedded path —
                                # else 0).  Without them f32 solve noise
                                # floors the subspace residual at ~1e-6.
    check_hermitian: bool = True
    seed: int = 0
    quadrature: str = "gauss"  # FEAST fpm(16): "gauss" | "trapezoid"


class EigResult(NamedTuple):
    """Structured output (SURVEY.md §5: keep epsout/loop/res instead of
    discarding them like the reference driver, Feast.hs:140-155).

    ``vectors``/``subspace`` are array-likes: numpy on host paths, but the
    TPU fast path returns DEVICE-RESIDENT ``jax.Array``s (pulling (n, m0)
    f64 through the host link costs seconds at scale).  Call
    ``np.asarray(...)`` for a host copy; both kinds support read-only
    numpy-style indexing/matmul, and ``subspace`` feeds straight back into
    ``geigsh(guess=...)`` either way."""

    values: np.ndarray       # (m,) eigenvalues found inside the interval
    vectors: object          # (n, m) B-orthonormal eigenvectors (np or jax)
    n_found: int
    iterations: int
    epsout: float            # reached max residual (FEAST's epsout analog)
    residuals: np.ndarray    # (m,) per-pair relative residuals
    info: int                # INFO_* code (reference decode, Feast.hs:246-258)
    subspace: object         # (n, m0) final subspace for warm restart


_HERMITIAN_CACHE: dict = {}
_HERMITIAN_CACHE_MAX = 64


def _check_hermitian(mat, name):
    """Reference precondition (Feast.hs:129-130): ctrans m == m.

    Sparse O(nnz) comparison — never densifies (a 65k-dof operator would
    need a 16 GB dense temp).  The verdict is cached per value fingerprint:
    production FEAST re-solves the same pencil repeatedly (warm restarts,
    interval sweeps) and the ctrans/compare pipeline costs ~0.5 s of device
    round trips per call at 36k dof — half the whole warm solve."""
    from sparse_linear_tpu.eig.real_pipeline import _fingerprint

    key = _fingerprint(mat)
    ok = _HERMITIAN_CACHE.get(key)
    if ok is None:
        scale = float(np.abs(np.asarray(mat.data)).max()) if mat.nnz else 1.0
        ok = bool(mat.tocsr().is_hermitian(tol=1e-12 * max(1.0, scale)))
        if len(_HERMITIAN_CACHE) >= _HERMITIAN_CACHE_MAX:
            _HERMITIAN_CACHE.pop(next(iter(_HERMITIAN_CACHE)))
        _HERMITIAN_CACHE[key] = ok
    if not ok:
        raise ValueError(f"geigsh: matrix {name} is not hermitian")


def _contour(emin, emax, ne, kind: str = "gauss"):
    """Quadrature nodes/weights on the upper semicircle.

    ``kind`` mirrors FEAST's fpm(16) integration-type switch: "gauss"
    (default, fpm(16)=0) or "trapezoid" (fpm(16)=1 — uniform midpoint
    angles; its equispaced nodes make the filter exactly the exponential
    of the resolvent's Fourier series, sometimes preferred for very wide
    intervals).  Zolotarev (fpm(16)=2) is deliberately not offered — see
    the analysis below.

    The projector P = (1/2pi) Int_0^{2pi} r e^{i t} (z(t)B - A)^{-1} B dt
    with z(t) = c + r e^{i t}.  For a Hermitian pencil the lower semicircle
    integrand is the conjugate-transpose solve on the same factors, so only
    upper-half nodes are materialized.

    Why Gauss and not Zolotarev/elliptic nodes: the driver always runs
    with a subspace buffer (m0 > pairs sought), so convergence is governed
    by the filter's value at the *far* exterior eigenvalues — where the
    Gauss filter DECAYS (measured 4e-9 at 5 radii for ne=8) while the
    optimal-equiripple Zolotarev filter stays flat at its ripple level
    (5e-3 at ne=8, any distance).  Zolotarev only wins with no buffer and
    exterior eigenvalues crowding the endpoints; here Gauss+buffer
    converges in 2 loops and fewer nodes (ne=4) cost more extra loops
    than they save in factor/solve work.
    """
    c = 0.5 * (emin + emax)
    r = 0.5 * (emax - emin)
    if kind == "trapezoid":
        # midpoint rule on the upper semicircle: theta_j = pi (j+1/2)/ne,
        # each carrying dtheta = pi/ne of the (1/2pi) contour measure
        theta = np.pi * (np.arange(ne) + 0.5) / ne
        z = c + r * np.exp(1j * theta)
        sigma = r * np.exp(1j * theta) / (2.0 * ne)
        return z, sigma
    if kind != "gauss":
        raise ValueError(
            f"unknown quadrature: {kind!r} (expected 'gauss' or 'trapezoid')"
        )
    x, w = np.polynomial.legendre.leggauss(ne)
    theta = 0.5 * np.pi * (x + 1.0)  # (0, pi)
    z = c + r * np.exp(1j * theta)
    # weight for each node: w_k * (pi/2) / (2 pi) * r e^{i theta_k}
    sigma = w * (np.pi / 2.0) / (2.0 * np.pi) * r * np.exp(1j * theta)
    return z, sigma


def _union_shift_stack(mat_a, mat_b, z_nodes, real_input: bool):
    """Union-pattern pencil matrices + the host shifted-value stack.

    One symbolic analysis serves every contour node (Feast.hs:210-218), so
    A and B are rewritten onto their union pattern (``lin`` with 0/1
    coefficients) and the per-node values are z_k * B - A over that shared
    entry order.  Returns (union_b, union_a, stack) with stack complex on
    host (embedding/dtype handling is the caller's)."""
    one = 1.0 if real_input else 1.0 + 0.0j
    zero = 0.0 if real_input else 0.0 + 0.0j
    union_b = lin(one, mat_b, zero, mat_a)  # union pattern, B values
    union_a = lin(zero, mat_b, one, mat_a)  # union pattern, A values
    stack = (
        np.asarray(z_nodes)[:, None] * np.asarray(union_b.data)[None, :]
        - np.asarray(union_a.data)[None, :]
    )
    return union_b, union_a, stack


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


def _refine_nodes(fast_a_mm, fast_b_mm, z_nodes, factors, x64, by64, sdt,
                  trans):
    """Mixed-precision refinement of the embedded contour solves with the
    residual computed in the ORIGINAL complex space:

        r_k = b - (z_k B - A) x_k     (conj(z_k) for the E^T solves)

    through the fast A/B SpMM closures (DIA slices for banded operators) —
    O(n m) memory per node, where the embedded-CSR scatter formulation
    materializes an (ne, nnz_e, m) tensor and OOMs at 65k dof x 80 RHS.
    Valid for the real-symmetric pencil path (E^T <-> conj(z) B - A).

    x64: (ne, 2n, m) embedded f64 solutions; by64: (n, m) f64 = B y.
    """
    r_e = _refine_residual(fast_a_mm, fast_b_mm, z_nodes, x64, by64, trans)
    dx = _solve_all(factors, r_e.astype(sdt), trans)
    return x64 + dx.astype(jnp.float64)


def _refine_residual(fast_a_mm, fast_b_mm, z_nodes, x64, by64, trans):
    """Embedded residual r = b - E x of the contour solves, computed in the
    original complex space through the fast SpMM closures (O(n m) memory)."""
    xr = x64[:, 0::2, :]
    xi = x64[:, 1::2, :]
    zz = np.conj(z_nodes) if trans else np.asarray(z_nodes)
    zr = jnp.asarray(np.real(zz))[:, None, None]
    zi = jnp.asarray(np.imag(zz))[:, None, None]
    axr = jax.vmap(fast_a_mm)(xr)
    axi = jax.vmap(fast_a_mm)(xi)
    bxr = jax.vmap(fast_b_mm)(xr)
    bxi = jax.vmap(fast_b_mm)(xi)
    er = zr * bxr - zi * bxi - axr      # Re((z B - A) x)
    ei = zr * bxi + zi * bxr - axi      # Im((z B - A) x)
    rr = by64[None] - er
    ri = -ei
    ne, n_, m_ = rr.shape
    return jnp.stack([rr, ri], axis=2).reshape(ne, 2 * n_, m_)


def _is_identity(mat) -> bool:
    """Host check: mat == I exactly (the eigSH B:=ident case, Feast.hs:99-100;
    skips every B product and B residual)."""
    try:
        csr = mat.tocsr()
    except Exception:
        return False
    n = csr.shape[0]
    if csr.shape[1] != n or csr.nnz != n:
        return False
    import numpy as _np

    return (
        _np.array_equal(_np.asarray(csr.indptr), _np.arange(n + 1))
        and _np.array_equal(_np.asarray(csr.indices)[:n], _np.arange(n))
        and bool((_np.asarray(csr.data)[:n] == 1).all())
    )


def _fast_spmm_op(mat):
    """Device SpMM closure for the subspace iteration (the hot ijob=30/40
    multiply, Feast.hs:203-208).

    Banded real patterns ride DIA (shifted slices + fma — f64-safe on TPU,
    where the CSR scatter path crawls); unstructured real patterns route to
    the WELL/BSR kernels via the shared selector in eig/real_pipeline."""
    import numpy as _np

    if not _np.iscomplexobj(_np.asarray(mat.data)):
        from sparse_linear_tpu.eig.real_pipeline import _structured_op

        fn, _ = _structured_op(mat)
        return fn
    return lambda X: spmm(mat, X)


def _orthonormalize(q):
    """Orthonormalize a tall-skinny subspace block (jit-safe, CPU path)."""
    x, _ = jnp.linalg.qr(q, mode="reduced")
    return x


def _whiten_mat(g_np, passes=2):
    """Whitening matrix W (so Q W is orthonormal) from ONE pulled Gram.

    Why not QR/CholeskyQR on device: the FEAST-filtered subspace is
    *numerically rank-deficient by design* (the contour filter kills the
    m0 - m directions outside the interval), so a Gram Cholesky breaks
    down (NaN), and Householder QR under TPU f64 emulation costs ~12 s per
    loop at 65k x 80.  Eigh-based whitening floors the noise eigenvalues
    instead — those directions come out badly conditioned, and the reduced
    generalized eigenproblem drops them via its own B-mass cutoff.

    Two passes guard the heavily rank-deficient case; the second pass's
    Gram is G2 = W1^H G W1 computed HOST-side in exact f64, so extra
    passes cost no device round trips — only the m0 x m0 block ever
    crosses the boundary."""
    g = np.asarray(g_np)
    g = 0.5 * (g + g.conj().T)
    wtot = np.eye(g.shape[0], dtype=g.dtype)
    tiny = np.finfo(np.float64).tiny
    for _ in range(passes):
        w, v = np.linalg.eigh(0.5 * (g + g.conj().T))
        floor = max(float(w.max()), 0.0) * np.finfo(np.float64).eps * len(w)
        wi = 1.0 / np.sqrt(np.maximum(w, max(floor, tiny)))
        w1 = (v * wi[None, :]) @ v.conj().T
        wtot = wtot @ w1
        g = w1.conj().T @ g @ w1
    return wtot


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
    xe_last, inside_last = None, None
    loops_done = 0
    refine_n = (params.refine_solves if params.refine_solves is not None
                else (2 if factors_dtype_f32 else 0))
    if refine_data is None:
        refine_n = 0

    for loop in range(params.max_loops):
        loops_done = loop + 1
        by_e64 = spmm(b_e, ye)                       # f64 embedded B y
        by_stack64 = jnp.broadcast_to(by_e64, (ne,) + by_e64.shape)
        by_stack = by_stack64.astype(sdt)
        s_stack = _solve_all(factors, by_stack, False).astype(jnp.float64)
        t_stack = _solve_all(factors, by_stack, True).astype(jnp.float64)
        for _ in range(refine_n):
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
        # real matmuls, two-pass spectral inverse square root on host
        # (_whiten_mat — host-only extra passes, one m0 x m0 pull)
        gre, gim = ce.gram_embedded(qe, qe)
        g = np.asarray(gre) + 1j * np.asarray(gim)
        white = _whiten_mat(g)
        qe = ce.rmul_embedded(qe, jnp.asarray(np.ascontiguousarray(white.real)),
                              jnp.asarray(np.ascontiguousarray(white.imag)))

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

        # residuals: ||A x - lam B x|| == embedded norms (lam is real).
        # Device-resident: only the (2, m0) norm block crosses to the host
        # — pulling the (2n, m0) subspace per loop costs seconds at scale
        # (the round-2 lesson from the real fast path, eig/real_pipeline).
        m_kept = len(lam)
        lam_pad = np.zeros((m0,))
        lam_pad[:m_kept] = lam
        ax_e = spmm(a_e, xe)
        bx_e = spmm(b_e, xe)
        r_e = ax_e - bx_e * jnp.asarray(lam_pad)[None, : xe.shape[1]]
        rnorm = np.asarray(jnp.linalg.norm(r_e, axis=0))
        xnorm = np.maximum(
            np.asarray(jnp.linalg.norm(xe, axis=0)), np.finfo(float).tiny
        )
        res = (rnorm / (lam_scale * xnorm))[:m_kept]

        inside = (lam >= emin) & (lam <= emax)
        m_found = int(inside.sum())
        epsout = float(res[inside].max()) if m_found else float(res.max())
        if params.debug:
            print(f"feast(zembed) loop {loop}: m={m_found}, "
                  f"epsout={epsout:.3e}")

        lam_np, res_np = lam[inside], res[inside]
        xe_last, inside_last = xe, inside

        # warm-restart subspace ON DEVICE: kept Ritz columns + random
        # refill (a device normal in the embedded reals IS a complex
        # normal; pushing a host fill would cost a (2n, m0) transfer)
        keep = np.zeros((m0,))
        keep[:m_kept] = 1.0
        fill_e = jax.random.normal(
            jax.random.key(params.seed + loop + 1), (2 * n, m0),
            dtype=jnp.float64,
        )
        xe_pad = jnp.pad(xe, ((0, 0), (0, m0 - xe.shape[1])))
        ye = jnp.where(jnp.asarray(keep)[None, :] > 0, xe_pad, fill_e)

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
    # the (2n, m_kept) Ritz block crosses to the host ONCE, here
    if loops_done and xe_last is not None:
        xl = np.asarray(xe_last)
        x_np = (xl[0::2] + 1j * xl[1::2]).astype(cdtype)[:, inside_last]
    else:
        x_np = np.zeros((n, 0), dtype=cdtype)
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

    if (real_input and mesh is None
            and params.complex_strategy != "native"
            and params.contour_batching != "loop"
            and jax.default_backend() not in ("cpu",)):
        # accelerator fast path for real symmetric pencils: cached pipeline,
        # contour-batched factor/solve, conjugate-eliminated trans solves,
        # device-resident Rayleigh-Ritz (eig/real_pipeline.py).
        # contour_batching="loop" opts OUT (it factors node-by-node for
        # patterns whose vmapped factorization defeats the compiler).
        from sparse_linear_tpu.eig.real_pipeline import geigsh_real_tpu

        return geigsh_real_tpu(m0, (emin, emax), mat_a, mat_b, params,
                               guess=guess)

    # ---- contour + shifted factorizations (ijob=10, hoisted out of the loop)
    # All contour nodes share one pattern (union of A and B); one symbolic,
    # ONE batched numeric factorization over the stacked shifted value-sets
    # (z_k B - A) — contour parallelism P3.  With ``mesh`` given, the node
    # axis is sharded over it and XLA inserts the quadrature psum (P4/dist).
    z_nodes, sigma = _contour(emin, emax, params.contour_points,
                              kind=getattr(params, 'quadrature', 'gauss'))
    ne = len(z_nodes)
    opts = {"dims": params.dims} if params.dims is not None else {}
    with host_ctx():
        union_b, union_a, data_stack_c = _union_shift_stack(
            mat_a, mat_b, z_nodes, real_input
        )

    use_embed = params.complex_strategy == "embedded" or (
        params.complex_strategy == "auto"
        and jax.default_backend() not in ("cpu",)
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
    refine_n = (params.refine_solves if params.refine_solves is not None
                else (2 if factors_dtype_f32 else 0))
    refine_data = refine_rows = refine_cols = None
    if use_embed and refine_n > 0 and not real_input:
        # complex path only: f64 embedded data for scatter-residual
        # refinement (the real path refines in the original space through
        # the fast SpMM closures — _refine_nodes)
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
    x_dev = None
    inside = np.zeros((0,), dtype=bool)
    loops_done = 0

    # fast device operators for the hot SpMMs of the loop (ijob 30/40 and
    # residuals); B = I (the eigSH case) skips its products entirely
    with host_ctx():
        b_is_ident = _is_identity(mat_b)
    fast_a_mm = _fast_spmm_op(mat_a)
    fast_b_mm = (lambda X: X) if b_is_ident else _fast_spmm_op(mat_b)
    if use_embed:
        # device programs for the whitened Rayleigh-Ritz blocks: Grams via
        # chunk-accumulated dot64 (utils/precision.py) — exact at any
        # contraction length, so the subspace never crosses to the host
        _gram64 = jax.jit(lambda q_: dot64(q_.T, q_))

        @jax.jit
        def _whiten_rr64(q_, wmat_):
            qw = shard_rows_arr(dot64(q_, wmat_))
            aq_ = dot64(qw.T, fast_a_mm(qw))
            bq_ = dot64(qw.T, qw) if b_is_ident else dot64(
                qw.T, fast_b_mm(qw)
            )
            return qw, jnp.stack([aq_, bq_])
    tiny = np.finfo(np.float64).tiny
    sdt = jnp.float32 if factors_dtype_f32 else jnp.float64

    # ---- the two jitted device programs of the refinement loop.  On the
    # remote runtime every eager op pays a ~35 ms dispatch round trip, so
    # the whole filter (solves + refinement + quadrature combine +
    # orthonormalization + reduced Gram) runs as ONE program, and the Ritz
    # residual/restart step as a second.  The reduced m0 x m0 eigenproblem
    # stays on host between them; its outputs are padded to the static m0
    # width so varying kept-column counts never retrigger compilation.
    if use_embed:
        # the whole filter as ONE jitted program overwhelms the remote TPU
        # compiler at scale, so the host composes a handful of compiled
        # pieces (the level solves are jitted inside solve_api): ~15 device
        # dispatches per loop instead of hundreds of eager ops.
        from sparse_linear_tpu.solve import complex_embed as ce

        @jax.jit
        def _pre_solve(y_arg):
            by = fast_b_mm(y_arg)
            by_e64 = ce.embed_vec(by.astype(jnp.float64))
            by_stack = jnp.broadcast_to(
                by_e64, (ne,) + by_e64.shape
            ).astype(sdt)
            return by.astype(jnp.float64), by_stack

        _resid_s = jax.jit(lambda x64, by64: _refine_residual(
            fast_a_mm, fast_b_mm, z_nodes, x64, by64, False))
        _resid_t = jax.jit(lambda x64, by64: _refine_residual(
            fast_a_mm, fast_b_mm, z_nodes, x64, by64, True))
        _add64 = jax.jit(lambda x64, dx: x64 + dx.astype(jnp.float64))

        @jax.jit
        def _combine_q(s_stack, t_stack):
            # q = sum_k Re(sigma_k S_k) + Re(conj(sigma_k) T_k), from the
            # interleaved (re, im) rows — no complex dtype on device.
            # Broadcast-multiply + sum over the 8-node axis (VPU, exact)
            # rather than einsum: f64 MXU contractions truncate to f32 on
            # this stack (see utils/precision.py).
            sr, si = s_stack[:, 0::2, :], s_stack[:, 1::2, :]
            tr, ti = t_stack[:, 0::2, :], t_stack[:, 1::2, :]
            re3 = sig_re[:, None, None]
            im3 = sig_im[:, None, None]
            q_ = (
                (re3 * sr).sum(0) - (im3 * si).sum(0)
                + (re3 * tr).sum(0) + (im3 * ti).sum(0)
            ).astype(in_dtype)
            return shard_rows_arr(q_)

        def filter_step(factors_arg, y_arg):
            by64, by_stack = _pre_solve(y_arg)
            s = _solve_all(factors_arg, by_stack, False).astype(jnp.float64)
            t = _solve_all(factors_arg, by_stack, True).astype(jnp.float64)
            for _ in range(refine_n):
                rs = _resid_s(s, by64)
                s = _add64(s, _solve_all(factors_arg, rs.astype(sdt), False))
                rt = _resid_t(t, by64)
                t = _add64(t, _solve_all(factors_arg, rt.astype(sdt), True))
            return _combine_q(s, t)
    else:

        def _filter(factors_arg, y_arg):
            by = fast_b_mm(y_arg).astype(cdtype)
            by_stack = jnp.broadcast_to(by, (ne,) + by.shape)
            s_stack = _solve_all(factors_arg, by_stack, False)
            t_stack = _solve_all(factors_arg, by_stack, True)
            sig = jnp.asarray(sigma)
            q_ = (
                jnp.einsum("k,knm->nm", sig, s_stack)
                + jnp.einsum("k,knm->nm", jnp.conj(sig), t_stack)
            )
            if real_input:
                q_ = q_.real.astype(in_dtype)
            q_ = shard_rows_arr(_orthonormalize(shard_rows_arr(q_)))
            aq_ = jnp.conj(q_.T) @ fast_a_mm(q_)
            bq_ = jnp.conj(q_.T) @ fast_b_mm(q_)
            return q_, aq_, bq_

        filter_step = jax.jit(_filter)

    def _ritz(q_arg, coeff_pad, lam_pad, keep, key):
        x_pad = dot64(q_arg, coeff_pad.astype(q_arg.dtype))  # (n, m0) Ritz
        ax = fast_a_mm(x_pad)
        bx = fast_b_mm(x_pad)
        rnorm = jnp.linalg.norm(ax - bx * lam_pad[None, :].astype(ax.dtype),
                                axis=0)
        xnorm = jnp.maximum(jnp.linalg.norm(x_pad, axis=0), tiny)
        res_ = rnorm / (lam_scale * xnorm)
        rdt = jnp.zeros(0, x_pad.dtype).real.dtype
        fill = jax.random.normal(key, x_pad.shape, dtype=rdt)
        if not real_input:
            fill = fill + 1j * jax.random.normal(
                jax.random.fold_in(key, 1), x_pad.shape, dtype=rdt
            )
        # dropped directions are refilled randomly to keep the subspace full
        y_next = jnp.where(keep[None, :] > 0, x_pad,
                           fill.astype(x_pad.dtype))
        return res_, y_next, x_pad

    ritz_step = jax.jit(_ritz)
    stalls = 0

    for loop in range(params.max_loops):
        loops_done = loop + 1
        if use_embed:
            # ---- accelerator path: solves + refinement + quadrature on
            # device, then spectral whitening with the Gram computed via
            # chunk-accumulated dot64 (exact ~1e-14 at any contraction
            # length, utils/precision.py); only the m0 x m0 blocks cross
            # to the host for the small exact eighs.
            q = filter_step(factors, y)
            wmat = _whiten_mat(np.asarray(_gram64(q)))
            q, ab_d = _whiten_rr64(q, jnp.asarray(wmat))
            ab = np.asarray(ab_d)
            aq, bq = ab[0], ab[1]
        else:
            q, aq_d, bq_d = filter_step(factors, y)
            aq = np.asarray(aq_d)
            bq = np.asarray(bq_d)

        # ---- Rayleigh-Ritz (m0 x m0 reduced problem, Feast.hs:153-154)
        # on host; outputs padded back to the static m0 width
        lam, coeff = _reduced_geig(aq, bq)
        m_kept = int(coeff.shape[1])
        coeff_pad = np.zeros((m0, m0), dtype=coeff.dtype)
        coeff_pad[:, :m_kept] = coeff
        lam_pad = np.zeros((m0,), dtype=np.float64)
        lam_pad[:m_kept] = np.real(lam)
        keep = np.zeros((m0,), dtype=np.float64)
        keep[:m_kept] = 1.0

        # ---- residuals + warm-restart subspace, second device program
        res_pad, y, x_dev = ritz_step(
            q, jnp.asarray(coeff_pad.real if use_embed else coeff_pad),
            jnp.asarray(lam_pad),
            jnp.asarray(keep), jax.random.key(params.seed + loop + 1),
        )
        res = np.asarray(res_pad)[:m_kept]
        lam = np.real(lam)[:m_kept]

        inside_k = (lam >= emin) & (lam <= emax)
        m_found = int(inside_k.sum())
        epsout = float(res[inside_k].max()) if m_found else float(res.max())
        if params.debug:
            print(
                f"feast loop {loop}: m={m_found}, epsout={epsout:.3e}, "
                f"lam_in={np.sort(lam[inside_k])[:8]}"
            )

        lam_np, res_np = lam[inside_k], res[inside_k]
        m_kept = len(lam)
        inside = np.zeros((m0,), dtype=bool)
        inside[:m_kept] = inside_k

        if m_found and epsout <= params.tol:
            info = INFO_OK
            break
        if m_found == 0 and loop >= 2:
            info = INFO_NO_EIGENVALUES
            break
        # stagnation: two consecutive loops without meaningful progress
        # means the solver-accuracy floor has been reached
        if loop >= 2 and epsout > 0.5 * eps_prev:
            stalls += 1
            if stalls >= 2:
                break
        else:
            stalls = 0
        eps_prev = min(eps_prev, epsout)

    if len(lam_np) == m0:
        # all m0 Ritz pairs land inside the interval: the subspace is (or may
        # be) too small to capture the full invariant subspace — the reference
        # warning case (Feast.hs:252-257).  Flagged regardless of convergence,
        # since a too-small subspace also prevents convergence.
        info = INFO_SUBSPACE_TOO_SMALL

    if x_dev is not None:
        x_np = np.asarray(x_dev)[:, inside]
    else:
        x_np = np.zeros((n, 0))

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


def count_eigenvalues(interval, mat_a, mat_b=None, probes: int = 16,
                      params: FeastParams = FeastParams(),
                      seed: int = 0) -> float:
    """Stochastic estimate of the NUMBER of eigenvalues in ``interval`` —
    FEAST 4.x's stochastic-estimate mode (fpm(14)=2; the reference binds a
    2.x RCI without it, Feast/Internal.hs:61-73).  Use it to size ``m0``
    before a full ``eigsh``/``geigsh`` run.

    Hutchinson trace estimator on the spectral projector
    P = contour integral of (zB - A)^{-1} B: with s Rademacher probes x_i,
    count ~= (1/s) sum_i x_i^H P x_i, where each P x_i reuses the SAME
    batched shifted factorizations as the full solver (one per contour
    node).  Standard error scales like sqrt(count)/sqrt(s) — a handful of
    probes places the count within a few eigenpairs.

    Real symmetric pencils route through the cached TPU pipeline
    (eig/real_pipeline.py), so a following ``geigsh`` on the same pencil
    reuses the factorizations for free; complex Hermitian pencils ride the
    same accelerator path through the real 2n ring embedding
    (solve/complex_embed.py) — batched embedded factorizations on device,
    exactly like ``geigsh``'s zfeast-class branch."""
    emin, emax = float(interval[0]), float(interval[1])
    if emax <= emin:
        raise ValueError("count_eigenvalues: empty interval")
    n = mat_a.shape[0]
    if mat_b is None:
        from sparse_linear_tpu.dtypes import real_of
        from sparse_linear_tpu.formats.matrix import eye

        mat_b = eye(n, dtype=real_of(mat_a.dtype))
    in_dtype = np.result_type(mat_a.dtype, mat_b.dtype)
    real_input = not np.issubdtype(in_dtype, np.complexfloating)
    if params.check_hermitian:
        _check_hermitian(mat_a, "A")
        _check_hermitian(mat_b, "B")

    z_nodes, sigma = _contour(emin, emax, params.contour_points,
                              kind=getattr(params, 'quadrature', 'gauss'))
    ne = len(z_nodes)
    s = int(max(1, probes))
    rng = np.random.default_rng(seed)
    x = rng.choice(np.asarray([-1.0, 1.0]), size=(n, s))  # Rademacher

    if real_input:
        # 2 Re sum_k sigma_k x^T S_k^{-1} (B x): the lower semicircle is the
        # conjugate for a real symmetric pencil (see _contour), and
        # x^T S_k^{-H} B x = conj(x^T S_k^{-1} B x) by complex symmetry of
        # S_k = z_k B - A.
        from sparse_linear_tpu.eig.real_pipeline import _get_pipeline

        pipe = _get_pipeline(mat_a, mat_b, params.backend, params.dims)
        fac = pipe.factors_for(z_nodes)
        progs = pipe.programs(ne, s, z_nodes, sigma)
        xj = jnp.asarray(x)
        _, stack = progs["pre"](xj)
        s32 = solve_api.solve_batched(fac, stack)
        q, _ = progs["combine_gram"](s32)
        return float(jnp.sum(jnp.asarray(x) * q) / s)

    # complex Hermitian pencil: batched factorizations through the real 2n
    # ring embedding (solve/complex_embed.py) — the same accelerator path
    # as geigsh's zfeast-class branch.  E(S)^T = E(S^H), so the plain
    # transpose solve on the embedded factors IS the conjugate solve; f32
    # embedded factors on an accelerator are ample for a count estimate
    # (relative error ~1e-6 vs a sqrt(count/probes) statistical error).
    from sparse_linear_tpu.solve import complex_embed as ce
    from sparse_linear_tpu.solve import ordering as ord_mod

    cdtype = complex_of(in_dtype)
    union_b, _, stack_c = _union_shift_stack(mat_a, mat_b, z_nodes,
                                             real_input=False)
    pattern_r, eperm = ce.embed_pattern(union_b)
    if params.backend == "multifrontal" and params.dims is not None:
        base = ord_mod.nested_dissection_grid(params.dims)
        symbolic = solve_api.analyze(
            pattern_r, backend="multifrontal", perm=ce.embed_perm(base)
        )
    else:
        symbolic = solve_api.analyze(pattern_r, backend=params.backend)
    solve_dtype = (
        np.float32 if jax.default_backend() != "cpu" else np.float64
    )
    data_stack = jnp.asarray(
        ce.embed_data(stack_c, np.asarray(eperm)).astype(solve_dtype)
    )
    fac = solve_api.factor_batched(pattern_r, data_stack, symbolic)
    xc = x.astype(cdtype)
    bx = spmm(mat_b.tocsr(), jnp.asarray(xc))          # complex (n, s)
    bx_e = jnp.asarray(_np_embed(np.asarray(bx)).astype(solve_dtype))
    stack = jnp.broadcast_to(bx_e[None], (ne, 2 * n, s))
    y_n_e = solve_api.solve_batched(fac, stack)            # E(S^{-1}) B x
    y_h_e = solve_api.solve_batched(fac, stack, trans=True)  # E(S^{-H}) B x
    y_n = (y_n_e[:, 0::2, :] + 1j * y_n_e[:, 1::2, :]).astype(jnp.complex128)
    y_h = (y_h_e[:, 0::2, :] + 1j * y_h_e[:, 1::2, :]).astype(jnp.complex128)
    sig = jnp.asarray(np.asarray(sigma))
    xcj = jnp.asarray(np.conj(xc))
    t_n = jnp.einsum("ns,kns->k", xcj, y_n)
    t_h = jnp.einsum("ns,kns->k", xcj, y_h)
    est = jnp.sum(sig * t_n) + jnp.sum(jnp.conj(sig) * t_h)
    return float(jnp.real(est) / s)


def geigsh_sliced(interval, mat_a, mat_b=None, m0_max: int = 64,
                  params: FeastParams = FeastParams(), probes: int = 16,
                  max_depth: int = 8) -> EigResult:
    """Spectrum slicing: solve a WIDE interval whose eigenpair count
    exceeds one practical subspace by recursively bisecting it until each
    slice's stochastic count estimate (``count_eigenvalues``) fits in
    ``m0_max``, solving each slice independently, and merging.

    This is the standard scaling workflow for contour eigensolvers (FEAST
    4.x ships it as contour splitting; the reference's 2.x binding leaves
    it to the user, Feast.hs:115-240 solves one fixed interval).  Slices
    are independent — each gets its own contour factorizations, so on a
    mesh they distribute exactly like contour nodes (P3/P4).

    A slice whose solve reports INFO_SUBSPACE_TOO_SMALL (the estimate
    undershot) is bisected and re-solved rather than silently dropping
    pairs.  Returns one merged EigResult: values ascending, vectors
    column-concatenated, ``iterations`` summed over slices, ``epsout`` the
    worst slice, ``subspace`` the concatenated converged vectors (a warm
    start for a re-solve of the full interval)."""
    emin, emax = float(interval[0]), float(interval[1])
    if emax <= emin:
        raise ValueError("geigsh_sliced: empty interval")
    if m0_max < 4:
        raise ValueError("geigsh_sliced: m0_max must be >= 4")

    def margin(est):
        return int(np.ceil(max(est, 0.0) * 1.25)) + 4

    # recursively partition until the estimated count fits
    slices = []
    stack = [(emin, emax, 0)]
    while stack:
        lo, hi, depth = stack.pop()
        est = count_eigenvalues((lo, hi), mat_a, mat_b, probes=probes,
                                params=params)
        if margin(est) <= m0_max or depth >= max_depth:
            slices.append((lo, hi, min(max(margin(est), 8), m0_max)))
        else:
            mid = 0.5 * (lo + hi)
            stack.append((mid, hi, depth + 1))
            stack.append((lo, mid, depth + 1))
    slices.sort()

    results = []
    total_loops = 0
    worst_eps = 0.0
    worst_info = INFO_NO_EIGENVALUES
    i = 0
    while i < len(slices):
        lo, hi, m0 = slices[i]
        i += 1
        if mat_b is None:
            res = eigsh(m0, (lo, hi), mat_a, params)
        else:
            res = geigsh(m0, (lo, hi), mat_a, mat_b, params)
        if (res.info == INFO_SUBSPACE_TOO_SMALL
                or (res.n_found >= m0 and m0 < m0_max)):
            # estimate undershot: bisect this slice and redo both halves
            mid = 0.5 * (lo + hi)
            if hi - lo > 1e-12 * max(abs(emin), abs(emax), 1.0):
                slices.insert(i, (mid, hi, m0))
                slices.insert(i, (lo, mid, m0))
                continue
        total_loops += res.iterations
        # drop unconverged junk pairs (residual far above tolerance) —
        # a slice that hit max_loops can report spectral-filter leftovers
        # at O(1) residual alongside its converged pairs
        gate = max(1e4 * params.tol, 1e-8)
        rk = np.asarray(res.residuals) <= gate
        if res.n_found and not np.all(rk):
            res = res._replace(
                values=np.asarray(res.values)[rk],
                vectors=np.asarray(res.vectors)[:, rk],
                residuals=np.asarray(res.residuals)[rk],
                n_found=int(rk.sum()),
            )
        if res.n_found:
            worst_eps = max(worst_eps, float(np.max(res.residuals)))
            worst_info = max(
                worst_info if worst_info != INFO_NO_EIGENVALUES else 0,
                res.info if res.info != INFO_NO_EIGENVALUES else 0,
            )
            results.append(res)

    if not results:
        n = mat_a.shape[0]
        return EigResult(values=np.zeros(0), vectors=np.zeros((n, 0)),
                         n_found=0, iterations=total_loops, epsout=0.0,
                         residuals=np.zeros(0), info=INFO_NO_EIGENVALUES,
                         subspace=np.zeros((n, 0)))

    values = np.concatenate([np.asarray(r.values) for r in results])
    vectors = np.concatenate(
        [np.asarray(r.vectors) for r in results], axis=1
    )
    residuals = np.concatenate([np.asarray(r.residuals) for r in results])
    order = np.argsort(values)
    values, vectors, residuals = (
        values[order], vectors[:, order], residuals[order]
    )
    # an eigenvalue landing exactly on a cut can appear in both slices —
    # including DEGENERATE ones, where the two slices may return different
    # vectors of the same eigenspace.  Dedup group-wise: within each
    # near-equal value group, keep a vector only if it has a substantial
    # component outside the span of the vectors already kept.
    scale = max(abs(emin), abs(emax), 1.0)
    m = values.size
    keep = np.ones(m, dtype=bool)
    j0 = 0
    for j in range(1, m + 1):
        if j < m and abs(values[j] - values[j - 1]) < 1e-9 * scale:
            continue
        if j - j0 > 1:  # group [j0, j) of equal values
            basis: list = []
            for t in range(j0, j):
                v = vectors[:, t].astype(np.complex128)
                v = v / max(np.linalg.norm(v), 1e-300)
                for bvec in basis:
                    v = v - bvec * np.vdot(bvec, v)
                nv = np.linalg.norm(v)
                if nv < 0.5:  # numerically inside the kept span: duplicate
                    keep[t] = False
                else:
                    basis.append(v / nv)
        j0 = j
    values, vectors, residuals = (
        values[keep], vectors[:, keep], residuals[keep]
    )
    return EigResult(
        values=values, vectors=vectors, n_found=int(values.size),
        iterations=total_loops, epsout=worst_eps, residuals=residuals,
        info=worst_info, subspace=vectors,
    )


def eigsh_sliced(interval, mat_a, m0_max: int = 64,
                 params: FeastParams = FeastParams(), probes: int = 16,
                 max_depth: int = 8) -> EigResult:
    """Standard-problem spectrum slicing (B = I); see ``geigsh_sliced``."""
    return geigsh_sliced(interval, mat_a, None, m0_max=m0_max,
                         params=params, probes=probes, max_depth=max_depth)
