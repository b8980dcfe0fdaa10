"""Chebyshev-filtered subspace iteration — the factorization-free TPU
eigensolver for the LOWEST part of a symmetric spectrum.

FEAST (eig/feast.py — the reference's capability, feast/src/Numeric/
LinearAlgebra/Feast.hs:115-240) filters with rational functions, which costs
one sparse factorization per contour node: at 1M+ dof each factorization is
GBs of HBM and seconds of MXU time.  For the common "k lowest eigenpairs"
problem there is a purely polynomial filter: a degree-p Chebyshev polynomial
of A damps the unwanted spectrum [emax, lam_ub] by T_p's exponential growth
outside [-1, 1], and its only operator access is SpMM — the op this
framework streams at HBM speed (kernels/spmv.dia_spmm, spmv_well).  This is
the ChASE/FILTLAN-class method, re-hosted on the TPU:

* block three-term recurrence with ChASE's sigma-scaling (overflow-safe),
* CholeskyQR2 orthonormalization — two Gram+Cholesky+triangular-solve
  passes, all MXU matmuls via the f64-exact chunked ``dot64``; no
  column-by-column Gram-Schmidt,
* Rayleigh-Ritz on the m0 x m0 host eigh (same staging as the FEAST
  pipeline), residual-gated convergence, adaptive extra passes.

Scope: standard problems (B = I), lowest interval [emin, emax] with emin at
or below the spectrum floor.  Interior intervals need rational filters —
use ``eigsh``/``geigsh``.  Scale caveat (measured): on heavily crowded
lowest clusters (1M-dof 2D Poisson, 50 lowest pairs) the filtered basis
degenerates numerically before 1e-10 — CholeskyQR2's Gram floor meets the
filter's dynamic range and the sweep stalls near 1e-3 (48-49/50 pairs
found, degree 316 and 1200 alike).  The streaming-contour ``eigsh``
(rational filter, factorization-backed) converges there in 2-3 loops and
is the production engine at that scale; this module remains the
factorization-free option for moderate n (covered by tests to ~65k dof).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sparse_linear_tpu.utils.precision import dot64

__all__ = ["eigsh_filtered", "lanczos_upper_bound"]


def lanczos_upper_bound(a_mm, n: int, iters: int = 30, seed: int = 7,
                        dtype=jnp.float64) -> float:
    """Cheap upper bound on lambda_max(A): ``iters`` Lanczos steps plus the
    final residual norm as a safety margin (Parlett's bound)."""
    v = jax.random.normal(jax.random.key(seed), (n,), dtype=dtype)
    v = v / jnp.linalg.norm(v)
    alphas, betas = [], []
    v_prev = jnp.zeros_like(v)
    beta = 0.0
    for _ in range(iters):
        w = a_mm(v[:, None])[:, 0]
        alpha = jnp.vdot(v, w)
        w = w - alpha * v - beta * v_prev
        beta_new = jnp.linalg.norm(w)
        alphas.append(float(alpha))
        betas.append(float(beta_new))
        v_prev = v
        beta = beta_new
        v = w / jnp.maximum(beta_new, jnp.finfo(dtype).tiny)
    t = np.diag(alphas) + np.diag(betas[:-1], 1) + np.diag(betas[:-1], -1)
    ew, ev = np.linalg.eigh(t)
    # Parlett: lambda_max <= max Ritz value + |last beta * last component|
    bound = float(ew[-1] + abs(betas[-1] * ev[-1, -1]))
    return bound * 1.01 + 1e-12


def _cholqr2(y):
    """CholeskyQR2: orthonormalize a tall block with two Gram/Cholesky
    passes (f64 Grams via dot64; Cholesky on host — m0 x m0)."""
    for _ in range(2):
        g = np.asarray(dot64(y.T, y))
        # spectral floor guard: a rank-deficient filtered block gets a
        # tiny diagonal shift rather than a Cholesky breakdown
        d = np.diag(g).max()
        try:
            r = np.linalg.cholesky(
                g + np.eye(g.shape[0]) * d * 1e-15
            )
        except np.linalg.LinAlgError:
            r = np.linalg.cholesky(g + np.eye(g.shape[0]) * d * 1e-8)
        rinv = np.linalg.inv(r).T  # y @ rinv orthonormalizes
        y = dot64(y, jnp.asarray(rinv))
    return y


def _make_filter(a_mm, y_example, deg: int):
    """ONE compiled program for the whole degree-``deg`` block filter.

    A Python loop of eager ``a_mm`` calls (the first cut) dispatches
    ``deg`` ops per pass through the runtime: at 1M x 64 each intermediate
    is 512 MB and the async queue pinned hundreds of them — measured
    ~14 s/pass of dispatch latency and an eventual RESOURCE_EXHAUSTED.
    ``closure_convert`` turns the operator closure's captured arrays into
    ARGUMENTS (a closure-constant operator would be re-shipped as program
    literals on every execution by this runtime), and the three-term
    recurrence runs as a ``fori_loop`` with two carried blocks.

    Relayout-bound operators (WELL: ``prefers_planes``) run the whole
    recurrence in the kernel-native plane-major (m, n) layout — the
    three-term updates are elementwise, so the only transposes are one
    into and one out of the filter, instead of two per SpMM (deg per
    pass)."""
    import functools

    use_planes = (getattr(a_mm, "prefers_planes", False)
                  and getattr(a_mm, "planes", None) is not None)
    mm = a_mm.planes if use_planes else a_mm
    ex = y_example.T if use_planes else y_example
    pure_mm, consts = jax.closure_convert(mm, ex)

    @functools.partial(jax.jit, static_argnames=("deg",))
    def run(consts, y, center, half, lam0, deg):
        sigma0 = half / (center - lam0)
        tau = 2.0 / sigma0
        y1 = (pure_mm(y, *consts) - center * y) * (sigma0 / half)

        def body(i, c):
            y0, y1, sigma = c
            sn = 1.0 / (tau - sigma)
            y2 = 2.0 * (sn / half) * (pure_mm(y1, *consts) - center * y1) \
                - (sigma * sn) * y0
            return (y1, y2, sn)

        _, y1, _ = jax.lax.fori_loop(1, deg, body, (y, y1, sigma0))
        return y1

    def filt(y, center, half, lam0):
        if use_planes:
            return run(consts, y.T, jnp.float64(center), jnp.float64(half),
                       jnp.float64(lam0), deg=deg).T
        return run(consts, y, jnp.float64(center), jnp.float64(half),
                   jnp.float64(lam0), deg=deg)

    return filt


def eigsh_filtered(m0, interval, mat_a, tol: float = 1e-10,
                   degree: int | None = None, max_passes: int = 24,
                   lam_ub: float | None = None, seed: int = 0,
                   dims=None):
    """~All eigenpairs of symmetric ``mat_a`` in the LOWEST interval
    ``[emin, emax]`` by Chebyshev-filtered subspace iteration.

    Factorization-free: the only operator access is the structured SpMM
    (DIA/WELL/BSR fast paths via the FEAST pipeline's operator router), so
    cost is O(degree x passes) SpMMs — at 1M dof each SpMM is
    milliseconds on the chip, where every FEAST contour node costs a GB-
    scale factorization.  Returns the same ``EigResult`` as ``eigsh``.

    ``m0``: subspace block (> expected pair count).  ``degree``: filter
    degree per pass (default: adaptive from the spectral ratio).
    ``lam_ub``: spectrum upper bound (default: Lanczos estimate).
    """
    from sparse_linear_tpu.eig.feast import (
        EigResult, INFO_NO_EIGENVALUES, INFO_NOT_CONVERGED, INFO_OK,
        INFO_SUBSPACE_TOO_SMALL,
    )
    from sparse_linear_tpu.eig.real_pipeline import _structured_op

    emin, emax = float(interval[0]), float(interval[1])
    if emax <= emin:
        raise ValueError("eigsh_filtered: empty interval")
    n = mat_a.shape[0]
    if m0 < 2:
        raise ValueError("eigsh_filtered: m0 must be >= 2")
    a_mm, _ = _structured_op(mat_a)

    if lam_ub is None:
        lam_ub = lanczos_upper_bound(a_mm, n)
    if emax >= lam_ub:
        raise ValueError(
            "eigsh_filtered: interval reaches the spectrum's upper bound — "
            "the polynomial filter needs emax < lambda_max; use eigsh()"
        )
    center = 0.5 * (lam_ub + emax)
    half = 0.5 * (lam_ub - emax)
    if degree is None:
        # damping ~ exp(-2 deg sqrt(gap ratio)): size for ~1e6 per pass
        ratio = max((emax - emin) / max(lam_ub - emin, 1e-300), 1e-12)
        degree = int(np.clip(14.0 / np.sqrt(ratio) / 2.0, 30, 400))

    y = jax.random.normal(jax.random.key(seed), (n, m0), dtype=jnp.float64)
    lam0 = emin
    tiny = np.finfo(np.float64).tiny
    lam_scale = max(abs(emin), abs(emax), 1.0)
    info = INFO_NOT_CONVERGED
    lam_np = np.zeros((0,))
    res_np = np.zeros((0,))
    x_dev = None
    ax = None
    ew = None
    epsout = np.inf
    passes = 0

    def rayleigh_ritz(basis, m_keep):
        """Orthonormalize, project, solve, return the m_keep lowest Ritz
        pairs with their A-images and residual data."""
        q = _cholqr2(basis)
        aq = a_mm(q)
        h = np.asarray(dot64(q.T, aq))
        ew, ev = np.linalg.eigh((h + h.T) / 2)
        sel = jnp.asarray(ev[:, :m_keep])
        x = dot64(q, sel)
        ax = dot64(aq, sel)
        return ew[:m_keep], x, ax

    filt = _make_filter(a_mm, y, degree)
    expand_next = False
    for it in range(max_passes):
        passes = it + 1
        if epsout > 1e-7 or not expand_next:
            # filter pass: high-gain Chebyshev filtering of the block
            x_dev = ax = None  # free last pass's blocks (recomputed below)
            y = filt(y, center, half, lam0)
            ew, x_dev, ax = rayleigh_ritz(y, m0)
            expand_next = True
        else:
            # near convergence the filter alone floors around 1e-9: its
            # ~1e6 gain disparity aliases roundoff into the weak
            # (near-edge) modes, whose correction directions live just
            # ABOVE the filter edge (where the filter damps).  Alternating
            # a residual-expanded Rayleigh-Ritz ([X | R] basis) with
            # filter passes restores them to the f64 floor — measured
            # monotone ~6x/pass to 1e-11 where either alone stalls.
            rblk = ax - x_dev * jnp.asarray(ew)[None, :]
            rn = jnp.linalg.norm(rblk, axis=0)
            basis = jnp.concatenate(
                [x_dev, rblk / jnp.maximum(rn, 1e-300)], axis=1
            )
            # free the dead (n, m0) blocks BEFORE the wide-basis RR: at
            # 1M dof each is 512 MB and the doubled-basis CholeskyQR is
            # the solve's HBM peak (OOM observed with them live)
            del rblk, rn
            x_dev = ax = y = None
            ew, x_dev, ax = rayleigh_ritz(basis, m0)
            del basis
            expand_next = False
        rnorm = np.asarray(jnp.linalg.norm(
            ax - x_dev * jnp.asarray(ew)[None, :], axis=0
        ))
        xnorm = np.asarray(jnp.linalg.norm(x_dev, axis=0))
        res_all = rnorm / np.maximum(xnorm, tiny) / lam_scale
        inside = (ew >= emin) & (ew <= emax)
        m_found = int(inside.sum())
        epsout = float(res_all[inside].max()) if m_found else float(
            res_all.min()
        )
        lam_np, res_np = ew[inside], res_all[inside]
        # steer the filter at the current Ritz floor (sharper each pass)
        lam0 = float(min(ew.min(), emin))
        if m_found and epsout <= tol:
            info = INFO_OK
            break
        if m_found == 0 and it >= 2:
            info = INFO_NO_EIGENVALUES
            break
        y = x_dev
    if len(lam_np) == m0:
        info = INFO_SUBSPACE_TOO_SMALL

    if y is None:
        # the residual-expansion branch frees y before its RR; a break in
        # that same pass would otherwise ship subspace=None to warm-restart
        # consumers — the Ritz block is the correct restart subspace
        y = x_dev

    order = np.argsort(lam_np)
    if x_dev is not None and lam_np.size:
        sel = jnp.asarray(np.nonzero(inside)[0][order])
        vectors = x_dev[:, sel]
    else:
        vectors = jnp.zeros((n, 0))
    return EigResult(
        values=lam_np[order],
        vectors=vectors,
        n_found=len(lam_np),
        iterations=passes,
        epsout=epsout,
        residuals=res_np[order],
        info=info,
        subspace=y,
    )
