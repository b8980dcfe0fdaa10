"""Cached device-resident FEAST pipeline for real symmetric pencils on TPU.

This is the accelerator fast path of :func:`sparse_linear_tpu.eig.feast.geigsh`
for real-symmetric (A, B): the case of the reference's ``dfeast_srci`` driver
(reference: feast/src/Numeric/LinearAlgebra/Feast/Internal.hs:67-71,
Feast.hs:115-240).  It differs from the generic driver in four ways, each
worth a large constant factor on the TPU:

1. **Pattern-keyed pipeline cache.**  Symbolic analysis, the real 2n
   embedding of the shifted complex systems, the structured fast-SpMM
   operators, and every jitted device program are built once per
   (pattern, values) key and reused across calls — the reference's
   "analyze once, the shape never changes" staging (Feast.hs:210-212)
   promoted to the whole pipeline.

2. **Transpose solves eliminated.**  For a real pencil and real RHS,
   (conj(z) B - A)^{-1} r = conj((z B - A)^{-1} r): the lower-semicircle
   (ijob=21) solves are conjugates of the upper ones, so the quadrature
   needs only the S-solves and doubles their real part
   (q = 2 Re sum_k sigma_k S_k).  Halves all solve work.

3. **Contour-batched factor + solve.**  All ne shifted factorizations run
   as ONE batched device program (vmapped multifrontal), and each
   refinement loop's multi-RHS solves are one batched dispatch — measured
   0.5 s factor + 0.12 s solve for ne=8 at 2n=73728 where per-node
   dispatch chains cost 3.1 s + 0.3 s per solve round.

4. **Device-resident Rayleigh-Ritz.**  Whitening Grams, reduced-problem
   blocks, Ritz vectors, and residuals stay on device in f64 via the
   chunk-accumulated ``dot64`` (utils/precision.py — exact to ~1e-14 at any
   contraction length); only the m0 x m0 eigenproblems cross to the host
   (~50 KB per loop instead of the full (n, m0) subspace).

Solve accuracy is staged: loop 0 runs plain f32 solves (the contour filter
itself limits that loop to ~1e-6), later loops add mixed-precision
refinement steps with f64 residuals in the ORIGINAL complex space through
the structured SpMM closures.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from sparse_linear_tpu.utils.precision import dot64

__all__ = ["geigsh_real_tpu", "clear_pipeline_cache"]

_PIPELINE_CACHE: dict = {}
_PIPELINE_CACHE_MAX = 4
_FACTOR_CACHE_MAX = 2  # batched shifted factor sets per pipeline (HBM-heavy)


def clear_pipeline_cache() -> None:
    """Drop every cached pipeline (symbolic analyses, jitted programs, and
    the batched shifted FACTOR sets, which pin GB-scale HBM at large n).
    Call between unrelated large problems to release device memory; the
    next solve rebuilds from scratch."""
    _PIPELINE_CACHE.clear()


def _fingerprint(mat) -> tuple:
    csr = mat.tocsr()
    ip = np.asarray(csr.indptr)
    ix = np.asarray(csr.indices)
    da = np.asarray(csr.data)
    return (
        csr.shape,
        hash(ip.tobytes()),
        hash(ix.tobytes()),
        hash(da.tobytes()),
    )


class _StructuredOp:
    """Device SpMM closure with an optional plane-major fast path.

    ``op(X)`` consumes column-major (n, m) blocks (the solve-boundary
    layout).  ``op.planes(Xp)`` — when not None — consumes plane-major
    (m, n) blocks and returns (m, nr): the native layout of the WELL
    Pallas kernels (kernels/spmv_well.well_spmm_planes), where the
    column-major wrapper pays two full-block relayouts per product.
    ``prefers_planes`` marks operators that are relayout-bound in
    column-major (WELL); consumers that can hold their block plane-major
    across several products (the FEAST residual/Rayleigh-Ritz programs,
    the Chebyshev three-term recurrence) switch layout when it is set.
    """

    __slots__ = ("cm", "planes", "prefers_planes", "is_identity")

    def __init__(self, cm, planes=None, prefers_planes=False,
                 is_identity=False):
        self.cm = cm
        self.planes = planes
        self.prefers_planes = prefers_planes
        self.is_identity = is_identity

    def __call__(self, X):
        return self.cm(X)


def _structured_op(mat):
    """(spmm_op, is_identity) — the fast device SpMM for this operator:

    * identity -> no-op,
    * banded   -> DIA shifted-slice SpMM (exact in f64 on the VPU),
    * unstructured 32-bit -> WELL multi-RHS Pallas kernel (plane-major
      native — ``op.planes`` skips the wrapper's per-call relayouts),
    * unstructured f64    -> BSR batched block GEMMs (per-block contraction
      length <= 128 keeps the emulated-f64 MXU accumulation exact — the
      same chunking argument as utils/precision.dot64),
    * fallback -> generic scatter spmm.
    """
    from sparse_linear_tpu.eig.feast import _is_identity

    if _is_identity(mat):
        return _StructuredOp((lambda X: X), planes=(lambda Xp: Xp),
                             is_identity=True), True
    csr = mat.tocsr()
    try:
        from sparse_linear_tpu.formats.structured import csr_to_dia
        from sparse_linear_tpu.kernels.spmv import dia_spmm, dia_spmm_planes

        d = csr_to_dia(csr, max_diags=64)
        return _StructuredOp(
            (lambda X: dia_spmm(d, X)),
            planes=(lambda Xp: dia_spmm_planes(d, Xp)),
        ), False
    except (ValueError, TypeError):
        pass
    nnz = int(csr.nnz)
    if np.dtype(csr.dtype).itemsize <= 4:
        try:
            from sparse_linear_tpu.formats.well import csr_to_well
            from sparse_linear_tpu.kernels.spmv_well import (
                well_spmm, well_spmm_planes,
            )

            w = csr_to_well(csr)
            if w.fill >= 1.0 / 64.0:
                # plane-major is the kernel-native layout: the column-major
                # wrapper costs two (n, m) relayouts per product (VERDICT
                # r4 item 2 / advisor r3) — consumers holding plane-major
                # blocks run at the kernel's benched bandwidth
                return _StructuredOp(
                    (lambda X: well_spmm(w, X)),
                    planes=(lambda Xp: well_spmm_planes(w, Xp)),
                    prefers_planes=True,
                ), False
        except (ValueError, TypeError):
            pass
    else:
        try:
            from sparse_linear_tpu.formats.structured import csr_to_bsr
            from sparse_linear_tpu.kernels.spmv import bsr_spmm

            bm, bn = 8, 128
            nr, nc = csr.shape
            nr_p = -(-nr // bm) * bm
            nc_p = -(-nc // bn) * bn
            from sparse_linear_tpu.formats.matrix import CSR as _CSR

            ip = np.asarray(csr.indptr)
            padded = _CSR(
                indptr=jnp.asarray(np.concatenate(
                    [ip, np.full(nr_p - nr, ip[-1], dtype=ip.dtype)]
                )),
                indices=csr.indices, data=csr.data, shape=(nr_p, nc_p),
            )
            bsr = csr_to_bsr(padded, block_shape=(bm, bn))
            if int(bsr.blocks.size) <= 64 * max(nnz, 1):
                def _bsr_mm(X, _b=bsr, _nr=nr, _nc=nc, _ncp=nc_p):
                    Xp = jnp.pad(X, ((0, _ncp - _nc), (0, 0)))
                    return bsr_spmm(_b, Xp)[:_nr]

                return _StructuredOp(_bsr_mm), False
        except (ValueError, TypeError):
            pass
    from sparse_linear_tpu.ops.linalg import spmm

    return _StructuredOp(lambda X: spmm(mat, X)), False


class _RealPencilPipeline:
    """All pattern/value-dependent state for one (A, B, backend, dims)."""

    def __init__(self, mat_a, mat_b, backend: str, dims):
        from sparse_linear_tpu.eig.feast import _is_identity
        from sparse_linear_tpu.ops.linalg import lin
        from sparse_linear_tpu.solve import api as solve_api
        from sparse_linear_tpu.solve import complex_embed as ce
        from sparse_linear_tpu.solve import ordering as ord_mod

        self.n = mat_a.shape[0]
        self.backend = backend
        # union-pattern matrices carrying B resp. A values (Feast.hs:210-218:
        # one symbolic serves every contour node)
        union_b = lin(1.0, mat_b, 0.0, mat_a)
        union_a = lin(0.0, mat_b, 1.0, mat_a)
        self.union_a_data = np.asarray(union_a.data)
        self.union_b_data = np.asarray(union_b.data)
        self.pattern_r, self.eperm = ce.embed_pattern(union_b)
        self.eperm_np = np.asarray(self.eperm)
        if backend == "multifrontal":
            if dims is not None:
                base = ord_mod.nested_dissection_grid(dims)
                self.symbolic = solve_api.analyze(
                    self.pattern_r, backend="multifrontal",
                    perm=ce.embed_perm(base),
                )
            else:
                self.symbolic = solve_api.analyze(
                    self.pattern_r, backend="multifrontal"
                )
        else:
            self.symbolic = solve_api.analyze(self.pattern_r, backend=backend)

        self.a_mm, _ = _structured_op(mat_a)
        self.b_mm, self.b_is_ident = _structured_op(mat_b)
        # plane-major pipeline: when either operator is relayout-bound in
        # column-major (WELL — kernel-native layout is (m, n) planes), the
        # residual/Rayleigh-Ritz programs hold their blocks plane-major and
        # transpose ONCE at the solve boundary instead of per product
        # (VERDICT r4 item 2; reference hot multiply Feast.hs:203-208)
        self.use_planes = bool(
            (self.a_mm.prefers_planes or self.b_mm.prefers_planes)
            and self.a_mm.planes is not None
            and self.b_mm.planes is not None
        )

        # f32 factor-artifact footprint of ONE shifted factorization —
        # drives the batched-vs-streaming contour decision (HBM budget).
        # Non-multifrontal symbolics (dense/CG backends) have no schedule;
        # a dense 2n x 2n estimate stands in.
        sched = getattr(self.symbolic, "schedule", None)
        if sched is not None:
            self.artifact_f32_bytes = 4 * sum(
                b["sup_ids"].shape[0]
                * (b["Ns"] ** 2 + 2 * b["Ns"] * b["Us"])
                for b in sched["flat"]
            )
        else:
            self.artifact_f32_bytes = 4 * (2 * self.n) ** 2

        # jitted per-(ne, m0) programs, built lazily
        self._programs: dict = {}
        # shifted factorizations keyed by the contour nodes: re-solving the
        # same interval (warm restart, repeated calls) skips the batched
        # refactorization — the values are already part of the pipeline key
        self._factors: dict = {}
        # host-embedded per-node value sets for the streaming path
        self._stream_data: dict = {}

    # -- device programs -------------------------------------------------

    def programs(self, ne: int, m0: int, z_nodes, sigma):
        key = (ne, m0, hash(np.asarray(z_nodes).tobytes()))
        if key in self._programs:
            return self._programs[key]

        a_mm, b_mm = self.a_mm, self.b_mm
        a_pl, b_pl = self.a_mm.planes, self.b_mm.planes
        use_planes = self.use_planes
        n = self.n
        sig_re = jnp.asarray(np.real(sigma))
        sig_im = jnp.asarray(np.imag(sigma))
        z_re = jnp.asarray(np.real(z_nodes))
        z_im = jnp.asarray(np.imag(z_nodes))

        @jax.jit
        def pre(y):
            """B y -> embedded f32 RHS stack (ne, 2n, m0) + f64 By."""
            by = b_mm(y).astype(jnp.float64)
            by_e = jnp.stack(
                [by, jnp.zeros_like(by)], axis=1
            ).reshape(2 * n, m0)
            stack = jnp.broadcast_to(by_e, (ne, 2 * n, m0))
            return by, stack.astype(jnp.float32)

        @jax.jit
        def resid(s64, by64):
            """f64 residual of the embedded solves, computed in the ORIGINAL
            complex space through the structured SpMMs: r_k = by - (z_k B - A) s_k
            (O(n m) per node; the embedded-CSR scatter would OOM).

            Plane-major variant (use_planes): the four per-node products and
            everything elementwise downstream run in the WELL kernels'
            native (m, n) layout, with ONE relayout into and one out of the
            solve-boundary (2n, m0) layout, instead of two per product."""
            sr = s64[:, 0::2, :]
            si = s64[:, 1::2, :]
            zr = z_re[:, None, None]
            zi = z_im[:, None, None]
            if use_planes:
                srp = jnp.swapaxes(sr, 1, 2)  # (ne, m0, n)
                sip = jnp.swapaxes(si, 1, 2)
                asr = jax.vmap(a_pl)(srp)
                asi = jax.vmap(a_pl)(sip)
                bsr = jax.vmap(b_pl)(srp)
                bsi = jax.vmap(b_pl)(sip)
                er = zr * bsr - zi * bsi - asr
                ei = zr * bsi + zi * bsr - asi
                rr = by64.T[None] - er
                ri = -ei
                r = jnp.stack([rr, ri], axis=-1).reshape(ne, m0, 2 * n)
                return jnp.swapaxes(r, 1, 2)
            asr = jax.vmap(a_mm)(sr)
            asi = jax.vmap(a_mm)(si)
            bsr = jax.vmap(b_mm)(sr)
            bsi = jax.vmap(b_mm)(si)
            er = zr * bsr - zi * bsi - asr
            ei = zr * bsi + zi * bsr - asi
            rr = by64[None] - er
            ri = -ei
            r = jnp.stack([rr, ri], axis=2).reshape(ne, 2 * n, m0)
            return r

        @jax.jit
        def resid_acc(s64, dx32, by64):
            """Accumulate a refinement correction, then fresh residual."""
            s64 = s64 + dx32.astype(jnp.float64)
            return s64, resid(s64, by64)

        @jax.jit
        def combine_gram(s64):
            """q = 2 Re sum_k sigma_k S_k (transpose solves are conjugates
            for a real pencil — eliminated), plus the f64 whitening Gram."""
            s64 = s64.astype(jnp.float64)
            sr = s64[:, 0::2, :]
            si = s64[:, 1::2, :]
            q = 2.0 * (
                (sig_re[:, None, None] * sr).sum(0)
                - (sig_im[:, None, None] * si).sum(0)
            )
            g = dot64(q.T, q)
            return q, g

        # whitening and the RR blocks run as TWO programs: one fused
        # program held q + qw + A qw + every dot64 operand split alive at
        # once — OOM at 1M x 80 f64.  Splitting lets q's donated buffer
        # retire before the reduced blocks allocate.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def whiten(q, wmat):
            """qw = q W.  ``q`` is DONATED (dead after whitening — 671 MB
            at 1M x 80 f64)."""
            return dot64(q, wmat)

        @jax.jit
        def rr_blocks(qw):
            """Reduced RR blocks from the whitened subspace (stacked: the
            host pulls both in ONE tunnel round trip).

            Plane-major: for symmetric A, qw^T (A qw) == (A qw)^T qw, so the
            reduced blocks contract the plane-major product directly — one
            relayout of qw, zero relayouts of the products."""
            if use_planes:
                qwp = qw.T
                aq = dot64(a_pl(qwp), qw)
                bq = dot64(qwp, qw) if self.b_is_ident else dot64(
                    b_pl(qwp), qw
                )
                return jnp.stack([aq, bq])
            aq = dot64(qw.T, a_mm(qw))
            bq = dot64(qw.T, qw) if self.b_is_ident else dot64(
                qw.T, b_mm(qw)
            )
            return jnp.stack([aq, bq])

        def whiten_rr(q, wmat):
            """Two-dispatch composition (kept as the single call site)."""
            qw = whiten(q, wmat)
            return qw, rr_blocks(qw)

        # the Ritz phase runs as THREE programs (rotation / norms /
        # restart-subspace): one fused program's transient arena (rotation
        # splits + A x + the random fill all live at once) exceeds the
        # runtime's per-program temp budget at 1M x 80 f64 — the chip
        # holds the DATA fine (probed >20 GB), it is the per-program
        # scratch that is capped.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def ritz_x(qw, coeff):
            """x = qw C.  ``qw`` is DONATED (dead after the rotation)."""
            return dot64(qw, coeff)

        # residual norms scan COLUMN BLOCKS of the Ritz set: the full-block
        # A x holds the operator product + operand pads for all m0 columns
        # at once (~3 GB arena at 1M x 80 f64) — loop-0 fits but the same
        # program OOMs on later loops once the heap fragments; per-16-column
        # steps keep the arena ~0.6 GB whatever the loop count
        _bc = 16
        _nb = -(-m0 // _bc)

        @jax.jit
        def ritz_norms(x, lam_pad):
            xp2 = (jnp.pad(x, ((0, 0), (0, _nb * _bc - m0)))
                   if _nb * _bc != m0 else x)
            lp2 = (jnp.pad(lam_pad, (0, _nb * _bc - m0))
                   if _nb * _bc != m0 else lam_pad)

            def step(carry, i):
                xb = jax.lax.dynamic_slice_in_dim(xp2, i * _bc, _bc, 1)
                lb = jax.lax.dynamic_slice_in_dim(lp2, i * _bc, _bc, 0)
                if use_planes:
                    xbp = xb.T
                    axp = a_pl(xbp)
                    bxp = xbp if self.b_is_ident else b_pl(xbp)
                    rn = jnp.linalg.norm(axp - bxp * lb[:, None], axis=1)
                else:
                    axb = a_mm(xb)
                    bxb = xb if self.b_is_ident else b_mm(xb)
                    rn = jnp.linalg.norm(axb - bxb * lb[None, :], axis=0)
                xn = jnp.linalg.norm(xb, axis=0)
                return carry, jnp.stack([rn, xn])

            _, res = jax.lax.scan(step, 0, jnp.arange(_nb))
            norms = jnp.moveaxis(res, 1, 0).reshape(2, _nb * _bc)[:, :m0]
            xnorm = jnp.maximum(norms[1], jnp.finfo(jnp.float64).tiny)
            return jnp.stack([norms[0], xnorm])

        @jax.jit
        def ritz_y(x, keep, key):
            fill = jax.random.normal(key, x.shape, dtype=x.dtype)
            return jnp.where(keep[None, :] > 0, x, fill)

        def ritz(qw, coeff, lam_pad, keep, key, sync=False):
            """Three-dispatch composition (kept as the single call site).
            ``sync`` drains the queue between dispatches (streaming mode —
            bounds concurrent arenas at 1M-dof scale; scalar readback, see
            stream_filter)."""
            x = ritz_x(qw, coeff)
            if sync:
                float(x[0, 0])
            norms = ritz_norms(x, lam_pad)
            if sync:
                float(norms[0, 0])
            return x, norms, ritz_y(x, keep, key)

        progs = {
            "pre": pre, "resid": resid, "resid_acc": resid_acc,
            "combine_gram": combine_gram, "whiten_rr": whiten_rr,
            "ritz": ritz,
        }
        self._programs[key] = progs
        return progs

    # -- streaming contour (large n) --------------------------------------

    def stream_budget_exceeded(self, ne: int, m0: int,
                               budget_bytes: int = 9 * 2 ** 30) -> bool:
        """True when holding all ne factor sets plus the (ne, 2n, m0)
        solve stacks would blow the HBM budget — the contour then runs in
        STREAMING mode: one node's factorization resident at a time, the
        quadrature accumulated immediately.  (At 1M dof the embedded
        batched design needs ~25 GB of factors + ~11 GB of stacks against
        a 16 GB chip.)  ``SLT_FEAST_STREAM_BUDGET`` overrides the budget
        (bytes) — tests pin it low to exercise the streaming path."""
        import os

        budget_bytes = int(os.environ.get("SLT_FEAST_STREAM_BUDGET",
                                          budget_bytes))
        n2 = 2 * self.n
        stacks = ne * n2 * m0 * (4 + 8)  # f32 rhs + f64 solution stacks
        return ne * self.artifact_f32_bytes + stacks > budget_bytes

    def stream_data_for(self, z_nodes):
        """Host-embedded f32 value sets (ne, nnz_e), cached per contour."""
        zkey = hash(np.asarray(z_nodes).tobytes())
        d = self._stream_data.get(zkey)
        if d is None:
            from sparse_linear_tpu.solve import complex_embed as ce

            data_c = (
                np.asarray(z_nodes)[:, None] * self.union_b_data[None, :]
                - self.union_a_data[None, :]
            )
            d = ce.embed_data(data_c, self.eperm_np).astype(np.float32)
            self._stream_data = {zkey: d}  # one contour at a time
        return d

    def stream_programs(self, m0: int):
        """Per-node jitted programs for the streaming contour."""
        key = ("stream", m0)
        if key in self._programs:
            return self._programs[key]
        a_mm, b_mm = self.a_mm, self.b_mm
        n = self.n

        # every block argument that is dead after its program is DONATED,
        # and the refinement residual leaves the program as f32: the 1M-dof
        # streaming loop OOMed on the runtime's per-program temp budget
        # with the f64 residual + both s64 copies + the factor resident
        @functools.partial(jax.jit, donate_argnums=(0,))
        def pre1(y):
            by = b_mm(y).astype(jnp.float64)
            by_e = jnp.stack(
                [by, jnp.zeros_like(by)], axis=1
            ).reshape(2 * n, m0)
            return by, by_e.astype(jnp.float32)

        @jax.jit
        def resid1(s64, by64, zr, zi):
            """Residual of ONE node's embedded solve, computed in f64 in
            the original complex space through the structured SpMMs;
            emitted as the f32 the refinement solve consumes."""
            sr = s64[0::2, :]
            si = s64[1::2, :]
            asr, asi = a_mm(sr), a_mm(si)
            bsr, bsi = b_mm(sr), b_mm(si)
            er = zr * bsr - zi * bsi - asr
            ei = zr * bsi + zi * bsr - asi
            rr = by64 - er
            ri = -ei
            r = jnp.stack([rr, ri], axis=1).reshape(2 * n, m0)
            return r.astype(jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def acc1(s64, dx):
            """s64 += dx, in place (donated) — the refinement update."""
            return s64 + dx.astype(jnp.float64)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def qacc(q, s64, sigr, sigi):
            """q += 2 Re(sigma_k S_k) — the per-node quadrature update
            (``q`` donated: accumulates in place)."""
            s64 = s64.astype(jnp.float64)
            sr = s64[0::2, :]
            si = s64[1::2, :]
            return q + 2.0 * (sigr * sr - sigi * si)

        @jax.jit
        def gram(q):
            return dot64(q.T, q)

        progs = {"pre1": pre1, "resid1": resid1, "acc1": acc1,
                 "qacc": qacc, "gram": gram}
        self._programs[key] = progs
        return progs

    def stream_filter(self, y, z_nodes, sigma, m0, refine_n):
        """One contour-filter application in streaming mode: returns
        (q, g) with only one node's factors resident at any time."""
        from sparse_linear_tpu.formats.matrix import CSR as _CSR
        from sparse_linear_tpu.solve import api as solve_api

        sp = self.stream_programs(m0)
        data_e = self.stream_data_for(z_nodes)
        pm = self.pattern_r
        by64, rhs32 = sp["pre1"](y)
        q = jnp.zeros((self.n, m0), jnp.float64)
        zr = np.real(np.asarray(z_nodes))
        zi = np.imag(np.asarray(z_nodes))
        sr = np.real(np.asarray(sigma))
        si = np.imag(np.asarray(sigma))
        for k in range(len(z_nodes)):
            mat_k = _CSR(indptr=pm.indptr, indices=pm.indices,
                         data=jnp.asarray(data_e[k]), shape=pm.shape)
            fac = solve_api.factor(mat_k, self.symbolic)
            s64 = solve_api.solve(fac, rhs32).astype(jnp.float64)
            for _ in range(refine_n):
                r = sp["resid1"](s64, by64, zr[k], zi[k])  # f32 out
                dx = solve_api.solve(fac, r)
                r = None
                s64 = sp["acc1"](s64, dx)  # in place (donated)
                dx = None
            q = sp["qacc"](q, s64, sr[k], si[k])
            del fac, s64  # free this node's HBM before the next factor
            # DRAIN the dispatch queue before the next node's factor: the
            # runtime frees a node's buffers only once its work retires,
            # and dispatch-ahead otherwise overlaps two 3.1 GB factor sets
            # (scalar readback — block_until_ready does not serialize on
            # this runtime)
            float(q[0, 0])
        return q, sp["gram"](q)

    def factors_for(self, z_nodes):
        """Batched shifted factorizations (one program; ijob=10 for every
        node at once).  Cached per contour: the A/B values are part of the
        pipeline cache key, so identical z_nodes ⇒ identical factors."""
        zkey = hash(np.asarray(z_nodes).tobytes())
        fac = self._factors.get(zkey)
        if fac is not None:
            return fac
        from sparse_linear_tpu.solve import api as solve_api
        from sparse_linear_tpu.solve import complex_embed as ce

        data_c = (
            np.asarray(z_nodes)[:, None] * self.union_b_data[None, :]
            - self.union_a_data[None, :]
        )
        data_stack = jnp.asarray(
            ce.embed_data(data_c, self.eperm_np).astype(np.float32)
        )
        fac = solve_api.factor_batched(
            self.pattern_r, data_stack, self.symbolic
        )
        if len(self._factors) >= _FACTOR_CACHE_MAX:
            self._factors.pop(next(iter(self._factors)))
        self._factors[zkey] = fac
        return fac


def _get_pipeline(mat_a, mat_b, backend, dims):
    key = (_fingerprint(mat_a), _fingerprint(mat_b), backend, dims)
    pipe = _PIPELINE_CACHE.get(key)
    if pipe is None:
        pipe = _RealPencilPipeline(mat_a, mat_b, backend, dims)
        if len(_PIPELINE_CACHE) >= _PIPELINE_CACHE_MAX:
            _PIPELINE_CACHE.pop(next(iter(_PIPELINE_CACHE)))
        _PIPELINE_CACHE[key] = pipe
    return pipe


def geigsh_real_tpu(m0, interval, mat_a, mat_b, params, guess=None):
    """Driver loop over the cached pipeline.  Returns an EigResult.

    Mirrors the RCI event sequence (Feast.hs:220-232) with the loop owned
    natively; see the module docstring for the TPU-specific restructuring.
    """
    from sparse_linear_tpu.eig.feast import (
        EigResult, INFO_NO_EIGENVALUES, INFO_NOT_CONVERGED, INFO_OK,
        INFO_SUBSPACE_TOO_SMALL, _contour, _reduced_geig,
    )
    from sparse_linear_tpu.solve import api as solve_api

    import time as _time

    _t0 = _time.perf_counter()

    def _tick(label):
        nonlocal _t0
        if params.debug:
            t = _time.perf_counter()
            hbm = ""
            try:
                st = jax.devices()[0].memory_stats()
                hbm = (f"  [hbm {st.get('bytes_in_use', 0) / 2**30:.2f} GB"
                       f" peak {st.get('peak_bytes_in_use', 0) / 2**30:.2f}]")
            except Exception:
                pass
            print(f"feast(tpu)   {label}: {t - _t0:.4f}s{hbm}", flush=True)
            _t0 = t

    emin, emax = float(interval[0]), float(interval[1])
    n = mat_a.shape[0]
    pipe = _get_pipeline(mat_a, mat_b, params.backend, params.dims)
    _tick("pipeline")

    z_nodes, sigma = _contour(emin, emax, params.contour_points,
                              kind=getattr(params, 'quadrature', 'gauss'))
    ne = len(z_nodes)
    # batched contour (all ne factor sets resident — fastest) vs streaming
    # (one node at a time — the only way 1M-dof pencils fit 16 GB HBM)
    streaming = pipe.stream_budget_exceeded(ne, m0)
    if streaming:
        factors = None
        if params.debug:
            print("feast(tpu) streaming contour: "
                  f"{ne} x {pipe.artifact_f32_bytes / 2**30:.1f} GB factor "
                  "sets exceed the HBM budget")
    else:
        factors = pipe.factors_for(z_nodes)
    _tick("factors")
    progs = pipe.programs(ne, m0, z_nodes, sigma)
    _tick("programs")

    # staged refinement: loop 0 is filter-limited (~1e-6), so plain f32
    # solves suffice; later loops refine to the f64 floor
    refine_default = 2
    refine_n = (params.refine_solves if params.refine_solves is not None
                else refine_default)

    if guess is not None:
        y0 = np.asarray(guess, dtype=np.float64)
        if y0.shape != (n, m0):
            raise ValueError(f"geigsh: guess must have shape {(n, m0)}")
        y = jnp.asarray(y0)
    else:
        y = jax.random.normal(
            jax.random.key(params.seed), (n, m0), dtype=jnp.float64
        )

    lam_scale = max(abs(emin), abs(emax), 1.0)
    info = INFO_NOT_CONVERGED
    epsout = np.inf
    eps_prev = np.inf
    lam_np = np.zeros((0,))
    res_np = np.zeros((0,))
    x_dev = None
    inside_mask = np.zeros((m0,), dtype=bool)
    loops_done = 0
    stalls = 0
    prev_genuine_count = -1
    prev_genuine_eps = None
    tiny = np.finfo(np.float64).tiny

    for loop in range(params.max_loops):
        loops_done = loop + 1
        _t0 = _time.perf_counter()
        # free last loop's Ritz block during the filter: it is rebuilt by
        # ritz() before any exit path reads it, and at 1M x 80 f64 the
        # 671 MB it pins is the difference between fitting and OOM
        x_dev = None
        # ---- contour filter (ijob=10/11): batched solves + refinement
        n_ref = 0 if loop == 0 else refine_n
        if streaming:
            q, g = pipe.stream_filter(y, z_nodes, sigma, m0, n_ref)
        else:
            by64, rhs32 = progs["pre"](y)
            s64 = solve_api.solve_batched(factors, rhs32).astype(jnp.float64)
            r = None
            for _ in range(n_ref):
                if r is None:
                    r = progs["resid"](s64, by64)
                dx = solve_api.solve_batched(factors, r.astype(jnp.float32))
                s64, r = progs["resid_acc"](s64, dx, by64)
            q, g = progs["combine_gram"](s64)
        y = None  # consumed by the filter; ritz() rebuilds the subspace
        _tick(f"loop{loop} filter+gram")

        # ---- whitening: m0 x m0 two-pass spectral inverse square root on
        # host (subspace is rank-deficient by design — the filter kills
        # the outside directions; QR/Cholesky break down; extra passes run
        # entirely host-side on the one pulled Gram).
        # The small eighs MUST stay on host LAPACK: fusing them on-device
        # (jnp.linalg.eigh, emulated f64) was measured to stall FEAST
        # convergence at ~1e-8 — the TPU eigh's accuracy floor — turning a
        # 2-loop/1.6 s solve into a 4-loop/2.5 s one that misses tol=1e-10.
        from sparse_linear_tpu.eig.feast import _whiten_mat

        wmat = _whiten_mat(np.asarray(g))
        _tick(f"loop{loop} whiten(host)")

        qw, ab = progs["whiten_rr"](q, jnp.asarray(wmat))
        q = None  # donated into whiten_rr
        _tick(f"loop{loop} whiten_rr")

        # ---- reduced m0 x m0 Rayleigh-Ritz on host (Feast.hs:153-154)
        ab_np = np.asarray(ab)
        lam, coeff = _reduced_geig(ab_np[0], ab_np[1])
        _tick(f"loop{loop} reduced_rr(host)")
        m_kept = int(coeff.shape[1])
        coeff_pad = np.zeros((m0, m0), dtype=np.float64)
        coeff_pad[:, :m_kept] = np.real(coeff)
        lam_pad = np.zeros((m0,), dtype=np.float64)
        lam_pad[:m_kept] = np.real(lam)
        keep = np.zeros((m0,), dtype=np.float64)
        keep[:m_kept] = 1.0

        x_dev, norms_d, y = progs["ritz"](
            qw, jnp.asarray(coeff_pad), jnp.asarray(lam_pad),
            jnp.asarray(keep), jax.random.key(params.seed + loop + 1),
            sync=streaming,
        )
        qw = None  # donated into ritz
        norms = np.asarray(norms_d)
        res_all = norms[0] / np.maximum(norms[1], tiny) / lam_scale
        _tick(f"loop{loop} ritz")
        lam_k = lam_pad[:m_kept]
        res_k = res_all[:m_kept]

        inside_k = (lam_k >= emin) & (lam_k <= emax)
        m_inside = int(inside_k.sum())
        eps_inside = float(res_k[inside_k].max()) if m_inside else (
            float(res_k.max()) if m_kept else np.inf
        )

        # SPURIOUS-PAIR rejection (FEAST's residual-based validation — the
        # library's own in/out classification keeps `mode` pairs by
        # residual, Feast.hs:237-240): the rank-deficient filtered
        # subspace produces ghost Ritz values inside the interval whose
        # residuals never converge (they re-seed from the random fill each
        # loop).  At 1M dof the 50 true pairs sit at ~1e-14 while 3 ghosts
        # freeze epsout at 5e-4 — 10 orders apart.  A pair counts as
        # spurious only under a SEPARATION test (>= 1e6 x the 25th
        # percentile of inside residuals AND above 10x tol) so the normal
        # mid-convergence spread (observed ~40x) can never be mislabeled,
        # and ghost-filtered convergence is accepted only when TWO
        # consecutive loops agree on the same genuine set at tol.
        genuine_k = inside_k.copy()
        n_spur = 0
        if m_inside >= 4:
            res_in = res_k[inside_k]
            thr = max(float(np.quantile(res_in, 0.25)) * 1e6,
                      params.tol * 10.0)
            genuine_k &= res_k <= thr
            n_spur = m_inside - int(genuine_k.sum())
        m_found = int(genuine_k.sum())
        epsout = float(res_k[genuine_k].max()) if m_found else eps_inside
        if params.debug:
            print(f"feast(tpu) loop {loop}: m={m_found}, "
                  f"epsout={epsout:.3e}"
                  + (f" (+{n_spur} spurious rejected)" if n_spur else ""))

        lam_np, res_np = lam_k[genuine_k], res_k[genuine_k]
        inside_mask = np.zeros((m0,), dtype=bool)
        inside_mask[:m_kept] = genuine_k

        if m_found and eps_inside <= params.tol:
            info = INFO_OK  # every inside pair converged — no ghosts
            break
        if (m_found and n_spur and epsout <= params.tol
                and m_found == prev_genuine_count
                and prev_genuine_eps is not None
                and prev_genuine_eps <= params.tol):
            info = INFO_OK  # stable ghost-filtered convergence (2 loops)
            break
        prev_genuine_count = m_found
        prev_genuine_eps = epsout if n_spur else None
        if m_found == 0 and loop >= 2:
            info = INFO_NO_EIGENVALUES
            break
        if loop >= 2 and epsout > 0.5 * eps_prev:
            stalls += 1
            if stalls >= 2:
                break
        else:
            stalls = 0
        eps_prev = min(eps_prev, epsout)

    if len(lam_np) == m0:
        info = INFO_SUBSPACE_TOO_SMALL

    # vectors/subspace stay DEVICE-RESIDENT (jax arrays): pulling the
    # (n, m0) f64 block through the host tunnel costs seconds at FEAST
    # scale; consumers np.asarray() lazily if they want host copies.
    order = np.argsort(lam_np)
    if x_dev is not None and inside_mask.any():
        sel = jnp.asarray(np.nonzero(inside_mask)[0][order])
        vectors = x_dev[:, sel]
    else:
        vectors = jnp.zeros((n, 0))
    _tick("result")
    return EigResult(
        values=lam_np[order],
        vectors=vectors,
        n_found=len(lam_np),
        iterations=loops_done,
        epsout=epsout,
        residuals=res_np[order],
        info=info,
        subspace=y,
    )
