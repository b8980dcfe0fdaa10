"""Supernodal multifrontal sparse LU — the TPU-native direct solver core.

From-scratch replacement for the capability the reference binds from UMFPACK
(reference: suitesparse/src/Numeric/LinearAlgebra/Umfpack/Internal.hs:69-148,
Umfpack.hs:38-102): staged symbolic analysis / numeric factorization /
triangular solves with reusable artifacts.

TPU-first design (SURVEY.md §7 layer 4):

* The host symbolic phase (native C++ engine, utils/native.py) produces an
  elimination forest of supernodes.  Supernodes at the same tree level are
  independent, so the device schedule groups them into **buckets** of
  identical padded shape (pivot class Ns x update class Us) and executes each
  bucket as ONE batched dense operation: assembly by scatter-add, partial
  factorization by batched LU, Schur complements by batched GEMM on the MXU.
  No per-column scalar loops — the irregular sparse elimination becomes a
  short sequence of large dense batched kernels.
* Pivoting is *restricted* to the supernode pivot block (batched partial
  pivoting inside F11).  For SPD / diagonally dominant systems this is exact;
  for tougher systems pair with iterative refinement (solve(..., refine=k)).
* Artifacts are pytrees of device arrays: they persist, transfer, and are
  reused across many numeric factorizations of the same pattern — the
  analyze-once / factor-many staging FEAST depends on
  (reference Feast.hs:210-218).

Front layout (per supernode, padded to its bucket's classes):

        Ns (pivot class)   Us (update class)
      +------------------+------------------+
   Ns |  F11 (pivots)    |  F12 (U block)   |    rows 0..ns-1   : pivot rows
      +------------------+------------------+    rows ns..Ns-1  : identity pad
   Us |  F21 (L block)   |  F22 (Schur)     |    rows Ns..Ns+us : update rows
      +------------------+------------------+

Padding is inert by construction: padded pivot rows/cols are identity,
padded update rows/cols are zero, and all index maps send padding to
out-of-range sentinels dropped by scatter ``mode="drop"``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.formats.matrix import CSR
from sparse_linear_tpu.ops.build import trim

__all__ = ["analyze", "factor", "factor_batched", "solve", "solve_batched",
           "solve_part", "slogdet", "rcond", "get_factors", "lunz",
           "MFSymbolic", "MFFactors"]


def _class_of(x: int, lo: int = 8) -> int:
    c = lo
    while c < x:
        c *= 2
    return c


class MFSymbolic:
    """Symbolic artifact: ordering + supernode forest + device schedule.

    Host object (not a pytree): reused across numeric factorizations with
    the same pattern.  ``backend`` attribute makes it duck-compatible with
    solve.api dispatch."""

    backend = "multifrontal"

    def __init__(self, n, perm, schedule, pattern_key, a_entry_maps):
        self.n = n
        self.perm = perm              # elimination order (np.int32)
        self.iperm = np.empty_like(perm)
        self.iperm[perm] = np.arange(n, dtype=perm.dtype)
        self.schedule = schedule      # list of levels; each level: list of buckets
        self.pattern_key = pattern_key  # (nnz, hash) for cheap validation
        self.a_entry_maps = a_entry_maps  # per-bucket A-entry scatter arrays


class MFFactors:
    """Numeric artifact: per-bucket dense factor blocks (device arrays)."""

    backend = "multifrontal"

    def __init__(self, symbolic: MFSymbolic, blocks, dtype, kind="lu"):
        self.symbolic = symbolic
        self.blocks = blocks  # dict[(lvl, b)] -> dict(lu, perm, g21, g12)
        self.n = symbolic.n
        self.dtype = dtype
        self.kind = kind  # "lu" (restricted partial pivoting) | "cholesky"

    @property
    def n_flagged(self) -> int:
        """Factorization diagnostics (SURVEY.md §5 failure detection):
        LU — number of statically perturbed pivots (0 = exact partial
        pivoting inside every pivot block); Cholesky — number of
        non-finite factor diagonals (>0 = the matrix was NOT positive
        definite; re-factor with kind='lu' or check the operator).
        Host sync on first access."""
        d = self.blocks.get(-1)
        if d is None:
            return 0
        return int(np.sum(np.asarray(d["n_flag"])))

    @property
    def breakdown(self) -> bool:
        """True when the Cholesky path hit a non-SPD pivot (factors contain
        non-finite blocks and solves will return NaNs)."""
        return self.kind == "cholesky" and self.n_flagged > 0

    @property
    def row_scale(self):
        """Equilibration vector (UMFPACK's R array from get_numeric,
        umfpack.h) when factored with ``scale=``, else None.  Original row
        coordinates; the factorization is of diag(R) A (LU) or
        diag(R) A diag(R) (Cholesky)."""
        sc = self.blocks.get(-2)
        return None if sc is None else np.asarray(sc["rscale"])


def _mff_flatten(f):
    keys = sorted(f.blocks.keys())
    # `batch` must ride the static aux data: factors cross jit boundaries
    # as arguments, and an unflattened artifact that silently dropped its
    # batch count would fail solve_batched's shape validation inside jit
    return [f.blocks[k] for k in keys], (f.symbolic, f.dtype, f.kind,
                                         tuple(keys),
                                         getattr(f, "batch", None))


def _mff_unflatten(aux, children):
    sym, dtype, kind, keys, batch = aux
    out = MFFactors(sym, dict(zip(keys, children)), dtype, kind)
    if batch is not None:
        out.batch = batch
    return out


# Pytree registration lets a factor artifact cross jit boundaries as an
# ARGUMENT (closure capture would bake its dense blocks into the compile
# payload).  The symbolic schedule rides the static aux data by object
# identity — reusing one analyze() artifact keeps a single trace.
jax.tree_util.register_pytree_node(MFFactors, _mff_flatten, _mff_unflatten)


# ---------------------------------------------------------------------------
# symbolic / schedule construction (host)
# ---------------------------------------------------------------------------


def _symmetrized_pattern(mat: CSR, perm):
    """Permuted pattern of A + A^T + I as (indptr, indices), canonical CSR."""
    n = mat.shape[0]
    indptr = np.asarray(mat.indptr)
    indices = np.asarray(mat.indices)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    cols = indices.astype(np.int64)
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n)
    pr = np.concatenate([iperm[rows], iperm[cols], np.arange(n)])
    pc = np.concatenate([iperm[cols], iperm[rows], np.arange(n)])
    key = pr * n + pc
    key = np.unique(key)
    pr, pc = key // n, key % n
    out_indptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(out_indptr, pr + 1, 1)
    out_indptr = np.cumsum(out_indptr).astype(np.int32)
    return out_indptr, pc.astype(np.int32)


def _below_index(nsuper, n, sup_start, rows_ptr, rows, nc_arr):
    """Global search structure over all below-pivot frontal rows: a single
    sorted key array (supernode-major, row-minor) enabling ONE vectorized
    searchsorted for every locate query."""
    mask = np.ones(rows.shape[0], dtype=bool)
    # zero out the pivot prefix of each segment
    seg_ids = np.repeat(np.arange(nsuper), np.diff(rows_ptr))
    pos_in_seg = np.arange(rows.shape[0]) - rows_ptr[seg_ids]
    mask = pos_in_seg >= nc_arr[seg_ids]
    below_rows = rows[mask]
    below_seg = seg_ids[mask]
    below_ptr = np.zeros(nsuper + 1, dtype=np.int64)
    np.add.at(below_ptr, below_seg + 1, 1)
    below_ptr = np.cumsum(below_ptr)
    gkey = below_seg * np.int64(n + 1) + below_rows
    return below_ptr, below_rows, below_seg, gkey


def _locate_vec(sup_ids, rowvals, sup_start, nc_arr, below_ptr, gkey, n):
    """Vectorized local front coordinates: pivot rows by offset, below rows
    by one global searchsorted over the supernode-major key array."""
    c0 = sup_start[sup_ids]
    c1 = sup_start[sup_ids + 1]
    is_piv = rowvals < c1
    q = sup_ids * np.int64(n + 1) + rowvals
    below_pos = np.searchsorted(gkey, q) - below_ptr[sup_ids]
    return np.where(is_piv, rowvals - c0, nc_arr[sup_ids] + below_pos)


def analyze(mat: CSR, ordering: str = "auto", dims=None,
            relax_small: int = 16, relax_frac: float = 0.25,
            perm=None) -> MFSymbolic:
    """Symbolic analysis: ordering, supernode forest, batched device schedule.

    ``dims``: grid dimensions when the matrix is a structured-grid operator —
    enables geometric nested dissection.  Otherwise AMD (native C++) is
    used, with an RCM fallback when the native library is unavailable.
    ``perm``: explicit elimination order (overrides ``ordering``) — used by
    checkpoint restore to re-derive the schedule deterministically.
    """
    from sparse_linear_tpu.solve import ordering as ord_mod
    from sparse_linear_tpu.solve.symbolic_py import python_symbolic
    from sparse_linear_tpu.utils.native import native_symbolic

    mat = trim(mat.tocsr())
    n = mat.shape[0]
    if mat.shape[0] != mat.shape[1]:
        raise ValueError("analyze: matrix must be square")

    if perm is None:
        if ordering == "auto":
            ordering = "nd" if dims is not None else "amd"
        if ordering in ("nd", "nested-dissection") and dims is not None:
            perm = ord_mod.nested_dissection_grid(dims)
        elif ordering in ("nd", "nested-dissection", "rcm", "amd"):
            sp_ip, sp_ix = _symmetrized_pattern(
                mat, np.arange(n, dtype=np.int32)
            )
            fn = {"rcm": ord_mod.rcm, "amd": ord_mod.amd}.get(
                ordering,
                lambda ip, ix, nn: ord_mod.nested_dissection(ip, ix, nn),
            )
            perm = fn(sp_ip, sp_ix, n)
        elif ordering == "natural":
            perm = ord_mod.natural(n)
        else:
            raise ValueError(f"unknown ordering: {ordering}")
    perm = np.asarray(perm, dtype=np.int32)
    if perm.shape != (n,):
        raise ValueError(f"analyze: perm must have shape ({n},)")

    ip, ix = _symmetrized_pattern(mat, perm)
    sym = native_symbolic(n, ip, ix, relax_small, relax_frac)
    if sym is None:
        sym = python_symbolic(n, ip, ix, relax_small, relax_frac)

    nsuper = sym["nsuper"]
    sup_start = sym["sup_start"].astype(np.int64)
    sup_parent = sym["sup_parent"]
    sup_level = sym["sup_level"]
    rows_ptr = sym["rows_ptr"].astype(np.int64)
    rows = sym["rows"].astype(np.int64)

    sup_of = np.repeat(np.arange(nsuper, dtype=np.int64), np.diff(sup_start))
    nc_arr = np.diff(sup_start)
    fs_arr = np.diff(rows_ptr)
    us_arr = fs_arr - nc_arr

    # ---- bucket assignment: (level, Ns class, Us class)
    ns_class = np.array([_class_of(int(c)) for c in nc_arr])
    us_class = np.array([_class_of(int(u)) if u > 0 else 8 for u in us_arr])
    height = sym["height"]

    buckets = {}  # (lvl, Ns, Us) -> list of sup ids
    for s in range(nsuper):
        key = (int(sup_level[s]), int(ns_class[s]), int(us_class[s]))
        buckets.setdefault(key, []).append(s)
    # canonical bucket ordering per level
    level_buckets = [[] for _ in range(height + 1)]
    bucket_of_sup = np.empty(nsuper, dtype=np.int64)  # flat bucket index
    slot_of_sup = np.empty(nsuper, dtype=np.int64)
    flat = []
    for (lvl, nsc, usc), ids in sorted(buckets.items()):
        bidx = len(flat)
        flat.append(
            {
                "level": lvl,
                "Ns": nsc,
                "Us": usc,
                "sup_ids": np.asarray(ids, dtype=np.int64),
            }
        )
        level_buckets[lvl].append(bidx)
        for slot, s in enumerate(ids):
            bucket_of_sup[s] = bidx
            slot_of_sup[s] = slot

    # ---- global locate structure (one searchsorted serves every query)
    below_ptr, below_rows, below_seg, gkey = _below_index(
        nsuper, n, sup_start, rows_ptr, rows, nc_arr
    )

    def locate_padded(s_ids, rowvals):
        loc = _locate_vec(s_ids, rowvals, sup_start, nc_arr, below_ptr,
                          gkey, n)
        nc_s = nc_arr[s_ids]
        return np.where(loc < nc_s, loc, loc - nc_s + ns_class[s_ids])

    # ---- A-entry scatter maps (permuted entries -> (bucket, slot, r, c))
    indptr = np.asarray(mat.indptr)
    indices = np.asarray(mat.indices)
    e_rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    e_cols = indices.astype(np.int64)
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n)
    pr, pc = iperm[e_rows], iperm[e_cols]
    owner = sup_of[np.minimum(pr, pc)]
    pad_r = locate_padded(owner, pr)
    pad_c = locate_padded(owner, pc)

    a_entry_maps = {}
    owner_bucket = bucket_of_sup[owner]
    for bidx, b in enumerate(flat):
        in_b = owner_bucket == bidx
        a_entry_maps[bidx] = {
            "src": np.nonzero(in_b)[0].astype(np.int32),
            "slot": slot_of_sup[owner[in_b]].astype(np.int32),
            "r": pad_r[in_b].astype(np.int32),
            "c": pad_c[in_b].astype(np.int32),
        }

    # ---- child extend-add maps: ONE global locate for all update rows,
    # then vectorized padded-map assembly per (parent bucket, child bucket)
    has_parent = (sup_parent >= 0) & (us_arr > 0)
    child_ids = np.nonzero(has_parent)[0]
    parent_of = sup_parent[child_ids].astype(np.int64)
    q_sup = np.repeat(parent_of, us_arr[child_ids])
    # below_rows is supernode-major, so the children's update rows (in
    # ascending child id order) are exactly the masked selection
    q_mask = has_parent[below_seg]
    q_rows = below_rows[q_mask]
    located = locate_padded(q_sup, q_rows) if q_rows.size else q_rows

    child_groups = {}
    # group (child, parent) pairs by bucket pair
    pair_key = bucket_of_sup[parent_of] * len(flat) + bucket_of_sup[child_ids]
    order_p = np.argsort(pair_key, kind="stable")
    # offsets of each child's located block within `located`
    loc_ofs = np.zeros(child_ids.shape[0] + 1, dtype=np.int64)
    np.cumsum(us_arr[child_ids], out=loc_ofs[1:])
    for key in np.unique(pair_key):
        sel = order_p[np.searchsorted(pair_key[order_p], key):
                      np.searchsorted(pair_key[order_p], key, side="right")]
        pb = int(key) // len(flat)
        cb = int(key) % len(flat)
        cs = child_ids[sel]
        uc = flat[cb]["Us"]
        m_idx = loc_ofs[sel][:, None] + np.arange(uc)[None, :]
        valid = np.arange(uc)[None, :] < us_arr[cs][:, None]
        maps = np.where(valid, located[np.minimum(m_idx, located.shape[0] - 1)], -1)
        child_groups.setdefault(pb, {})[cb] = {
            "cslot": slot_of_sup[cs].astype(np.int32),
            "pslot": slot_of_sup[sup_parent[cs]].astype(np.int32),
            "maps": maps.astype(np.int32),
        }

    # ---- per-bucket solve row maps (padded with sentinel n), vectorized
    for bidx, b in enumerate(flat):
        ids = b["sup_ids"]
        ns_c, us_c = b["Ns"], b["Us"]
        ar_ns = np.arange(ns_c)[None, :]
        ar_us = np.arange(us_c)[None, :]
        nc_b = nc_arr[ids][:, None]
        us_b = us_arr[ids][:, None]
        rows_piv = np.where(ar_ns < nc_b, sup_start[ids][:, None] + ar_ns, n)
        bidx_mat = below_ptr[ids][:, None] + ar_us
        rows_upd = np.where(
            ar_us < us_b,
            below_rows[np.minimum(bidx_mat, below_rows.shape[0] - 1)]
            if below_rows.size
            else n,
            n,
        )
        b["rows_piv"] = rows_piv.astype(np.int32)
        b["rows_upd"] = rows_upd.astype(np.int32)
        b["ns_real"] = nc_arr[ids].astype(np.int32)
        b["children"] = child_groups.get(bidx, {})

    schedule = {
        "flat": flat,
        "level_buckets": level_buckets,
        "height": height,
        "nsuper": nsuper,
    }
    pattern_key = (int(mat.nnz), int(np.asarray(mat.indices)[:: max(1, mat.nnz // 97)].sum()))
    out = MFSymbolic(n, perm, schedule, pattern_key, a_entry_maps)
    out.relax = (int(relax_small), float(relax_frac))
    # entry coordinates in canonical CSR order — lets factor()/
    # factor_batched() equilibrate value-sets without re-deriving them
    out.entry_rows = e_rows.astype(np.int32)
    out.entry_cols = e_cols.astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# numeric factorization (device)
# ---------------------------------------------------------------------------
#
# The whole level/bucket loop is TRACED ONCE into a single XLA program per
# symbolic artifact (and per RHS batch shape for solves): the irregular
# elimination becomes one compiled sequence of batched dense ops with no
# per-bucket dispatch or recompilation.  Compiled callables are cached on the
# MFSymbolic / MFFactors objects.


def _bucket_factor_cholesky(front, ns_class):
    """Batched Cholesky partial factorization of assembled SPD fronts.

    XLA's TPU Cholesky is 3-7x faster than the pivoted LU at every bucket
    shape (its panel loop is better blocked), and symmetry halves the
    triangular-solve work: g21 = g12^T.  The identity padding rows
    cholesky to identity, so padded fronts stay inert.

    Breakdown (non-SPD input) shows up as non-finite diagonal entries;
    their count is returned so ``factor`` can REPORT the failure
    (SolveInfo-style, SURVEY.md §5) instead of silently emitting NaNs."""
    f11 = front[:, :ns_class, :ns_class]
    f12 = front[:, :ns_class, ns_class:]
    f22 = front[:, ns_class:, ns_class:]
    low = jax.vmap(jax.lax.linalg.cholesky)(f11)
    diag = jnp.diagonal(low, axis1=1, axis2=2)
    n_bad = jnp.sum(~jnp.isfinite(diag))
    g12 = jax.lax.linalg.triangular_solve(
        low, f12, left_side=True, lower=True, unit_diagonal=False
    )
    g21 = jnp.conj(jnp.swapaxes(g12, 1, 2))
    schur = f22 - jnp.matmul(g21, g12, preferred_element_type=f22.dtype)
    nb = front.shape[0]
    permutation = jnp.tile(jnp.arange(ns_class)[None, :], (nb, 1))
    return low, permutation, g21, g12, schur, n_bad


def _bucket_factor(front, ns_class, pivot_eps: float = 0.0):
    """Batched partial factorization of assembled fronts.

    front: (nb, Ns+Us, Ns+Us).  Returns (lu, perm, g21, g12, schur, npert).

    ``pivot_eps`` > 0 enables **static pivot perturbation** (the
    SuperLU-dist/MUMPS "GESP" strategy — the TPU-native replacement for
    UMFPACK's dynamic threshold pivoting, whose data-dependent row swaps
    across fronts cannot be expressed in a static batched schedule):
    after the in-block partial-pivoted LU, any |U_ii| below
    pivot_eps * max|front| is bumped to that threshold (sign preserved).
    The factorization then stays bounded for indefinite/unsymmetric
    systems, and the O(pivot_eps) backward-error is removed by iterative
    refinement (solve.api.solve_refined) or the preconditioned-GMRES
    fallback (solve.api.solve_gmres).  ``npert`` counts perturbed pivots
    for SolveInfo reporting."""
    f11 = front[:, :ns_class, :ns_class]
    f12 = front[:, :ns_class, ns_class:]
    f21 = front[:, ns_class:, :ns_class]
    f22 = front[:, ns_class:, ns_class:]
    lu, _, permutation = jax.vmap(jax.lax.linalg.lu)(f11)
    npert = jnp.zeros((), jnp.int32)
    if pivot_eps:
        diag = jnp.diagonal(lu, axis1=1, axis2=2)
        scale = jnp.max(jnp.abs(front), axis=(1, 2), keepdims=False)
        thresh = (pivot_eps * jnp.maximum(scale, jnp.finfo(front.dtype).tiny)
                  )[:, None]
        small = jnp.abs(diag) < thresh
        sgn = jnp.where(diag >= 0, 1.0, -1.0).astype(diag.dtype)
        new_diag = jnp.where(small, sgn * thresh, diag)
        npert = jnp.sum(small).astype(jnp.int32)
        ii = jnp.arange(ns_class)
        lu = lu.at[:, ii, ii].set(new_diag)
    # L^{-1} P F12
    pf12 = jnp.take_along_axis(f12, permutation[:, :, None], axis=1)
    g12 = jax.vmap(
        lambda l, b: jax.scipy.linalg.solve_triangular(
            l, b, lower=True, unit_diagonal=True
        )
    )(lu, pf12)
    # F21 U^{-1}  (solve U^T y = F21^T)
    g21 = jax.vmap(
        lambda u, b: jax.scipy.linalg.solve_triangular(
            u, b, trans="T", lower=False
        )
    )(lu, jnp.swapaxes(f21, 1, 2))
    g21 = jnp.swapaxes(g21, 1, 2)
    schur = f22 - jnp.matmul(g21, g12, preferred_element_type=f22.dtype)
    return lu, permutation, g21, g12, schur, npert


def _device_maps(symbolic: MFSymbolic):
    """Schedule index maps as device arrays (built once, cached)."""
    if getattr(symbolic, "_dev_maps", None) is not None:
        return symbolic._dev_maps
    flat = symbolic.schedule["flat"]
    dm = {"a": {}, "children": {}, "rows_piv": {}, "rows_upd": {},
          "ns_real": {}, "perm": jnp.asarray(symbolic.perm),
          "iperm": jnp.asarray(symbolic.iperm)}
    for bidx, b in enumerate(flat):
        am = symbolic.a_entry_maps[bidx]
        dm["a"][bidx] = {k: jnp.asarray(v) for k, v in am.items()}
        ch = {}
        fs = b["Ns"] + b["Us"]
        for cb, g in b["children"].items():
            m = np.where(g["maps"] < 0, fs, g["maps"])
            ch[cb] = {
                "cslot": jnp.asarray(g["cslot"]),
                "pslot": jnp.asarray(g["pslot"]),
                "maps": jnp.asarray(m),
            }
        dm["children"][bidx] = ch
        dm["rows_piv"][bidx] = jnp.asarray(b["rows_piv"])
        dm["rows_upd"][bidx] = jnp.asarray(b["rows_upd"])
        dm["ns_real"][bidx] = jnp.asarray(b["ns_real"])
    symbolic._dev_maps = dm
    return dm


def _build_factor_fn(symbolic: MFSymbolic, kind: str = "lu", mesh=None,
                     batch_axis: str | None = None,
                     pivot_eps: float = 0.0):
    flat = symbolic.schedule["flat"]
    level_buckets = symbolic.schedule["level_buckets"]
    height = symbolic.schedule["height"]
    if kind == "cholesky":
        bucket_fn = _bucket_factor_cholesky
    else:
        bucket_fn = partial(_bucket_factor, pivot_eps=pivot_eps)

    if mesh is not None:
        # multi-chip multifrontal: fronts of a bucket are independent, so
        # the batch dimension shards over the mesh (each chip factors its
        # fronts); the cross-level extend-add gathers land on XLA-inserted
        # collectives over ICI.  Fronts too few to split stay replicated.
        from jax.sharding import NamedSharding, PartitionSpec

        axis = batch_axis or mesh.axis_names[0]
        ndev = int(np.prod([mesh.shape[a] for a in (axis,)]))

        def shard(x, nb):
            spec = (PartitionSpec(axis, *([None] * (x.ndim - 1)))
                    if nb % ndev == 0 else
                    PartitionSpec(*([None] * x.ndim)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec)
            )
    else:
        def shard(x, nb):
            return x

    def run(a_data, dm):
        # TPU MXU f32 matmuls default to low-precision passes; the Schur
        # complements and triangular algebra need full f32 (observed: 2e-2
        # vs 5e-6 residuals at 1M dof)
        with jax.default_matmul_precision("highest"):
            return _run(a_data, dm)

    def _run(a_data, dm):
        dtype = a_data.dtype
        blocks = {}
        updates = {}
        # diagnostics: perturbed-pivot count (LU/GESP) or non-finite count
        # (Cholesky breakdown) accumulated across buckets
        n_flag = jnp.zeros((), jnp.int32)
        for lvl in range(height + 1):
            for bidx in level_buckets[lvl]:
                b = flat[bidx]
                nb = b["sup_ids"].shape[0]
                ns_c, us_c = b["Ns"], b["Us"]
                fs = ns_c + us_c
                front = shard(jnp.zeros((nb, fs, fs), dtype=dtype), nb)

                am = dm["a"][bidx]
                if am["src"].shape[0]:
                    front = front.at[am["slot"], am["r"], am["c"]].add(
                        a_data[am["src"]], mode="drop"
                    )

                for cb, g in dm["children"][bidx].items():
                    u = updates[cb][g["cslot"]]
                    # TPU-native extend-add: element scatter-adds serialize
                    # on TPU (measured 30x slower), so place each child
                    # update with one-hot row/col maps on the MXU — exact,
                    # since 0/1 selection under matmul precision "highest"
                    # introduces no rounding — and merge into parent slots
                    # with a batch-dim segment sum of full slabs.  The
                    # sentinel index fs one_hots to an all-zero row, which
                    # drops padding exactly like scatter mode="drop" did.
                    p = jax.nn.one_hot(g["maps"], fs, dtype=u.dtype)
                    placed = jnp.matmul(
                        jnp.swapaxes(p, 1, 2),
                        jnp.matmul(u, p, preferred_element_type=u.dtype),
                        preferred_element_type=u.dtype,
                    )
                    front = front + jax.ops.segment_sum(
                        placed, g["pslot"], num_segments=nb
                    )

                diag_idx = jnp.arange(ns_c)
                pad_mask = diag_idx[None, :] >= dm["ns_real"][bidx][:, None]
                front = front.at[:, diag_idx, diag_idx].add(
                    pad_mask.astype(dtype)
                )

                lu, permutation, g21, g12, schur, nf = bucket_fn(
                    front, ns_c
                )
                n_flag = n_flag + nf.astype(jnp.int32)
                blocks[bidx] = {
                    "lu": lu, "perm": permutation, "g21": g21, "g12": g12,
                }
                updates[bidx] = shard(schur, nb)
        blocks[-1] = {"n_flag": n_flag}  # diagnostics pseudo-bucket
        return blocks

    return jax.jit(run)


def _equilibrate(a_data, symbolic: MFSymbolic, kind: str, scale: str):
    """Scale the value-set before factorization — UMFPACK's default
    strategy (UMFPACK_SCALE_SUM / UMFPACK_SCALE_MAX, umfpack.h: each row of
    PAQ is divided by its absolute sum or max).

    LU kind: row scaling M = R A (exactly UMFPACK's).  Cholesky kind:
    symmetric scaling M = S A S with S = 1/sqrt(row measure) — preserves
    positive-definiteness, which one-sided row scaling would destroy.
    Returns (scaled data, scale vector in ORIGINAL row coordinates); works
    batched over a leading axis (contour value-sets get per-set scales).
    Empty rows scale by 1 (UMFPACK's convention for zero row measures)."""
    n = symbolic.n
    rows = jnp.asarray(symbolic.entry_rows)
    cols = jnp.asarray(symbolic.entry_cols)
    mag = jnp.abs(a_data)
    if scale == "sum":
        meas = jnp.zeros(a_data.shape[:-1] + (n,), mag.dtype
                         ).at[..., rows].add(mag)
    elif scale == "max":
        meas = jnp.zeros(a_data.shape[:-1] + (n,), mag.dtype
                         ).at[..., rows].max(mag)
    else:
        raise ValueError(f"unknown scale mode: {scale!r} "
                         "(expected 'sum', 'max', or 'none')")
    r = jnp.where(meas > 0, 1.0 / jnp.maximum(meas, jnp.finfo(mag.dtype).tiny),
                  1.0)
    if kind == "cholesky":
        s = jnp.sqrt(r)
        return a_data * (s[..., rows] * s[..., cols]).astype(a_data.dtype), s
    return a_data * r[..., rows].astype(a_data.dtype), r


def factor(mat: CSR, symbolic: MFSymbolic, kind: str = "lu",
           mesh=None, batch_axis: str | None = None,
           pivot_eps: float | None = None,
           scale: str = "none") -> MFFactors:
    """Numeric factorization over the symbolic schedule (one compiled XLA
    program; compile cost amortized across factorizations of the pattern).

    ``kind``: "lu" (default — restricted partial pivoting, general
    matrices) or "cholesky" (SPD matrices: 3-7x faster fronts on TPU, the
    CHOLMOD-analog path; fails with NaNs if the matrix is not positive
    definite — pair with solve_refined, whose residual check catches it).

    ``scale``: "sum" or "max" enables equilibration before factorization —
    UMFPACK's default row scaling (umfpack.h UMFPACK_SCALE_SUM; symmetric
    sqrt scaling on the Cholesky path to preserve SPD).  Improves pivot
    quality on badly row-scaled systems, exactly where restricted in-front
    pivoting is weakest; solves transparently unscale.  Default "none"
    keeps the factors those of A itself.

    ``mesh``: shard each bucket's independent fronts over the mesh axis
    ``batch_axis`` (multi-chip multifrontal — XLA inserts the extend-add
    collectives over ICI)."""
    mat = trim(mat.tocsr())
    n = symbolic.n
    if mat.shape != (n, n):
        raise ValueError("factor: matrix shape does not match symbolic")
    key = (int(mat.nnz), int(np.asarray(mat.indices)[:: max(1, mat.nnz // 97)].sum()))
    if key != symbolic.pattern_key:
        raise ValueError(
            "factor: matrix pattern does not match the symbolic analysis "
            "(analyze once per pattern, factor per value set)"
        )
    dm = _device_maps(symbolic)
    a_data = jnp.asarray(mat.data)
    # XLA's TPU LuDecomposition lowers only F32/C64: an f64 pivoted-LU
    # front program dies in the REMOTE compiler with an opaque HTTP 500
    # (found by an end-to-end drive).  Fail fast with the supported recipe
    # instead — f32 factors + f64 iterative refinement reach 1e-10
    # (solve_refined; the same pairing as the WELL f64 kernels).
    if (kind != "cholesky" and a_data.dtype == jnp.float64
            and jax.default_backend() == "tpu"):
        raise TypeError(
            "factor: the TPU has no f64 LU front kernel (XLA "
            "LuDecomposition is F32/C64-only). Factor in f32 and recover "
            "f64 accuracy with solve_refined(mat_f64, ...), or use "
            "kind='cholesky' for SPD operators."
        )
    rscale = None
    if scale != "none":
        a_data, rscale = _equilibrate(a_data, symbolic, kind, scale)
    peps = float(pivot_eps) if pivot_eps else 0.0
    fkey = (_sym_cache_key(symbolic), "factor", str(a_data.dtype), kind,
            id(mesh) if mesh is not None else None, batch_axis, peps)
    if fkey not in _PROGRAM_CACHE:
        _PROGRAM_CACHE[fkey] = _build_factor_fn(symbolic, kind, mesh=mesh,
                                                batch_axis=batch_axis,
                                                pivot_eps=peps)
    blocks = _PROGRAM_CACHE[fkey](a_data, dm)
    if rscale is not None:
        blocks = dict(blocks)
        blocks[-2] = {"rscale": rscale}  # scaling pseudo-bucket
    return MFFactors(symbolic, blocks, a_data.dtype, kind=kind)


# ---------------------------------------------------------------------------
# triangular solves (device, level-batched, whole-solve jitted)
# ---------------------------------------------------------------------------


# Compiled factor/solve programs depend only on the SYMBOLIC schedule (and
# trans/k/dtype/kind) — never on factor values — so they are cached globally
# by schedule content.  Without this, FEAST's 8 per-contour-node factor
# objects each recompiled an identical ~30 s solve program (measured 261 s
# for one batched 8-node solve at 65k dof).  Bounded LRU: a long-lived
# process sweeping many patterns must not pin compiled executables (and
# their HBM-resident constants) forever.
_PROGRAM_CACHE_MAX = 32


class _LRUCache(dict):
    """Minimal insertion-order LRU over dict (hits re-insert the key)."""

    def __init__(self, maxsize: int):
        super().__init__()
        self.maxsize = maxsize

    def __getitem__(self, key):
        val = super().__getitem__(key)
        # refresh recency
        super().__delitem__(key)
        super().__setitem__(key, val)
        return val

    def __setitem__(self, key, val):
        if key in self:
            super().__delitem__(key)
        elif len(self) >= self.maxsize:
            super().__delitem__(next(iter(self)))
        super().__setitem__(key, val)


_PROGRAM_CACHE: dict = _LRUCache(_PROGRAM_CACHE_MAX)


def _sym_cache_key(sym: MFSymbolic):
    return (
        sym.n,
        sym.pattern_key,
        hash(np.asarray(sym.perm).tobytes()),
        getattr(sym, "relax", None),
    )


def _build_solve_fn(symbolic: MFSymbolic, trans: bool, kind: str = "lu",
                    phase: str = "both"):
    """``phase`` selects a half of the substitution pipeline:

    * ``"both"`` (default) — the full A / A^H solve: entry fill-order
      gather, forward + backward loops, exit inverse gather, scaling.
    * ``"forward"`` / ``"backward"`` — ONE loop only, operating directly in
      fill-slot coordinates (no entry/exit permutation, no equilibration
      scaling): the building blocks of UMFPACK's partial-solve systems
      (sys=UMFPACK_Pt_L .. UMFPACK_Uat, umfpack.h) exposed via
      ``solve_part``.  Input/output index conventions per phase are
      documented at ``solve_part``.
    """
    flat = symbolic.schedule["flat"]
    level_buckets = symbolic.schedule["level_buckets"]
    height = symbolic.schedule["height"]
    n = symbolic.n
    # Cholesky factors store L (non-unit lower) with U = L^H implicit and
    # identity local permutations; the four triangular solves below switch
    # their (lower, trans, unit_diagonal) flags accordingly.
    chol = kind == "cholesky"
    do_fwd = phase in ("both", "forward")
    do_bwd = phase in ("both", "backward")
    full = phase == "both"

    def run(blocks, b, dm):
        with jax.default_matmul_precision("highest"):
            return _run(blocks, b, dm)

    def _run(blocks, b, dm):
        k = b.shape[1]
        # equilibrated factors (factor(..., scale=)): the factorization is
        # of M = R A (LU row scaling) or M = S A S (Cholesky symmetric
        # scaling), so A x = b becomes M x = R b / M (S^-1 x) = S b, and
        # A^H x = b becomes M^H y = b with x = R y.  Scale vectors live in
        # ORIGINAL row coordinates — apply before the fill-order gather /
        # after the inverse gather.
        sc = blocks.get(-2)
        if full and sc is not None and (chol or not trans):
            b = b * sc["rscale"][:, None]
        # y carries an extra sentinel row (index n) absorbing padded gathers
        y = jnp.concatenate(
            [b[dm["perm"]] if full else b, jnp.zeros((1, k), b.dtype)],
            axis=0,
        )
        if not trans:
            # forward: z_s = L^{-1} P y_piv ; y_upd -= G21 z_s
            for lvl in range(height + 1) if do_fwd else ():
                for bidx in level_buckets[lvl]:
                    blk = blocks[bidx]
                    piv, upd = dm["rows_piv"][bidx], dm["rows_upd"][bidx]
                    z = y[piv]
                    if not chol:
                        z = jnp.take_along_axis(
                            z, blk["perm"][:, :, None], axis=1
                        )
                    z = jax.vmap(
                        lambda l, r: jax.scipy.linalg.solve_triangular(
                            l, r, lower=True, unit_diagonal=not chol
                        )
                    )(blk["lu"], z)
                    y = y.at[piv].set(z, mode="drop")
                    y = y.at[upd].add(
                        -jnp.matmul(blk["g21"], z,
                                    preferred_element_type=z.dtype),
                        mode="drop",
                    )
            # backward: x_piv = U^{-1} (z_piv - G12 x_upd)
            for lvl in range(height, -1, -1) if do_bwd else ():
                for bidx in level_buckets[lvl]:
                    blk = blocks[bidx]
                    piv, upd = dm["rows_piv"][bidx], dm["rows_upd"][bidx]
                    rhs = y[piv] - jnp.matmul(
                        blk["g12"], y[upd], preferred_element_type=y.dtype
                    )
                    x = jax.vmap(
                        lambda u, r: jax.scipy.linalg.solve_triangular(
                            u, r, trans="C", lower=True
                        ) if chol else jax.scipy.linalg.solve_triangular(
                            u, r, lower=False
                        )
                    )(blk["lu"], rhs)
                    y = y.at[piv].set(x, mode="drop")
        else:
            # A'^H = U^H L^H P:
            # forward (bottom-up): w = U^{-H} y_piv ; y_upd -= G12^H w
            for lvl in range(height + 1) if do_fwd else ():
                for bidx in level_buckets[lvl]:
                    blk = blocks[bidx]
                    piv, upd = dm["rows_piv"][bidx], dm["rows_upd"][bidx]
                    w = jax.vmap(
                        lambda u, r: jax.scipy.linalg.solve_triangular(
                            u, r, lower=True
                        ) if chol else jax.scipy.linalg.solve_triangular(
                            u, r, trans="C", lower=False
                        )
                    )(blk["lu"], y[piv])
                    y = y.at[piv].set(w, mode="drop")
                    y = y.at[upd].add(
                        -jnp.matmul(
                            jnp.conj(jnp.swapaxes(blk["g12"], 1, 2)), w,
                            preferred_element_type=w.dtype,
                        ),
                        mode="drop",
                    )
            # backward (top-down): v = L^{-H}(w - G21^H v_upd); x = P^T v
            for lvl in range(height, -1, -1) if do_bwd else ():
                for bidx in level_buckets[lvl]:
                    blk = blocks[bidx]
                    piv, upd = dm["rows_piv"][bidx], dm["rows_upd"][bidx]
                    rhs = y[piv] - jnp.matmul(
                        jnp.conj(jnp.swapaxes(blk["g21"], 1, 2)), y[upd],
                        preferred_element_type=y.dtype,
                    )
                    v = jax.vmap(
                        lambda l, r: jax.scipy.linalg.solve_triangular(
                            l, r, trans="C", lower=True,
                            unit_diagonal=not chol
                        )
                    )(blk["lu"], rhs)
                    if chol:
                        x = v
                    else:
                        x = jnp.zeros_like(v).at[
                            jnp.arange(v.shape[0])[:, None], blk["perm"]
                        ].set(v)
                    y = y.at[piv].set(x, mode="drop")

        x = y[:n][dm["iperm"]] if full else y[:n]
        if full and sc is not None and (chol or trans):
            x = x * sc["rscale"][:, None]
        return x

    return jax.jit(run)


def factor_batched(data_stack, symbolic: MFSymbolic,
                   kind: str = "lu", scale: str = "none") -> MFFactors:
    """Batched numeric factorization: ``data_stack`` of shape (ne, nnz) holds
    ne value-sets over the SAME pattern (e.g. FEAST's shifted matrices
    z_k B - A, reference Feast.hs:214-218 done one-at-a-time there).  The
    whole factorization program is vmapped over the leading axis — contour
    parallelism (P3) as one batched device computation; shard the leading
    axis over a mesh for multi-chip contour distribution.
    """
    data_stack = jnp.asarray(data_stack)
    if data_stack.ndim != 2:
        raise ValueError("factor_batched: expected (ne, nnz) data stack")
    dm = _device_maps(symbolic)
    rscale = None
    if scale != "none":
        data_stack, rscale = _equilibrate(data_stack, symbolic, kind, scale)
    fkey = (_sym_cache_key(symbolic), "factor_batched",
            str(data_stack.dtype), kind)
    if fkey not in _PROGRAM_CACHE:
        base = _build_factor_fn(symbolic, kind)
        _PROGRAM_CACHE[fkey] = jax.jit(
            jax.vmap(lambda d, m: base.__wrapped__(d, m), in_axes=(0, None))
        )
    blocks = _PROGRAM_CACHE[fkey](data_stack, dm)
    if rscale is not None:
        blocks = dict(blocks)
        blocks[-2] = {"rscale": rscale}  # (ne, n) per-set scaling
    out = MFFactors(symbolic, blocks, data_stack.dtype, kind=kind)
    out.batch = int(data_stack.shape[0])
    return out


def solve_batched(factors: MFFactors, b_stack, trans: bool = False):
    """Batched solves on batched factors: ``b_stack`` (ne, n, k) -> (ne, n, k)."""
    sym = factors.symbolic
    b_stack = jnp.asarray(b_stack)
    if b_stack.ndim != 3 or b_stack.shape[0] != getattr(factors, "batch", -1):
        raise ValueError(
            f"solve_batched: expected ({getattr(factors, 'batch', '?')}, n, k) rhs stack"
        )
    dm = _device_maps(sym)
    skey = (_sym_cache_key(sym), "solve_batched", bool(trans),
            int(b_stack.shape[2]), str(b_stack.dtype), factors.kind)
    if skey not in _PROGRAM_CACHE:
        base = _build_solve_fn(sym, trans, factors.kind)
        _PROGRAM_CACHE[skey] = jax.jit(
            jax.vmap(lambda blk, b, m: base.__wrapped__(blk, b, m),
                     in_axes=(0, 0, None))
        )
    return _PROGRAM_CACHE[skey](factors.blocks, b_stack, dm)


def _perm_sign(perm_rows, k: int) -> float:
    """Product of permutation parities over ``perm_rows`` (m, k) — each row
    is one front's local pivot permutation (identity rows skipped fast)."""
    p = np.asarray(perm_rows).reshape(-1, k)
    ar = np.arange(k)
    nontrivial = p[(p != ar[None, :]).any(axis=1)]
    sign = 1.0
    for row in nontrivial:
        visited = np.zeros(k, dtype=bool)
        for i in range(k):
            if visited[i] or row[i] == i:
                visited[i] = True
                continue
            j, clen = i, 0
            while not visited[j]:
                visited[j] = True
                j = row[j]
                clen += 1
            if clen % 2 == 0:
                sign = -sign
    return sign


def _real_buckets(factors: MFFactors):
    return [(bidx, factors.blocks[bidx])
            for bidx in sorted(k for k in factors.blocks if k >= 0)]


def slogdet(factors: MFFactors):
    """(sign, logabsdet) of the factored operator — the capability of
    UMFPACK's ``umfpack_*_get_determinant`` (umfpack.h; the reference binds
    only the solve entry points, Internal.hs:69-148 — this extends the API
    toward UMFPACK's full surface, like the mantissa+exponent form it uses
    to dodge overflow).

    The fill-reducing ordering is applied symmetrically (P A P^T), so it
    contributes no sign; every front's pivot-block U diagonal carries the
    global pivots, identity padding contributes exactly 1, and the local
    partial-pivot permutations contribute their parities.  Cholesky factors
    give det = prod(diag L)^2.  With ``pivot_eps`` static perturbation the
    result is the determinant of the PERTURBED factorization (backward
    error O(pivot_eps)).  Host-side query; batched factors (factor_batched)
    return (ne,) arrays."""
    ne = getattr(factors, "batch", None)
    chol = factors.kind == "cholesky"
    logabs = np.zeros(() if ne is None else (ne,))
    sign = np.ones(() if ne is None else (ne,),
                   dtype=(np.complex128
                          if np.issubdtype(np.dtype(factors.dtype),
                                           np.complexfloating)
                          else np.float64))
    for _, blk in _real_buckets(factors):
        d = np.diagonal(np.asarray(blk["lu"]), axis1=-2, axis2=-1)
        # padded pivot rows are exact identity -> diag 1, log 0, sign +1
        with np.errstate(invalid="ignore", divide="ignore"):
            logabs = logabs + np.sum(np.log(np.abs(d)), axis=(-2, -1))
            unit = np.where(d == 0, 1.0, d / np.abs(d))
        if chol:
            continue
        sign = sign * np.prod(unit, axis=(-2, -1))
        perm = np.asarray(blk["perm"])
        k = perm.shape[-1]
        if ne is None:
            sign = sign * _perm_sign(perm, k)
        else:
            sign = sign * np.array(
                [_perm_sign(perm[e], k) for e in range(ne)]
            )
    if chol:
        logabs = 2.0 * logabs
    sc = factors.blocks.get(-2)
    if sc is not None:
        # factors are of R A (LU) or S A S (Cholesky), R/S positive
        # diagonal: det A = det M / det(R or S^2)
        corr = np.sum(np.log(np.asarray(sc["rscale"])), axis=-1)
        logabs = logabs - (2.0 * corr if chol else corr)
    # numpy slogdet convention: singular -> sign 0 (complex included)
    sign = np.where(logabs == -np.inf, 0.0 * sign, sign)
    return sign, logabs


def rcond(factors: MFFactors):
    """Cheap reciprocal-condition estimate min|U_ii| / max|U_ii| — exactly
    UMFPACK's ``Info[UMFPACK_RCOND]`` (umfpack.h; reported after numeric
    factorization).  Identity padding is masked out via each bucket's
    ``ns_real``.  Cholesky factors square the ratio (A = L L^H).  Batched
    factors return (ne,) arrays."""
    dm = _device_maps(factors.symbolic)
    ne = getattr(factors, "batch", None)
    dmin = np.full(() if ne is None else (ne,), np.inf)
    dmax = np.zeros(() if ne is None else (ne,))
    for bidx, blk in _real_buckets(factors):
        d = np.abs(np.diagonal(np.asarray(blk["lu"]), axis1=-2, axis2=-1))
        ns_real = np.asarray(dm["ns_real"][bidx])  # (nb,)
        mask = np.arange(d.shape[-1])[None, :] < ns_real[:, None]
        masked_min = np.where(mask, d, np.inf)
        masked_max = np.where(mask, d, 0.0)
        dmin = np.minimum(dmin, masked_min.min(axis=(-2, -1)))
        dmax = np.maximum(dmax, masked_max.max(axis=(-2, -1)))
    r = np.where(dmax > 0, dmin / np.maximum(dmax, np.finfo(np.float64).tiny),
                 0.0)
    if factors.kind == "cholesky":
        r = r * r
    return r


def get_factors(factors: MFFactors, index: int | None = None):
    """Export the global sparse triangular factors — the capability of
    UMFPACK's ``umfpack_*_get_numeric`` (umfpack.h; the reference binds only
    the opaque solve entry points, Internal.hs:69-148).

    Returns ``(L, U, row_perm, col_perm)`` with L, U canonical CSR such that

        (L @ U).todense() == A.todense()[np.ix_(row_perm, col_perm)]

    up to factorization rounding.  For ``kind="lu"`` L is unit lower
    triangular (explicit unit diagonal stored) and U upper triangular with
    the pivots; for ``kind="cholesky"`` L is the (non-unit) Cholesky factor
    and U = L^H.  ``col_perm`` is the fill-reducing order; ``row_perm``
    composes it with the in-front partial-pivot permutations.

    Identity padding never leaks: padded pivot slots factor to exact
    identity, padded cross blocks are exact zeros, and — because a padded
    front is exactly block-diagonal [real | I] — partial pivoting cannot
    promote a padding row over a real column, so masking by each bucket's
    real sizes recovers the true factors.

    ``index`` selects one value-set of a ``factor_batched`` artifact.
    Equilibrated factorizations (``factor(..., scale=)``) export the
    factors of the SCALED operator — recover A's factors by composing with
    ``factors.row_scale`` (UMFPACK's convention: get_numeric returns R
    alongside L and U).  Host-side export (device pull + O(factor nnz)
    assembly): an introspection/interop API, not a solver path."""
    sym = factors.symbolic
    n = sym.n
    chol = factors.kind == "cholesky"
    ne = getattr(factors, "batch", None)
    if ne is not None and index is None:
        raise ValueError(
            "get_factors: batched factors — pass index=<contour set> "
            f"in [0, {ne})"
        )
    flat = sym.schedule["flat"]

    def pull(x):
        x = np.asarray(x)
        return x[index] if ne is not None else x

    # elimination index: fill position -> final pivot position.  Fill row
    # piv[t, lp[t, i]] is eliminated at position piv[t, i] (the solve
    # gathers y[piv] then applies the local perm, multifrontal solve above).
    eindex = np.arange(n + 1, dtype=np.int64)
    if not chol:
        for bidx, b in enumerate(flat):
            lp = pull(factors.blocks[bidx]["perm"]).astype(np.int64)
            piv = b["rows_piv"].astype(np.int64)
            real = np.arange(lp.shape[1])[None, :] < b["ns_real"][:, None]
            src = np.take_along_axis(piv, lp, axis=1)
            eindex[src[real]] = piv[real]

    rL, cL, vL = [], [], []
    rU, cU, vU = [], [], []
    for bidx, b in enumerate(flat):
        blk = factors.blocks[bidx]
        lu = pull(blk["lu"])
        g12 = pull(blk["g12"])
        g21 = pull(blk["g21"])
        piv = b["rows_piv"].astype(np.int64)   # (nb, Ns): fill == elim slots
        upd = b["rows_upd"].astype(np.int64)   # (nb, Us), sentinel n
        nsr = b["ns_real"].astype(np.int64)
        nb, Ns = piv.shape
        Us = upd.shape[1]
        ar = np.arange(Ns)
        rmask = ar[None, :] < nsr[:, None]     # (nb, Ns) real pivot slots
        umask = upd < n                        # (nb, Us) real update rows

        # L11: strict lower + explicit unit diag (LU) / lower incl diag (chol)
        li, lj = np.tril_indices(Ns, 0 if chol else -1)
        m = rmask[:, li] & rmask[:, lj]
        v = lu[:, li, lj]
        m &= v != 0
        rL.append(piv[:, li][m])
        cL.append(piv[:, lj][m])
        vL.append(v[m])
        if not chol:
            rL.append(piv[rmask])
            cL.append(piv[rmask])
            vL.append(np.ones(int(rmask.sum()), dtype=lu.dtype))

        # U11: upper incl diag (LU) / L11^H transposed (chol)
        ui, uj = np.triu_indices(Ns) if not chol else (lj, li)
        m = rmask[:, ui] & rmask[:, uj]
        v = lu[:, uj, ui] if chol else lu[:, ui, uj]
        if chol:
            v = np.conj(v)
        m &= v != 0
        rU.append(piv[:, ui][m])
        cU.append(piv[:, uj][m])
        vU.append(v[m])

        if Us and g21.size:
            # L21: rows are update rows -> final elimination positions
            ii, jj = np.indices((Us, Ns))
            m = umask[:, ii] & rmask[:, jj]
            v = g21[:, ii, jj]
            m &= v != 0
            rL.append(eindex[np.clip(upd, 0, n)][:, ii][m])
            cL.append(piv[:, jj][m])
            vL.append(v[m])
            # U12: columns are update rows (fill positions; columns are
            # never permuted)
            m = rmask[:, jj.T] & umask[:, ii.T]
            v = g12[:, jj.T, ii.T]
            m &= v != 0
            rU.append(piv[:, jj.T][m])
            cU.append(upd[:, ii.T][m])
            vU.append(v[m])

    from sparse_linear_tpu.formats.matrix import from_triples

    cat = lambda xs: (np.concatenate(xs) if xs
                      else np.zeros(0, dtype=np.int64))
    L = from_triples((n, n), cat(rL), cat(cL), cat(vL)).tocsr()
    U = from_triples((n, n), cat(rU), cat(cU), cat(vU)).tocsr()
    perm = np.asarray(sym.perm, dtype=np.int64)
    einv = np.empty(n, dtype=np.int64)
    einv[eindex[:n]] = np.arange(n)
    return L, U, perm[einv], perm.copy()


def lunz(factors: MFFactors, index: int | None = None):
    """(lnz, unz): stored entries of the exported L and U factors —
    UMFPACK's ``umfpack_*_get_lunz`` (umfpack.h)."""
    L, U, _, _ = get_factors(factors, index=index)
    return int(L.nnz), int(U.nnz)


def _elim_index(factors: MFFactors) -> np.ndarray:
    """Fill slot -> final elimination position (host, cached on the factor
    object): the composition of the in-front partial-pivot permutations,
    exactly as ``get_factors`` uses to place L21 rows.  Identity for
    Cholesky (no pivoting)."""
    cached = getattr(factors, "_eindex", None)
    if cached is not None:
        return cached
    sym = factors.symbolic
    n = sym.n
    eindex = np.arange(n, dtype=np.int64)
    if factors.kind != "cholesky":
        for bidx, b in enumerate(sym.schedule["flat"]):
            lp = np.asarray(factors.blocks[bidx]["perm"]).astype(np.int64)
            piv = b["rows_piv"].astype(np.int64)
            real = np.arange(lp.shape[1])[None, :] < b["ns_real"][:, None]
            src = np.take_along_axis(piv, lp, axis=1)
            eindex[src[real]] = piv[real]
    factors._eindex = eindex
    return eindex


_PART_SYS = ("Pt_L", "L", "Lt_P", "Lat_P", "Lt", "Lat",
             "U_Qt", "U", "Ut_Q", "Uat_Q", "Ut", "Uat")


def solve_part(factors: MFFactors, b, sys: str):
    """Partial solves with the stored factors — UMFPACK's remaining solve
    subsystems (``umfpack_*_solve`` sys codes UMFPACK_Pt_L .. UMFPACK_Uat,
    umfpack.h; the reference binds only sys=0/1, Internal.hs:141-142,
    Umfpack.hs:85-102).

    ``sys`` names the system solved in terms of ``get_factors``'s exported
    (L, U, row_perm, col_perm) with ``A[row_perm][:, col_perm] == L @ U``;
    P gathers rows by ``row_perm`` (P b = b[row_perm]) and Q gathers
    columns by ``col_perm``:

    ========  ====================  =========================
    sys       system                UMFPACK constant
    ========  ====================  =========================
    "Pt_L"    P^T L x = b           UMFPACK_Pt_L
    "L"       L x = b               UMFPACK_L
    "Lt_P"    L^H P x = b           UMFPACK_Lt_P
    "Lat_P"   L^T P x = b           UMFPACK_Lat_P
    "Lt"      L^H x = b             UMFPACK_Lt
    "Lat"     L^T x = b             UMFPACK_Lat
    "U_Qt"    U Q^T x = b           UMFPACK_U_Qt
    "U"       U x = b               UMFPACK_U
    "Ut_Q"    U^H Q x = b           UMFPACK_Ut_Q
    "Uat_Q"   U^T Q x = b           UMFPACK_Uat_Q
    "Ut"      U^H x = b             UMFPACK_Ut
    "Uat"     U^T x = b             UMFPACK_Uat
    ========  ====================  =========================

    Like UMFPACK, partial solves use the factors AS STORED: an equilibrated
    factorization (``factor(..., scale=)``) exports the scaled operator's
    factors, and no R scaling is applied here.  Runs the level-batched
    triangular pipeline (one phase of the full solve) on device.
    """
    if sys not in _PART_SYS:
        raise ValueError(
            f"solve_part: unknown sys {sys!r} (expected one of {_PART_SYS})")
    if getattr(factors, "batch", None) is not None:
        raise ValueError(
            "solve_part: batched factors are not supported — factor the "
            "value-set you need (or index it out) first")
    sym = factors.symbolic
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    if b.shape[0] != sym.n:
        raise ValueError(
            f"solve_part: rhs has {b.shape[0]} rows, expected {sym.n}")

    # conjugate-transpose systems reduce to the Hermitian ones; b was already
    # expanded to (n, k), so re-apply the 1-D squeeze on the way out
    if sys in ("Lat", "Lat_P", "Uat", "Uat_Q"):
        xc = solve_part(factors, jnp.conj(b),
                        {"Lat": "Lt", "Lat_P": "Lt_P", "Uat": "Ut",
                         "Uat_Q": "Ut_Q"}[sys])
        xc = jnp.conj(xc)
        return xc[:, 0] if squeeze else xc

    trans, phase = {
        "Pt_L": (False, "forward"), "L": (False, "forward"),
        "U": (False, "backward"), "U_Qt": (False, "backward"),
        "Ut": (True, "forward"), "Ut_Q": (True, "forward"),
        "Lt": (True, "backward"), "Lt_P": (True, "backward"),
    }[sys]
    dm = _device_maps(sym)
    skey = (_sym_cache_key(sym), "solve_part", trans, phase,
            int(b.shape[1]), str(b.dtype), factors.kind)
    if skey not in _PROGRAM_CACHE:
        _PROGRAM_CACHE[skey] = _build_solve_fn(sym, trans, factors.kind,
                                               phase=phase)
    run = _PROGRAM_CACHE[skey]

    eindex = _elim_index(factors)
    perm, iperm = np.asarray(sym.perm), np.asarray(sym.iperm)
    # fill-slot input/output conventions of the two phase pipelines (see
    # _build_solve_fn): forward takes c[s] = b_elim[eindex[s]] and returns
    # elim-direct; backward takes elim-direct and returns fill-column x;
    # trans-forward takes fill-column direct and returns elim-direct;
    # trans-backward takes elim-direct and returns y[s] = v_elim[eindex[s]].
    pre = {"Pt_L": perm, "L": eindex, "U": None, "U_Qt": None,
           "Ut": None, "Ut_Q": None, "Lt": None, "Lt_P": None}[sys]
    ein = np.empty_like(eindex)
    ein[eindex] = np.arange(sym.n)
    post = {"Pt_L": None, "L": None, "U": None, "U_Qt": iperm,
            "Ut": None, "Ut_Q": perm, "Lt": ein, "Lt_P": iperm}[sys]
    if pre is not None:
        b = b[pre]
    x = run(factors.blocks, b, dm)
    if post is not None:
        x = x[post]
    return x[:, 0] if squeeze else x


def solve(factors: MFFactors, b, trans: bool = False):
    """Solve A x = b (or A^H x = b with ``trans``) using the multifrontal
    factors (reference ``linearSolve_`` modes, Umfpack.hs:85-102).
    ``b``: (n,) or (n, k); the RHS batch is one device call (P2)."""
    sym = factors.symbolic
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    if b.shape[0] != sym.n:
        raise ValueError(f"solve: rhs has {b.shape[0]} rows, expected {sym.n}")
    dm = _device_maps(sym)
    skey = (_sym_cache_key(sym), "solve", bool(trans), int(b.shape[1]),
            str(b.dtype), factors.kind)
    if skey not in _PROGRAM_CACHE:
        _PROGRAM_CACHE[skey] = _build_solve_fn(sym, trans, factors.kind)
    x = _PROGRAM_CACHE[skey](factors.blocks, b, dm)
    return x[:, 0] if squeeze else x
