"""Checkpoint / resume for solver and eigensolver artifacts.

The reference has two restart/reuse mechanisms but no persistence
(SURVEY.md §5): (1) symbolic analyses and factor objects are first-class
reusable values (Umfpack.hs:56-58); (2) FEAST warm-starts from a prior
eigenvector subspace (Feast.hs:119,157-168).  This module adds the missing
durability:

* Factors persist as flat npz archives of their dense blocks.
* A multifrontal Symbolic persists as its *recipe* (elimination order +
  relaxation parameters): on restore, ``analyze(mat, perm=...)`` re-derives
  the identical schedule deterministically — far smaller than serializing
  the schedule, and robust across library versions.
* FEAST subspaces persist as plain arrays (the warm-start unit).
* WELL packings persist as their chunk planes (the SpMV analyze artifact —
  repacking 21M nonzeros costs seconds; loading is one mmap).

All files are numpy ``.npz`` — no pickle, loadable anywhere.
"""

from __future__ import annotations

import numpy as np

from sparse_linear_tpu.solve import api as solve_api
from sparse_linear_tpu.solve import multifrontal as mf

__all__ = [
    "save_factors",
    "load_factors",
    "save_subspace",
    "load_subspace",
    "save_well",
    "load_well",
]


def save_factors(path, factors):
    """Persist a Factors artifact (dense or multifrontal) to ``path``."""
    if factors.backend == "dense":
        lu, piv = factors.payload
        payload = {
            "backend": "dense",
            "n": factors.n,
            "lu": np.asarray(lu),
            "piv": np.asarray(piv),
        }
        if getattr(factors, "batch", None) is not None:
            payload["batch"] = np.asarray(factors.batch, dtype=np.int64)
        np.savez_compressed(path, **payload)
        return
    if factors.backend == "multifrontal":
        sym = factors.symbolic
        payload = {
            "backend": "multifrontal",
            "n": sym.n,
            "perm": sym.perm,
            "relax_small": sym.relax[0],
            "relax_frac": sym.relax[1],
            "pattern_key": np.asarray(sym.pattern_key, dtype=np.int64),
            "bucket_ids": np.asarray(sorted(factors.blocks.keys())),
            "kind": factors.kind,
        }
        if getattr(factors, "batch", None) is not None:
            payload["batch"] = np.asarray(factors.batch, dtype=np.int64)
        for bidx, blk in factors.blocks.items():
            for name, arr in blk.items():
                payload[f"b{bidx}__{name}"] = np.asarray(arr)
        np.savez_compressed(path, **payload)
        return
    raise TypeError(f"unsupported factors backend: {factors.backend}")


def load_factors(path, mat=None):
    """Restore a Factors artifact.  Multifrontal restore requires ``mat``
    (same pattern as at save time) to re-derive the symbolic schedule."""
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        backend = str(z["backend"])
        if backend == "dense":
            out = solve_api.Factors(
                payload=(jnp.asarray(z["lu"]), jnp.asarray(z["piv"])),
                n=int(z["n"]),
                backend="dense",
            )
            if "batch" in z:
                object.__setattr__(out, "batch", int(z["batch"]))
            return out
        if backend == "multifrontal":
            if mat is None:
                raise ValueError(
                    "multifrontal restore needs the matrix (same pattern) to "
                    "re-derive the symbolic schedule"
                )
            sym = mf.analyze(
                mat,
                perm=z["perm"],
                relax_small=int(z["relax_small"]),
                relax_frac=float(z["relax_frac"]),
            )
            if tuple(int(v) for v in z["pattern_key"]) != sym.pattern_key:
                raise ValueError(
                    "saved factors do not match this matrix pattern"
                )
            blocks = {}
            dtype = None
            for bidx in z["bucket_ids"].tolist():
                if int(bidx) == -1:  # diagnostics pseudo-bucket (n_flag)
                    blocks[-1] = {"n_flag": jnp.asarray(z["b-1__n_flag"])}
                    continue
                if int(bidx) == -2:  # equilibration pseudo-bucket
                    blocks[-2] = {"rscale": jnp.asarray(z["b-2__rscale"])}
                    continue
                blk = {}
                for name in ("lu", "perm", "g21", "g12"):
                    blk[name] = jnp.asarray(z[f"b{bidx}__{name}"])
                blocks[int(bidx)] = blk
                dtype = blk["lu"].dtype
            kind = str(z["kind"]) if "kind" in z else "lu"
            out = mf.MFFactors(sym, blocks, dtype, kind=kind)
            if "batch" in z:
                out.batch = int(z["batch"])
            return out
        raise ValueError(f"unknown backend in checkpoint: {backend}")


def save_subspace(path, result):
    """Persist a FEAST warm-start subspace (EigResult or raw (n, m0) array)."""
    subspace = getattr(result, "subspace", result)
    np.savez_compressed(path, subspace=np.asarray(subspace))


def load_subspace(path):
    with np.load(path, allow_pickle=False) as z:
        return z["subspace"]


def save_well(path, well):
    """Persist a WELL packing (formats/well.py) — the SpMV analyze artifact."""
    payload = dict(
        kind="well",
        shape=np.asarray(well.shape, dtype=np.int64),
        c_max=well.c_max,
        fill=well.fill,
        bases=np.asarray(well.bases),
        idx=np.asarray(well.idx),
        vals=np.asarray(well.vals),
    )
    if well.vals_im is not None:
        payload["vals_im"] = np.asarray(well.vals_im)
    if getattr(well, "base_lo", None) is not None:
        payload["base_lo"] = np.asarray(well.base_lo)
        payload["base_hi"] = np.asarray(well.base_hi)
    np.savez_compressed(path, **payload)


def load_well(path):
    import jax.numpy as jnp

    from sparse_linear_tpu.formats.well import WELL

    from sparse_linear_tpu.formats.well import _base_ranges

    with np.load(path, allow_pickle=False) as z:
        if str(z["kind"]) != "well":
            raise ValueError("not a WELL checkpoint")
        vals_im = z["vals_im"] if "vals_im" in z.files else None
        if "base_lo" in z.files:
            blo, bhi = z["base_lo"], z["base_hi"]
        else:  # checkpoint predates the windowed-SpMM activity ranges
            blo, bhi = _base_ranges(z["bases"], z["vals"], vals_im)
        return WELL(
            bases=jnp.asarray(z["bases"]),
            idx=jnp.asarray(z["idx"]),
            vals=jnp.asarray(z["vals"]),
            vals_im=None if vals_im is None else jnp.asarray(vals_im),
            shape=tuple(int(v) for v in z["shape"]),
            c_max=int(z["c_max"]),
            fill=float(z["fill"]),
            base_lo=jnp.asarray(blo),
            base_hi=jnp.asarray(bhi),
        )
