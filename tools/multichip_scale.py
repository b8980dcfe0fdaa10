#!/usr/bin/env python
"""Config-5 scale rehearsal on a 16-device virtual mesh (VERDICT r4 item 6).

Runs the row-partitioned SpMV paths (DIA halo, ELL/BSR/WELL column-window
ring exchange) at n_devices=16 on the host-platform virtual mesh — the
environment's stand-in for a v5e-16 slice — and records shipped-bytes vs
the all-gather alternative plus result correctness, into
MULTICHIP_SCALE.json at the repo root.

Usage:  python tools/multichip_scale.py [n_devices] [nx]
"""

import json
import os
import sys

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NX = int(sys.argv[2]) if len(sys.argv) > 2 else 24

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# the environment may pre-register an accelerator platform via sitecustomize
# and pin jax.config.jax_platforms; the env var alone does not win (same
# workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    from jax.sharding import Mesh

    from sparse_linear_tpu.dist.spmv import (
        dia_spmv_sharded, shard_bsr_rows, shard_dia_rows, shard_ell_rows,
        shard_well_rows, spmv_sharded, window_exchange_elements,
    )
    from sparse_linear_tpu.utils.grids import poisson_3d

    devs = np.array(jax.devices("cpu")[:N_DEV])
    mesh = Mesh(devs, ("rows",))
    n = NX ** 3
    assert n % N_DEV == 0, (n, N_DEV)
    L = n // N_DEV

    a = poisson_3d(NX, dtype=np.float64)
    a_dia = poisson_3d(NX, dtype=np.float64, fmt="dia")
    x = np.random.default_rng(3).standard_normal(n)
    import scipy.sparse as sp

    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    )
    ref = As @ x

    out = {
        "n_devices": N_DEV,
        "operator": f"3d_poisson_{NX}^3",
        "n": n,
        "nnz": int(a.nnz),
        "rows_per_device": L,
        "allgather_elements_per_device": (N_DEV - 1) * L,
        "formats": {},
    }

    # DIA halo (structured): ships only the +-nx^2 halo bands over ppermute
    a_sh = shard_dia_rows(a_dia, mesh)
    y = dia_spmv_sharded(a_sh, jnp.asarray(x), mesh, exchange="halo")
    err = float(np.abs(np.asarray(y) - ref).max())
    halo = NX * NX  # one plane each way
    out["formats"]["dia_halo"] = {
        "shipped_elements_per_device": 2 * halo,
        "vs_allgather": round(2 * halo / ((N_DEV - 1) * L), 4),
        "max_abs_err": err,
        "ok": bool(err < 1e-10),
    }

    for name, sh in (
        ("ell", shard_ell_rows(a, mesh)),
        ("bsr", shard_bsr_rows(a, mesh, block_shape=(8, 16))),
        ("well", shard_well_rows(a, mesh)),
    ):
        assert sh.xplan is not None, name
        shipped = int(window_exchange_elements(sh.xplan))
        y = spmv_sharded(sh, jnp.asarray(x), mesh)
        err = float(np.abs(np.asarray(y) - ref).max())
        out["formats"][name + "_window"] = {
            "shipped_elements_per_device": shipped,
            "vs_allgather": round(shipped / ((N_DEV - 1) * L), 4),
            "max_abs_err": err,
            "ok": bool(err < 1e-10),
        }

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MULTICHIP_SCALE.json",
    )
    json.dump(out, open(path, "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
