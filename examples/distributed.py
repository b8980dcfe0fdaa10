"""Multi-chip walkthrough on a virtual CPU mesh (no TPU pod needed).

Demonstrates the three distribution layers (SURVEY.md §2.4 P1-P5): row-
sharded SpMV with halo exchange, contour-sharded FEAST, and front-sharded
multifrontal factorization.  On real hardware the same code runs over the
pod's ICI — only the Mesh construction changes.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparse_linear_tpu.dist.spmv import dia_spmv_sharded, shard_dia_rows
from sparse_linear_tpu.eig.feast import FeastParams, eigsh
from sparse_linear_tpu.solve import multifrontal as mf
from sparse_linear_tpu.utils.grids import laplacian_1d, poisson_2d


def main():
    devs = np.array(jax.devices("cpu")[:8])
    print(f"mesh over {len(devs)} devices")

    # P1: row-partitioned SpMV with ppermute halo exchange
    mesh = Mesh(devs, ("rows",))
    g = 32
    a = shard_dia_rows(poisson_2d(g, dtype=np.float32, fmt="dia"), mesh)
    x = jax.device_put(jnp.ones((g * g,), jnp.float32),
                       NamedSharding(mesh, P("rows")))
    y = jax.jit(lambda a, x: dia_spmv_sharded(a, x, mesh, exchange="halo"))(
        a, x)
    print("sharded SpMV:", y.shape, "sharding:", y.sharding.spec)

    # P3/P4: FEAST with the contour-node axis sharded over the mesh
    cp_mesh = Mesh(devs, ("cp",))
    a_eig = laplacian_1d(64, dtype=np.float64)
    res = eigsh(16, (0.05, 0.5), a_eig,
                FeastParams(tol=1e-10, contour_points=8,
                            complex_strategy="native"),
                mesh=cp_mesh)
    print(f"distributed FEAST: {res.n_found} pairs, eps {res.epsout:.1e}")

    # multi-chip multifrontal: each bucket's independent fronts shard over
    # the mesh; XLA inserts the extend-add collectives
    fr_mesh = Mesh(devs, ("fronts",))
    g2 = 16
    a_mf = poisson_2d(g2, dtype=np.float64)
    sym = mf.analyze(a_mf, dims=(g2, g2))
    fac = mf.factor(a_mf, sym, kind="cholesky", mesh=fr_mesh)
    b = jnp.ones((g2 * g2,), jnp.float64)
    x_mf = mf.solve(fac, b)
    print("sharded factor solve residual:",
          float(jnp.linalg.norm(a_mf @ x_mf - b) / jnp.linalg.norm(b)))


if __name__ == "__main__":
    main()
