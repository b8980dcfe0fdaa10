"""Kernel walkthrough: f64 on a 32-bit-gather machine + VMEM-resident chains.

Two TPU-native answers to the reference's Double-native story
(SPECIALIZE Double, sparse-linear/src/Data/Matrix/Sparse.hs:456-457):

1. double-float WELL SpMV (`kernels/spmv_well64`): one packing, paired-f32
   hi/lo value planes, exact TwoProd/TwoSum compensation in-kernel —
   unstructured f64 SpMV at the 32-bit gather's streaming rate, ~1e-13
   relative accuracy.
2. `dia_spmv_chain`: (alpha A)^k x as ONE kernel launch with the operator
   VMEM-resident across iterations — the iterative-method inner loop with
   the memory system taken out.

Runs on CPU (interpret mode) or TPU.

    python examples/kernels_f64.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.kernels.spmv_well64 import csr_to_well64, well_spmv64
from sparse_linear_tpu.utils.grids import poisson_2d


def main():
    g = 48
    n = g * g
    a64 = poisson_2d(g, dtype=np.float64)

    # --- double-float WELL: f64 values, 32-bit kernels ------------------
    w = csr_to_well64(a64)  # hi/lo f32 planes, one packing
    x = np.random.default_rng(0).standard_normal(n)
    y = np.asarray(well_spmv64(w, jnp.asarray(x)))

    import scipy.sparse as sp

    As = sp.csr_matrix(
        (np.asarray(a64.data), np.asarray(a64.indices),
         np.asarray(a64.indptr)), shape=a64.shape)
    rel = np.linalg.norm(y - As @ x) / np.linalg.norm(As @ x)
    print(f"df64 WELL SpMV: rel error {rel:.2e} (f64-class; naive f32 "
          "would be ~1e-7)")
    assert rel < 1e-12

    # --- VMEM-resident iteration chain ----------------------------------
    from jax.experimental.pallas import tpu as pltpu

    from sparse_linear_tpu.kernels.spmv_pallas import (
        dia_spmv_chain, dia_spmv_pallas,
    )

    gd = 32  # 1024 dof: square + 1024-aligned (chain kernel requirement)
    ad = poisson_2d(gd, dtype=np.float32, fmt="dia")
    v = jnp.asarray(np.random.default_rng(1).standard_normal(gd * gd),
                    jnp.float32)
    on_tpu = jax.default_backend() == "tpu"

    def run():
        yk = dia_spmv_chain(ad, v, k=5, alpha=0.2)
        ref = v
        for _ in range(5):
            ref = dia_spmv_pallas(ad, ref, alpha=0.2)
        return np.asarray(yk), np.asarray(ref).reshape(-1)

    if on_tpu:
        yk, ref = run()
    else:
        with pltpu.force_tpu_interpret_mode():
            yk, ref = run()
    print("chain (alpha A)^5 x matches 5 chained SpMVs:",
          bool(np.allclose(yk, ref, rtol=1e-5, atol=1e-6)))


if __name__ == "__main__":
    main()
