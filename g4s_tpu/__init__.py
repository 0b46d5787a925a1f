"""G4S-TPU: a TPU-native graph-engine framework for scientific computing.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CGCL-codes/G4S
(reference layout: mv/ dense-BLAS2 benches, mm/ SpGEMM library, and three
scientific workloads — CitcomS regional convection, Cantera reacting-gas
ignition, DeePMD se_e2_a potentials — all routed through one graph engine).

Top-level layout:
  g4s_tpu.sparse    — COO/CSR/CSC/ELL containers, Matrix-Market IO, converts
  g4s_tpu.ops       — Pallas/XLA kernels: SpMV, SpGEMM, dense BLAS2, segment ops
  g4s_tpu.engine    — GraphBLAS-style mxv/mxm/reduce dispatch + GAS gather/apply
  g4s_tpu.parallel  — device mesh, halo exchange, collective wrappers
  g4s_tpu.models    — citcoms / cantera / deepmd workload pipelines
  g4s_tpu.runtime   — native C++ helpers (fast IO), timings
  g4s_tpu.obs       — stage timers, metrics, profiling hooks
"""

__version__ = "0.2.0"

import jax as _jax

# TPU matmul units round f32 inputs to bf16 (~3 significant digits) at the
# default precision; for a scientific-computing framework whose correctness
# tier is 1e-6 (f32) that silent rounding corrupts physics (CG dot products,
# B^T D B element stiffness, nu @ log(c) exponentiated in kinetics). Make
# full-precision the framework default; bf16 fast paths are per-call opt-in
# (e.g. engine.dense_matmul(precision=...)).
_jax.config.update("jax_default_matmul_precision", "highest")

from g4s_tpu.sparse import COO, CSR, CSC, ELL  # noqa: F401
