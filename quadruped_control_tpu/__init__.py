"""quadruped_control_tpu: TPU-native quadruped locomotion control stack."""

import jax as _jax

# On TPU, f32 einsum/matmul default to bfloat16 multiply passes — fine for
# neural nets, catastrophic for QP assembly (Q = 2 A^T S A), KKT residuals,
# and LU factorizations: the certified-parity contract (1e-6 vs qpOASES)
# needs true float32 throughout. Pallas kernels are exact f32 regardless;
# this pins the XLA-side math to match.
_jax.config.update("jax_default_matmul_precision", "highest")
