"""Model layer: VIBO (generative + inference networks) and baselines.

Pure-functional design: parameters are plain pytrees (nested dicts of
jnp arrays) created by explicit `init_*` functions and consumed by pure
`apply`-style functions — no module framework, so pjit sharding annotations
and optax updates apply directly to the pytree leaves.

Parity contract: SURVEY.md section 3.3 rows "VIBO encoders", "IRT decoders",
"Objectives", plus the baseline rows; arXiv:2002.00276 sections 3-5.
"""

from vibo_tpu.models.vibo import VIBOConfig, VIBO  # noqa: F401
