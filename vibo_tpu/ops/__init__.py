"""Core math ops: link functions, distributions, masked likelihoods, objectives.

Everything here is pure jax.numpy on arrays (no parameter containers), so the
same functions serve the VIBO model, the MLE/MAP/EM/HMC baselines, the Pallas
kernel's reference path, and the tests' closed-form oracles.

Parity contract: SURVEY.md section 3.4 (the mathematical spec of the reference),
arXiv:2002.00276 sections 3-4.
"""

from vibo_tpu.ops import links, distributions, likelihood, objectives  # noqa: F401
