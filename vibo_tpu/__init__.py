"""vibo_tpu — TPU-native amortized variational inference for Item Response Theory.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
repo ``mhw32/variational-item-response-theory-public`` (VIBO, arXiv:2002.00276):

- IRT generative models: 1PL / 2PL / 3PL logistic links + deep nonlinear link.
- VIBO: structured amortized posterior q(theta, d | r) = q(d|r) * q(theta|d, r),
  trained by reparameterized ELBO maximization; IWAE multi-sample eval bound.
- Baselines: MLE/MAP (SGD point estimation), EM (Gauss-Hermite marginal
  maximum likelihood), HMC posterior sampling.
- Data: synthetic 1PL/2PL/3PL simulators with ground truth; loaders for real
  response matrices (PISA 2015 Science, DuoLingo, WordBank, CritLangAcq,
  Gradescope); hold-out masking for missing-response imputation eval.

Design is TPU-first, not a port (see SURVEY.md):
- pure-functional params + optax, jit'd train steps, explicit PRNG threading;
- vmap over MC/IWAE samples;
- pjit/NamedSharding over a ('students', 'items') device mesh;
- a fused Pallas kernel for the masked-Bernoulli ELBO reduction that streams
  item blocks through VMEM without materializing the B x M logit matrix in HBM.

Reference provenance: the reference mount was empty at build time, so parity
citations point at SURVEY.md sections + arXiv:2002.00276 instead of file:line
(see SURVEY.md section 0).
"""

__version__ = "0.1.0"

from vibo_tpu.ops import links, distributions, likelihood, objectives  # noqa: F401
from vibo_tpu.models import vibo  # noqa: F401

# Serving (vibo_tpu.serve.AbilityScorer) is imported lazily by consumers —
# it pulls in the trainer/checkpoint stack.
