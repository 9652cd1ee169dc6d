"""Data layer: synthetic IRT simulators, hold-out masking, real-dataset loaders.

Host-side NumPy producing dense (N_persons x N_items) binary response matrices
with missingness masks, ready to be device-put/sharded over the student axis.

Parity contract: SURVEY.md section 3.3 rows "Synthetic IRT simulator",
"Real-dataset loaders", "Hold-out masking / splits"; arXiv:2002.00276
sections 6.1-6.3.
"""

from vibo_tpu.data.synthetic import simulate_irt  # noqa: F401
from vibo_tpu.data.masking import (holdout_split, Dataset,  # noqa: F401
                                   split_persons, split_items)
from vibo_tpu.data.loaders import load_dataset  # noqa: F401
