"""Device mesh construction and sharding rules for VIBO training.

Sharding design (SURVEY.md sections 3.2, 6):
- Response/mask minibatches: rows (students) sharded over the 'students' mesh
  axis, item axis replicated — P('students', None). Per-shard ELBO terms are
  combined by GSPMD-inserted psum over ICI.
- Item-posterior parameters (per-item Gaussians, shape (M, D)): sharded over
  the 'items' mesh axis — P('items', None) — so very wide item dimensions
  (DuoLingo ~2k lexemes and beyond) scale. GSPMD all-gathers the (small)
  sampled item vectors where the decode matmul needs them.
- Encoder / deep-link MLP weights: replicated (they are MLP-scale; DP is the
  right regime), updated identically on every shard from psum'd grads.

Everything goes through jit-with-shardings on the same pure functions used
single-chip, so multi-chip is a deployment flag, not a code path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STUDENTS, ITEMS = "students", "items"


def make_mesh(devices=None, item_axis: int = 1) -> Mesh:
    """Build a ('students', 'items') mesh over the given devices.

    item_axis devices are dedicated to item-axis sharding; the rest to the
    student (data-parallel) axis. Default: all devices data-parallel.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % item_axis != 0:
        raise ValueError(f"{n} devices not divisible by item_axis={item_axis}")
    arr = np.array(devices).reshape(n // item_axis, item_axis)
    return Mesh(arr, (STUDENTS, ITEMS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, M) response/mask minibatch: students sharded, items replicated."""
    return NamedSharding(mesh, P(STUDENTS, None))


def param_shardings(params, mesh: Mesh):
    """Sharding pytree for VIBO params: item posteriors over 'items',
    everything else replicated.

    Works on the param pytree structure from VIBO.init_params: the
    'item_post' subtree holds {name: {'mu','logvar': (M, D)}} leaves.
    """
    item_sh = NamedSharding(mesh, P(ITEMS, None))
    repl = replicated(mesh)

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "item_post" in keys and leaf.ndim == 2:
            return item_sh
        return repl

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_arrays(mesh: Mesh, *arrays, spec=None):
    """Device-put arrays with a batch sharding (default students-sharded)."""
    sh = batch_sharding(mesh) if spec is None else NamedSharding(mesh, spec)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out
