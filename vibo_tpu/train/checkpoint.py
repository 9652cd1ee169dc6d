"""Checkpoint / exact resume: params + optimizer state + PRNG key + step.

Reference used torch.save of the best state_dict (SURVEY.md section 6).
Here: a single .npz of the flattened (params, opt_state) pytree leaves plus
the PRNG key and step counter — dependency-free, byte-exact resume (tested in
tests/test_checkpoint.py). Loading restores into a template pytree from
init (structure must match; a structure fingerprint is stored and verified).
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def _structure_fingerprint(tree) -> str:
    treedef = jax.tree_util.tree_structure(tree)
    leaves = jax.tree_util.tree_leaves(tree)
    desc = str(treedef) + "|" + ",".join(f"{l.shape}{l.dtype}" for l in leaves)
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def save_checkpoint(path: str, state, key: jax.Array, step: int,
                    extra: dict | None = None):
    """state: any pytree (e.g. (params, opt_state)). key: jax PRNG key."""
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(state)]
    arrays = {f"leaf_{i}": l for i, l in enumerate(leaves)}
    arrays["_key"] = np.asarray(jax.random.key_data(key))
    arrays["_step"] = np.asarray(step)
    arrays["_fingerprint"] = np.frombuffer(
        _structure_fingerprint(state).encode(), dtype=np.uint8)
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_checkpoint(path: str, state_template):
    """Returns (state, key, step, extra). state_template supplies structure
    (e.g. freshly-initialized (params, opt_state))."""
    with np.load(path) as data:
        fp_saved = bytes(data["_fingerprint"]).decode()
        fp_now = _structure_fingerprint(state_template)
        if fp_saved != fp_now:
            raise ValueError(
                f"checkpoint structure mismatch: saved {fp_saved}, template {fp_now} "
                "(did the model/optimizer config change?)")
        n = len(jax.tree_util.tree_leaves(state_template))
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        treedef = jax.tree_util.tree_structure(state_template)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
        key = jax.random.wrap_key_data(data["_key"])
        step = int(data["_step"])
        extra = {k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")}
    return state, key, step, extra


def load_params_self_describing(path: str):
    """Params from a self-describing Trainer checkpoint — the embedded
    model/optimizer configs (extra_model_cfg / extra_opt_cfg) supply the
    template, so no caller-side model construction is needed (the same
    mechanism serve.AbilityScorer.from_checkpoint uses)."""
    import json

    extra = peek_extra(path)
    if "model_cfg" not in extra:
        raise ValueError(f"{path} has no embedded model config; it cannot "
                         "be loaded without a template")
    from vibo_tpu.models.vibo import VIBO, VIBOConfig
    model = VIBO(VIBOConfig(**json.loads(str(extra["model_cfg"]))))
    params = model.init_params(jax.random.key(0))
    from vibo_tpu.train.trainer import make_optimizer
    if "opt_cfg" in extra:
        oc = json.loads(str(extra["opt_cfg"]))
        optimizer = make_optimizer(oc["lr"], oc["max_grad_norm"])
    else:
        optimizer = make_optimizer(5e-3, 10.0)
    template = (params, optimizer.init(params))
    (params, _), _, _, _ = load_checkpoint(path, template)
    return params


_TRANSPLANT_MUST_MATCH = ("num_items", "irt_model", "num_categories",
                          "ability_dim", "hidden_dim", "item_latent_dim",
                          "deep_hidden_dim", "item_encoder",
                          "item_encoder_hidden")


def check_transplant_compat(src_cfg: dict, dst_cfg) -> None:
    """Raise unless warm-starting `dst_cfg` from a checkpoint with embedded
    config `src_cfg` is one of the documented transplants.

    Round-4 advisor: transplant_params corner-embeds ANY shape-compatible
    leaf, so e.g. K=1 -> K=4 would embed the (H, 2) encoder-head output into
    (H, 8) and land the source LOGVAR column inside the target's mu block —
    a silently scrambled init. Allowed transitions: exact same family;
    mean-field -> conditional; diag -> chol q(theta); condition_on
    'sample' <-> 'mean' (identical encoder input layout). Everything else
    raises before any parameter is touched."""
    import dataclasses as _dc
    dst = {f.name: getattr(dst_cfg, f.name) for f in _dc.fields(type(dst_cfg))}
    for name in _TRANSPLANT_MUST_MATCH:
        if name in src_cfg and src_cfg[name] != dst[name]:
            raise ValueError(
                f"warm-start config mismatch: {name}={src_cfg[name]!r} in "
                f"the source checkpoint vs {dst[name]!r} in the target "
                "model; transplant supports only the documented family "
                "widenings (mean-field -> conditional, diag -> chol), not "
                "architecture changes")
    if (src_cfg.get("conditional_posterior", True)
            and not dst["conditional_posterior"]):
        raise ValueError(
            "warm-start cannot narrow conditional -> mean-field q(theta)")
    if (src_cfg.get("theta_posterior", "diag") == "chol"
            and dst["theta_posterior"] == "diag"):
        raise ValueError("warm-start cannot narrow chol -> diag q(theta)")
    src_tp = src_cfg.get("theta_posterior", "diag")
    dst_tp = dst["theta_posterior"]
    if (src_tp.startswith("laplace") or dst_tp.startswith("laplace")) \
            and src_tp != dst_tp:
        # the laplace head's second block is the log information correction
        # c, which is SHAPE-compatible with the diag family's logvar block
        # (and laplace vs laplace-w give c different meanings: absolute
        # ~log-weight vs residual over exact weights) — a cross-family copy
        # would be silently mis-scaled, not merely suboptimal
        raise ValueError(
            f"warm-start theta_posterior {src_tp!r} -> {dst_tp!r}: the "
            "Fisher-anchored families' c-block is not interchangeable with "
            "logvar/chol heads (same shape, different semantics)")
    if src_cfg.get("conditional_posterior", True) and dst["conditional_posterior"]:
        s, d = src_cfg.get("condition_on", "sample"), dst["condition_on"]
        if s != d and "stats" in (s, d):
            raise ValueError(
                f"warm-start condition_on {s!r} -> {d!r}: the 'stats' "
                "encoder input layout is incompatible with the item-draw "
                "layouts (only 'sample' <-> 'mean' share shapes and "
                "semantics)")


def _embed_leaf(s, d):
    s, d = np.asarray(s), np.asarray(d)
    if s.shape == d.shape:
        return s.astype(d.dtype)
    if s.ndim != d.ndim or any(a > b for a, b in zip(s.shape, d.shape)):
        raise ValueError(
            f"cannot transplant a {s.shape} leaf into {d.shape}: the target "
            "family must be at least as wide as the source in every dim")
    out = np.zeros(d.shape, d.dtype)
    out[tuple(slice(0, n) for n in s.shape)] = s
    return out


def transplant_params(src, dst):
    """Corner-embed every `src` leaf into zeros of the matching `dst` leaf's
    shape (same tree structure required) — warm-starting a WIDER variational
    family from a trained narrower one. Correct because every widening this
    framework supports APPENDS new slots after the source block:

    - mean-field -> conditional ('sample'/'mean'/'stats'): the ability
      encoder's first layer grows input ROWS after the 2M response block
      (networks.init_ability_encoder / ability_encoder_input_dim), and zero
      conditioning rows contribute zero modulation — the transplanted model
      computes exactly the source's function at step 0.
    - diag -> chol q(theta): the encoder head grows output COLUMNS after
      [mu, logvar] (networks.ability_head_dim); zero off-diagonal outputs
      make the chol family bitwise-diagonal
      (tests/test_models.py::test_chol_zero_off_head_matches_diag_bitwise).

    Equal-shape leaves copy through, so transplanting into the same family
    is an exact parameter copy."""
    try:
        return jax.tree.map(_embed_leaf, src, dst)
    except ValueError as e:
        raise ValueError(
            f"warm-start transplant failed: {e} (source and target models "
            "must share pytree structure — same irt_model/hidden layout)"
        ) from e


def peek_extra(path: str) -> dict:
    """Read only the extra_* metadata (no pytree template needed) — e.g. the
    embedded model config that makes checkpoints self-describing."""
    with np.load(path) as data:
        return {k[len("extra_"):]: data[k] for k in data.files
                if k.startswith("extra_")}
