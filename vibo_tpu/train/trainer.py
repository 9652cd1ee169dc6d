"""VIBO training harness: jit'd optax step, epoch loop, eval, checkpointing.

Parity contract: SURVEY.md section 3.3 "VIBO training harness" and
section 4.1's call stack (argparse CLI lives in vibo_tpu/cli.py; this module
is the library core). TPU design:

- One XLA compilation per run: static batch shape (minibatches zero-padded),
  MC samples vmap'd, params/opt-state donated.
- Optional ('students','items') mesh: batches sharded over students, item
  posteriors over items (vibo_tpu.parallel); the identical step function
  works 1-chip or N-chip.
- Throughput metric: response-cells/sec/chip = B * M * steps / wall-clock —
  the [B] benchmark's primary metric — measured with block_until_ready.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vibo_tpu import evaluation
from vibo_tpu.data.masking import Dataset, batch_iterator
from vibo_tpu.models.vibo import VIBO
from vibo_tpu.parallel import mesh as meshlib
from vibo_tpu.train import checkpoint as ckpt
from vibo_tpu.utils.metrics import AverageMeter, MetricsLogger


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-3
    epochs: int = 50
    batch_size: int | None = None      # None => full-batch
    num_mc_samples: int = 1            # S for the training ELBO
    seed: int = 0
    eval_every: int = 10               # epochs between held-out evals
    out_dir: str | None = None         # checkpoints + metrics.jsonl
    log_every: int = 10                # epochs between train-metric logs
    max_grad_norm: float | None = 10.0
    check_finite: bool = True          # raise on NaN/Inf ELBO (SURVEY.md sec 6
                                       # "sanitizers": NaN guard in the loop)
    packed: bool | None = None         # int8-packed responses (None = auto:
                                       # full-batch linear links)
    fuse_epochs: bool = True           # full-batch: lax.scan epoch chunks
                                       # inside one jit (host leaves the
                                       # dispatch path between eval points)
    objective: str = "elbo"            # "elbo" | "iwae" (multi-sample
                                       # training bound, arXiv:2108.11579;
                                       # num_mc_samples is S)
    restarts: int = 1                  # independent random restarts; fit()
                                       # keeps the best final training bound.
                                       # K>1 IRT has optimization basins
                                       # (partial posterior collapse on the
                                       # rotation ridge): measured at the
                                       # 10k x 1k K=4 flagship, restarts
                                       # separate heldout 0.722/theta-corr
                                       # 0.98 basins from 0.707/0.85 ones,
                                       # and the training ELBO ranks them
                                       # correctly (multiple random starts is
                                       # standard factor-analysis practice)
    warm_start: str | None = None      # checkpoint path: transplant a
                                       # trained (possibly NARROWER-family)
                                       # model's params into this model's
                                       # init before training — zero-filled
                                       # appended slots make e.g. mean-field
                                       # -> conditional-stats or diag -> chol
                                       # start at exactly the source basin
                                       # (checkpoint.transplant_params).
                                       # Optimizer state starts fresh.


def make_optimizer(lr: float, max_grad_norm: float | None):
    """The Trainer's optax chain, exposed so checkpoints are self-describing:
    serve.AbilityScorer.from_checkpoint rebuilds the exact chain (and thus
    the exact opt-state structure) from the lr/max_grad_norm embedded in the
    checkpoint instead of hardcoding a template."""
    tx = optax.adam(lr)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


class Trainer:
    def __init__(self, model: VIBO, cfg: TrainConfig, mesh=None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.optimizer = make_optimizer(cfg.lr, cfg.max_grad_norm)
        self._step_fn = None
        if cfg.objective not in ("elbo", "iwae"):
            raise ValueError(f"objective must be elbo|iwae, got {cfg.objective!r}")
        if cfg.restarts < 1:
            raise ValueError(f"restarts must be >= 1, got {cfg.restarts}")

    def _cfg_json(self) -> str:
        """Model config as JSON, embedded in checkpoints so they are
        self-describing (serve.AbilityScorer.from_checkpoint needs no model
        argument)."""
        import dataclasses
        import json
        return json.dumps(dataclasses.asdict(self.model.cfg))

    def _opt_cfg_json(self) -> str:
        """Optimizer config embedded in checkpoints (see make_optimizer)."""
        import json
        return json.dumps({"lr": self.cfg.lr,
                           "max_grad_norm": self.cfg.max_grad_norm})

    @staticmethod
    def _vocab_extra(ds) -> dict:
        """Item-id vocabulary for the checkpoint (when the dataset carries
        one — real CSV ingestion does): `cli score` uses it to align new
        students' long-format CSVs to the trained column order."""
        import json
        if getattr(ds, "item_ids", None) is None:
            return {}
        return {"item_ids": json.dumps(list(map(str, ds.item_ids)))}

    # ------------------------------------------------------------- setup

    def init_state(self, key: jax.Array):
        params = self.model.init_params(key)
        if self.mesh is not None:
            shardings = meshlib.param_shardings(params, self.mesh)
            params = jax.tree.map(jax.device_put, params, shardings)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def _loss_and_aux(self, p, key, item_scale, num_samples, data, packed):
        """(neg objective, aux) for either training bound; data is
        (packed, row_valid) or (resp, mask). row_valid is precomputed
        host-side once per fit — deriving it inside the step re-reduces the
        int8 matrix every scan iteration (see VIBO.elbo_packed)."""
        model = self.model
        if self.cfg.objective == "iwae":
            if packed:
                bound = model.iwae_packed(p, key, data[0], item_scale,
                                          num_samples, row_valid=data[1])
            else:
                bound = model.iwae(p, key, data[0], data[1], num_samples,
                                   item_scale)
            zero = jnp.zeros((), jnp.float32)
            # the IWAE bound subsumes the KL decomposition; log it as 'elbo'
            # (the monitored bound) with zeroed component fields
            return -bound, {"elbo": bound, "loglik": bound,
                            "kl_theta": zero, "kl_items": zero}
        if packed:
            bound, aux = model.elbo_packed(p, key, data[0], item_scale,
                                           num_samples, row_valid=data[1])
        else:
            bound, aux = model.elbo(p, key, data[0], data[1], item_scale,
                                    num_samples)
        return -bound, aux

    def make_step(self, item_scale: float, num_samples: int):
        model, optimizer = self.model, self.optimizer

        def step(params, opt_state, key, resp, mask):
            def loss_fn(p):
                return self._loss_and_aux(p, key, item_scale, num_samples,
                                          (resp, mask), packed=False)
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, aux

        donate = (0, 1)
        if self.mesh is None:
            return jax.jit(step, donate_argnums=donate)
        batch_sh = meshlib.batch_sharding(self.mesh)
        return jax.jit(step, donate_argnums=donate,
                       in_shardings=(None, None, None, batch_sh, batch_sh))

    def _packed_raw_step(self, item_scale: float, num_samples: int):
        """Un-jitted packed train step (perf pipeline: the int8 matrix is the
        only response-sized HBM read per step) for both objectives.

        Reparameterization noise is EXOGENOUS — drawn outside loss_fn via
        sample_noise, exactly like the DP path. Drawing it inside the
        differentiated function makes XLA fuse the threefry+erfinv chain
        into (B, K)-shaped consumer fusions with [32,1] windows AND
        recompute it in the VJP pass: profiled 2 x ~60 us/step at 10k x 1k
        on v5e vs ~6 us as a standalone op."""
        model, optimizer = self.model, self.optimizer
        from vibo_tpu.ops import objectives
        iwae = self.cfg.objective == "iwae"
        # transposed (K, B) theta pipeline on the Pallas path: see
        # VIBO.wants_transposed_theta for the layout rationale
        tp = model.wants_transposed_theta()

        def step(params, opt_state, key, packed, row_valid):
            item_eps, theta_eps = model.sample_noise(params, key,
                                                     packed.shape[0],
                                                     num_samples,
                                                     transposed=tp)

            def loss_fn(p):
                if iwae:
                    local, ratio = model.iwae_packed_terms(
                        p, packed, item_eps, theta_eps, row_valid,
                        transposed=tp)
                    bound = objectives.iwae_bound(local + item_scale * ratio)
                    zero = jnp.zeros((), jnp.float32)
                    return -bound, {"elbo": bound, "loglik": bound,
                                    "kl_theta": zero, "kl_items": zero}
                ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps,
                                                      theta_eps, row_valid,
                                                      transposed=tp)
                bound = objectives.elbo(ll, klt, kli, item_scale)
                return -bound, {"elbo": bound, "loglik": ll,
                                "kl_theta": klt, "kl_items": kli}
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, aux

        return step

    def make_step_packed(self, item_scale: float, num_samples: int):
        """Jit'd packed train step (see _packed_raw_step)."""
        step = self._packed_raw_step(item_scale, num_samples)
        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0, 1))
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sh = meshlib.batch_sharding(self.mesh)
        row_sh = NamedSharding(self.mesh, P("students"))
        return jax.jit(step, donate_argnums=(0, 1),
                       in_shardings=(None, None, None, batch_sh, row_sh))

    def _dp_raw_step(self, item_scale: float, num_samples: int):
        """shard_map data-parallel packed step body (un-jitted).

        Why shard_map and not GSPMD: the Pallas masked-loglik kernel lowers to
        a Mosaic custom call that GSPMD cannot partition — under plain pjit it
        would all-gather the response matrix onto every chip. Inside
        shard_map each chip runs the kernel on its local student shard and
        the scalars/grads psum over ICI. Reparameterization noise is drawn
        OUTSIDE the shard with the partitionable RNG, so the result is
        deterministic and device-count-invariant (tested).

        Signature: step(params, opt_state, key, packed, row_weight) where
        row_weight zeroes the KL of padding rows (student axis padded to a
        multiple of the mesh)."""
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        if mesh is None:
            raise ValueError("data-parallel step needs a mesh")
        if dict(mesh.shape).get("items", 1) != 1:
            return self._dp2d_raw_step(item_scale, num_samples)
        n_shards = dict(mesh.shape)["students"]
        model, optimizer = self.model, self.optimizer
        from vibo_tpu.ops import objectives
        tp = model.wants_transposed_theta()
        # theta noise is (S, K, B) on the transposed path: students move to
        # the LAST axis of the shard spec
        theta_eps_spec = (P(None, None, "students") if tp
                          else P(None, "students", None))

        # NO explicit psum on g anywhere below: shard_map's varying-types AD
        # already psums the cotangents of replicated (P()) inputs at the
        # replicated->varying boundary, so g IS the global gradient. An
        # extra psum multiplies it by the shard count (a round-1 bug masked
        # by Adam's scale invariance; caught by the SGD grad-equality tests).
        if self.cfg.objective == "iwae":
            def shard_fn(params, packed, row_weight, item_eps, theta_eps):
                def loss_fn(p):
                    local, ratio = model.iwae_packed_terms(
                        p, packed, item_eps, theta_eps, row_weight,
                        axis_name="students", transposed=tp)
                    # ratio is shard-invariant: psum(ratio / n_shards) ==
                    # ratio, so log_w are the exact global log-weights and
                    # the cross-shard logsumexp is computed identically on
                    # every chip.
                    log_w = jax.lax.psum(
                        local + item_scale * ratio / n_shards, "students")
                    bound = objectives.iwae_bound(log_w)
                    return -bound, bound
                (_, bound), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                zero = jnp.zeros((), jnp.float32)
                # step() recombines via elbo(ll, klt, kli): bound - 0 - 0
                return g, bound, zero, zero
        else:
            def shard_fn(params, packed, row_weight, item_eps, theta_eps):
                def loss_fn(p):
                    ll, klt, kli = model.elbo_packed_sums(
                        p, packed, item_eps, theta_eps, row_weight,
                        axis_name="students", transposed=tp)
                    # the sum over shards of this local objective == the
                    # global loss (kli is shard-invariant, hence /n_shards)
                    local = -(ll - klt - item_scale * kli / n_shards)
                    return local, (ll, klt, kli)
                (_, (ll, klt, kli)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                ll = jax.lax.psum(ll, "students")
                klt = jax.lax.psum(klt, "students")
                return g, ll, klt, kli

        smapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P("students", None), P("students"), P(),
                      theta_eps_spec),
            out_specs=(P(), P(), P(), P()))

        def step(params, opt_state, key, packed, row_weight):
            item_eps, theta_eps = model.sample_noise(params, key,
                                                     packed.shape[0],
                                                     num_samples,
                                                     transposed=tp)
            grads, ll, klt, kli = smapped(params, packed, row_weight,
                                          item_eps, theta_eps)
            bound = objectives.elbo(ll, klt, kli, item_scale)
            aux = {"elbo": bound, "loglik": ll, "kl_theta": klt,
                   "kl_items": kli}
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, aux

        return step

    def _dp2d_raw_step(self, item_scale: float, num_samples: int):
        """shard_map packed step on a 2D ('students','items') mesh (un-jitted).

        The packed matrix is tiled BOTH ways: each chip runs the fused
        kernel on its (student-block, item-block) tile with the item
        posteriors/noise sliced at its item index; the ability encoder's
        first layer (a contraction over items) runs as per-shard partial
        matmuls psum'd over the 'items' axis (networks.
        apply_ability_encoder_item_sharded). Wide matrices (DuoLingo-scale
        item axes) therefore never materialize a full response row per chip.
        Loss scaling: theta-KL is identical across item shards (/n_items
        shards) and item-KL across student shards (/n_student shards), so
        the mesh-summed local losses equal the global loss and the
        varying-types auto-psum delivers exact global gradients.

        Both objectives run here (IWAE via iwae_packed_terms_2d: one psum
        over both axes yields the exact global per-sample log-weights), and
        both item posteriors (the amortized encoder's tile statistics psum
        over 'students' and its per-person score over 'items' —
        VIBO._tile_item_post)."""
        from jax.sharding import PartitionSpec as P

        mesh = self.mesh
        shape = dict(mesh.shape)
        n_s, n_i = shape["students"], shape["items"]
        model, optimizer = self.model, self.optimizer
        from vibo_tpu.ops import objectives

        if self.cfg.objective == "iwae":
            def shard_fn(params, packed, row_weight, item_eps, theta_eps):
                item_index = jax.lax.axis_index("items")

                def loss_fn(p):
                    local = model.iwae_packed_terms_2d(
                        p, packed, item_eps, theta_eps, row_weight,
                        item_index, item_scale)
                    # local carries the /n_i (theta terms) and /n_s (item
                    # ratio) scalings, so this psum yields the exact global
                    # per-sample log-weights, identically on every chip
                    log_w = jax.lax.psum(local, ("students", "items"))
                    bound = objectives.iwae_bound(log_w)
                    return -bound, bound
                (_, bound), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                zero = jnp.zeros((), jnp.float32)
                # step() recombines via elbo(ll, klt, kli): bound - 0 - 0
                return g, bound, zero, zero
        else:
            def shard_fn(params, packed, row_weight, item_eps, theta_eps):
                item_index = jax.lax.axis_index("items")

                def loss_fn(p):
                    ll, klt, kli = model.elbo_packed_sums_2d(
                        p, packed, item_eps, theta_eps, row_weight, item_index)
                    local = -(ll - klt / n_i - item_scale * kli / n_s)
                    return local, (ll, klt, kli)
                (_, (ll, klt, kli)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                # reporting only (g needs no psum — see _dp_raw_step): ll sums
                # over the whole mesh; klt over students (item-shard
                # invariant); kli over items (student-shard invariant)
                ll = jax.lax.psum(ll, ("students", "items"))
                klt = jax.lax.psum(klt, "students")
                kli = jax.lax.psum(kli, "items")
                return g, ll, klt, kli

        smapped = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P("students", "items"), P("students"), P(),
                      P(None, "students", None)),
            out_specs=(P(), P(), P(), P()))

        def step(params, opt_state, key, packed, row_weight):
            item_eps, theta_eps = model.sample_noise(params, key,
                                                     packed.shape[0],
                                                     num_samples)
            grads, ll, klt, kli = smapped(params, packed, row_weight,
                                          item_eps, theta_eps)
            bound = objectives.elbo(ll, klt, kli, item_scale)
            aux = {"elbo": bound, "loglik": ll, "kl_theta": klt,
                   "kl_items": kli}
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, aux

        return step

    def _dp_in_shardings(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        if dict(self.mesh.shape).get("items", 1) != 1:
            return (NamedSharding(self.mesh, P("students", "items")),
                    NamedSharding(self.mesh, P("students")))
        return (meshlib.batch_sharding(self.mesh),
                NamedSharding(self.mesh, P("students")))

    def make_step_packed_dp(self, item_scale: float, num_samples: int):
        """Jit'd shard_map data-parallel packed train step (see _dp_raw_step)."""
        step = self._dp_raw_step(item_scale, num_samples)
        return jax.jit(step, donate_argnums=(0, 1),
                       in_shardings=(None, None, None) + self._dp_in_shardings())

    def make_scan_dp(self, item_scale: float, num_samples: int, length: int):
        """lax.scan over `length` data-parallel packed steps in one jit."""
        raw = self._dp_raw_step(item_scale, num_samples)

        def run(params, opt_state, key, packed, row_weight):
            def body(carry, _):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                params, opt_state, aux = raw(params, opt_state, sub, packed,
                                             row_weight)
                return (params, opt_state, key), aux
            (params, opt_state, key), auxs = jax.lax.scan(
                body, (params, opt_state, key), None, length=length)
            return params, opt_state, key, auxs

        return jax.jit(run, donate_argnums=(0, 1),
                       in_shardings=(None, None, None) + self._dp_in_shardings())

    def make_scan(self, item_scale: float, num_samples: int, length: int,
                  packed: bool = False, donate: bool = True):
        """`length` full-batch train steps fused in one jit via lax.scan —
        the host never sits in the dispatch path between eval points.
        Returns (params, opt_state, key, aux_stack) with per-step aux."""
        model, optimizer = self.model, self.optimizer

        if packed:
            raw_step = self._packed_raw_step(item_scale, num_samples)
        else:
            def raw_step(params, opt_state, key, *data):
                def loss_fn(p):
                    return self._loss_and_aux(p, key, item_scale, num_samples,
                                              data, packed=False)
                (_, aux), grads = jax.value_and_grad(loss_fn,
                                                     has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, aux

        def run(params, opt_state, key, *data):
            def body(carry, _):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                params, opt_state, aux = raw_step(params, opt_state, sub, *data)
                return (params, opt_state, key), aux
            (params, opt_state, key), auxs = jax.lax.scan(
                body, (params, opt_state, key), None, length=length)
            return params, opt_state, key, auxs

        dn = (0, 1) if donate else ()
        if self.mesh is None:
            return jax.jit(run, donate_argnums=dn)
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sh = meshlib.batch_sharding(self.mesh)
        row_sh = NamedSharding(self.mesh, P("students"))
        data_sh = (batch_sh, row_sh) if packed else (batch_sh, batch_sh)
        return jax.jit(run, donate_argnums=dn,
                       in_shardings=(None, None, None) + data_sh)

    # --------------------------------------------------------------- fit

    def fit(self, ds: Dataset, truth=None, key: jax.Array | None = None,
            resume: str | None = None):
        """Train on ds.train_mask; periodically evaluate held-out imputation.

        truth: optional SyntheticIRT for parameter-recovery correlations.
        resume: optional checkpoint path (train/checkpoint.py) — restores
        params, optimizer state, and the PRNG stream, then trains cfg.epochs
        FURTHER epochs (exact-resume semantics tested in
        tests/test_checkpoint.py).
        Returns a results dict (history + best metrics + final state).

        cfg.restarts > 1 runs that many independent fits (seed, seed+1, ...)
        and returns the one with the best final training bound, with a
        per-restart summary under "restarts" (see TrainConfig.restarts).
        """
        if self.cfg.restarts > 1:
            return self._fit_restarts(ds, truth, key, resume)
        return self._fit_single(ds, truth, key, resume)

    def _fit_restarts(self, ds: Dataset, truth, key, resume):
        """Run cfg.restarts independent fits, keep the best training bound.

        Selection is by the FINAL training objective (ELBO/IWAE) — an
        unsupervised criterion, so held-out data never leaks into model
        selection. Each restart trains under out_dir/restart{r}; the
        winner's checkpoints are promoted to out_dir's root so downstream
        consumers (cli score, serve.AbilityScorer.from_checkpoint, resume)
        see the same layout as a single-restart run."""
        import shutil

        if resume:
            raise ValueError(
                "restarts > 1 cannot be combined with resume=; resume the "
                "selected run's checkpoint with restarts=1")
        base = self.cfg
        runs = []
        for r in range(base.restarts):
            sub_cfg = dataclasses.replace(
                base, restarts=1, seed=base.seed + r,
                out_dir=(os.path.join(base.out_dir, f"restart{r}")
                         if base.out_dir else None))
            sub = Trainer(self.model, sub_cfg, mesh=self.mesh)
            sub_key = None if key is None else jax.random.fold_in(key, r)
            runs.append(sub._fit_single(ds, truth, sub_key, None))
        scores = np.asarray([run["final_elbo"] for run in runs], np.float64)
        selected = 0 if np.all(np.isnan(scores)) else int(np.nanargmax(scores))
        res = runs[selected]
        res["selected_restart"] = selected
        res["restarts"] = [
            {"restart": r, "seed": base.seed + r,
             "final_elbo": run["final_elbo"],
             "best_heldout_acc": run["best"]["heldout_acc"]}
            for r, run in enumerate(runs)]
        if base.out_dir:
            for name in ("best.npz", "last.npz"):
                src = os.path.join(base.out_dir, f"restart{selected}", name)
                if os.path.exists(src):
                    shutil.copy2(src, os.path.join(base.out_dir, name))
        return res

    def _fit_single(self, ds: Dataset, truth=None,
                    key: jax.Array | None = None, resume: str | None = None):
        cfg = self.cfg
        n, m = ds.response.shape
        batch_size = cfg.batch_size or n
        batch_size = min(batch_size, n)
        item_scale = batch_size / n
        key = jax.random.key(cfg.seed) if key is None else key
        key, k_init = jax.random.split(key)
        params, opt_state = self.init_state(k_init)
        if cfg.warm_start and resume:
            raise ValueError("warm_start and resume are mutually exclusive: "
                             "resume restores exact state; warm_start "
                             "transplants params into a fresh run")
        if cfg.warm_start:
            import json as _json
            extra = ckpt.peek_extra(cfg.warm_start)
            if "model_cfg" in extra:
                # reject shape-compatible-but-scrambled embeds (e.g. K=1 ->
                # K=4 landing the source logvar column in the target mu
                # block) before touching any parameter — round-4 advisor
                ckpt.check_transplant_compat(
                    _json.loads(str(extra["model_cfg"])), self.model.cfg)
            src = ckpt.load_params_self_describing(cfg.warm_start)
            params = jax.tree.map(jnp.asarray,
                                  ckpt.transplant_params(src, params))
            if self.mesh is not None:
                shardings = meshlib.param_shardings(params, self.mesh)
                params = jax.tree.map(jax.device_put, params, shardings)
            opt_state = self.optimizer.init(params)
        if resume:
            (params, opt_state), key, _, _ = ckpt.load_checkpoint(
                resume, (params, opt_state))
            if self.mesh is not None:
                shardings = meshlib.param_shardings(params, self.mesh)
                params = jax.tree.map(jax.device_put, params, shardings)

        if cfg.out_dir:
            os.makedirs(cfg.out_dir, exist_ok=True)
        logger = MetricsLogger(
            os.path.join(cfg.out_dir, "metrics.jsonl") if cfg.out_dir else None)

        full_batch = batch_size >= n
        n_items_axis = (dict(self.mesh.shape).get("items", 1)
                        if self.mesh is not None else 1)
        items_mesh = n_items_axis != 1
        # 2D packed support: the tile step handles both objectives and both
        # item posteriors; the only constraint is an evenly-divisible item
        # axis (pad via data.masking.pad_to_multiple otherwise)
        can_2d = items_mesh and m % n_items_axis == 0
        use_packed = cfg.packed
        if use_packed is None:
            # auto: elbo_packed handles every link (fused kernels for linear
            # links + supported deep; XLA fallback otherwise), and int8
            # packing always cuts response HBM traffic
            use_packed = full_batch and (not items_mesh or can_2d)
        elif use_packed and not full_batch:
            raise ValueError(
                "packed=True requires full-batch training (batch_size=None); "
                "the minibatch path trains on unpacked resp/mask")
        elif use_packed and items_mesh and not can_2d:
            raise ValueError(
                "packed=True on an item-sharded mesh needs num_items "
                f"divisible by the items axis (got {m} items on "
                f"{n_items_axis} item shards) — pad the dataset via "
                "data.masking.pad_to_multiple or use a students-only mesh")
        dp = full_batch and use_packed and self.mesh is not None
        # row validity, folded host-side once per fit: has-any-observed-cell
        # (real all-missing rows are possible) and, for DP, padding rows
        row_valid = (ds.train_mask.sum(-1) > 0).astype(np.float32)
        if full_batch:
            if dp:
                from vibo_tpu.ops.pallas_elbo import pack_responses
                n_sh = dict(self.mesh.shape)["students"]
                pad = (-n) % n_sh
                pk = pack_responses(ds.response, ds.train_mask)
                pk = np.pad(pk, ((0, pad), (0, 0)))  # 0 == missing: inert
                rowv = np.pad(row_valid, (0, pad))
                sh_pk, sh_rv = self._dp_in_shardings()
                data = (jax.device_put(jnp.asarray(pk), sh_pk),
                        jax.device_put(jnp.asarray(rowv), sh_rv))
            elif use_packed:
                from vibo_tpu.ops.pallas_elbo import pack_responses
                data = (jnp.asarray(pack_responses(ds.response, ds.train_mask)),
                        jnp.asarray(row_valid))
            else:
                data = (jnp.asarray(ds.response), jnp.asarray(ds.train_mask))
                if self.mesh is not None:
                    data = meshlib.shard_arrays(self.mesh, *data)
        if full_batch and cfg.fuse_epochs:
            return self._fit_fused(ds, truth, key, params, opt_state, data,
                                   item_scale, use_packed, dp, logger)
        if dp:
            step_fn = self.make_step_packed_dp(item_scale, cfg.num_mc_samples)
        elif full_batch and use_packed:
            step_fn = self.make_step_packed(item_scale, cfg.num_mc_samples)
        else:
            step_fn = self.make_step(item_scale, cfg.num_mc_samples)

        history = []
        best = {"heldout_acc": -1.0, "epoch": -1}
        cells_meter = AverageMeter()
        t_train = 0.0
        global_step = 0
        for epoch in range(cfg.epochs):
            elbo_meter = AverageMeter()
            t0 = time.perf_counter()
            if full_batch:
                key, k = jax.random.split(key)
                params, opt_state, aux = step_fn(params, opt_state, k, *data)
                elbo_meter.update(float(aux["elbo"]))
                global_step += 1
                steps = 1
            else:
                steps = 0
                for resp, mask in batch_iterator(ds, batch_size, cfg.seed, epoch):
                    key, k = jax.random.split(key)
                    resp, mask = jnp.asarray(resp), jnp.asarray(mask)
                    if self.mesh is not None:
                        resp, mask = meshlib.shard_arrays(self.mesh, resp, mask)
                    params, opt_state, aux = step_fn(params, opt_state, k, resp, mask)
                    steps += 1
                    global_step += 1
                    elbo_meter.update(float(aux["elbo"]))
            elbo_val = float(aux["elbo"])  # host fetch: completion barrier
            if cfg.check_finite and not np.isfinite(elbo_val):
                raise FloatingPointError(
                    f"non-finite ELBO at epoch {epoch}: "
                    f"loglik={float(aux['loglik'])} "
                    f"kl_theta={float(aux['kl_theta'])} "
                    f"kl_items={float(aux['kl_items'])} — check lr/grad-clip")
            dt = time.perf_counter() - t0
            t_train += dt
            # count true response cells (the last batch's zero-mask padding
            # rows are not work the [B] metric should credit)
            cells_meter.update(n * m / dt if not full_batch
                               else batch_size * m * steps / dt)

            if (epoch + 1) % cfg.log_every == 0 or epoch == cfg.epochs - 1:
                rec = {"event": "train", "epoch": epoch, "step": global_step,
                       "elbo": elbo_meter.avg,
                       "loglik": float(aux["loglik"]),
                       "kl_theta": float(aux["kl_theta"]),
                       "kl_items": float(aux["kl_items"]),
                       "cells_per_sec": cells_meter.avg}
                logger.log(**rec)
                history.append(rec)

            if ((epoch + 1) % cfg.eval_every == 0 or epoch == cfg.epochs - 1) \
                    and ds.heldout_mask.sum() > 0:
                ev = evaluation.imputation_accuracy(self.model, params, ds)
                rec = {"event": "eval", "epoch": epoch, **ev}
                if truth is not None:
                    theta_hat, _ = evaluation.infer_posterior_means(self.model, params, ds)
                    rec["theta_pearson"] = evaluation.correlation(
                        theta_hat[:truth.theta.shape[0]], truth.theta,
                        align_rotation=True)["pearson"]
                logger.log(**rec)
                history.append(rec)
                if ev["acc"] > best["heldout_acc"]:
                    best = {"heldout_acc": ev["acc"], "epoch": epoch}
                    if cfg.out_dir:
                        ckpt.save_checkpoint(
                            os.path.join(cfg.out_dir, "best.npz"),
                            (params, opt_state), key, global_step,
                            extra={"epoch": epoch, "heldout_acc": ev["acc"],
                                   "model_cfg": self._cfg_json(),
                                   "opt_cfg": self._opt_cfg_json(),
                                   **self._vocab_extra(ds)})

        logger.close()
        return {"params": params, "opt_state": opt_state, "key": key,
                "history": history, "best": best,
                "final_elbo": elbo_meter.avg,
                "train_seconds": t_train,
                "cells_per_sec": cells_meter.avg}

    def _fit_fused(self, ds, truth, key, params, opt_state, data, item_scale,
                   use_packed, dp, logger):
        """Full-batch fit with epochs fused into lax.scan chunks of
        eval_every steps (eval is the only boundary that needs params on the
        host): ONE dispatch + scalar fetch per eval interval; intermediate
        log_every records are emitted afterwards from the scan's stacked
        per-epoch aux. PRNG-equivalent to the per-epoch path (same split
        order)."""
        cfg = self.cfg
        n, m = ds.response.shape
        chunk = max(1, min(cfg.eval_every, cfg.epochs))
        scan_fns = {}

        def get_scan(length):
            if length not in scan_fns:
                if dp:
                    scan_fns[length] = self.make_scan_dp(
                        item_scale, cfg.num_mc_samples, length)
                else:
                    scan_fns[length] = self.make_scan(
                        item_scale, cfg.num_mc_samples, length,
                        packed=use_packed)
            return scan_fns[length]

        history = []
        best = {"heldout_acc": -1.0, "epoch": -1}
        cells_meter = AverageMeter()
        t_train = 0.0
        chunk_dts = []
        epoch = 0
        final_elbo = float("nan")
        while epoch < cfg.epochs:
            n_run = min(chunk, cfg.epochs - epoch)
            t0 = time.perf_counter()
            params, opt_state, key, auxs = get_scan(n_run)(
                params, opt_state, key, *data)
            elbos = np.asarray(auxs["elbo"])  # host fetch: completion barrier
            dt = time.perf_counter() - t0
            t_train += dt
            chunk_dts.append(dt)
            cells_meter.update(n * m * n_run / dt)
            epoch += n_run
            final_elbo = float(elbos[-1])
            if cfg.check_finite and not np.isfinite(elbos).all():
                bad = int(np.argmax(~np.isfinite(elbos)))
                raise FloatingPointError(
                    f"non-finite ELBO at epoch {epoch - n_run + bad}: "
                    f"loglik={float(auxs['loglik'][bad])} "
                    f"kl_theta={float(auxs['kl_theta'][bad])} "
                    f"kl_items={float(auxs['kl_items'][bad])} — check "
                    "lr/grad-clip")

            last = epoch == cfg.epochs
            start = epoch - n_run
            for off in range(n_run):
                e = start + off
                if (e + 1) % cfg.log_every == 0 or (last and off == n_run - 1):
                    rec = {"event": "train", "epoch": e, "step": e + 1,
                           "elbo": float(elbos[off]),
                           "loglik": float(auxs["loglik"][off]),
                           "kl_theta": float(auxs["kl_theta"][off]),
                           "kl_items": float(auxs["kl_items"][off]),
                           "cells_per_sec": cells_meter.avg}
                    logger.log(**rec)
                    history.append(rec)
            if (epoch % cfg.eval_every == 0 or last) \
                    and ds.heldout_mask.sum() > 0:
                ev = evaluation.imputation_accuracy(self.model, params, ds)
                rec = {"event": "eval", "epoch": epoch - 1, **ev}
                if truth is not None:
                    theta_hat, _ = evaluation.infer_posterior_means(
                        self.model, params, ds)
                    rec["theta_pearson"] = evaluation.correlation(
                        theta_hat[:truth.theta.shape[0]], truth.theta,
                        align_rotation=True)["pearson"]
                logger.log(**rec)
                history.append(rec)
                if ev["acc"] > best["heldout_acc"]:
                    best = {"heldout_acc": ev["acc"], "epoch": epoch - 1}
                    if cfg.out_dir:
                        ckpt.save_checkpoint(
                            os.path.join(cfg.out_dir, "best.npz"),
                            (params, opt_state), key, epoch,
                            extra={"epoch": epoch - 1,
                                   "heldout_acc": ev["acc"],
                                   "model_cfg": self._cfg_json(),
                                   "opt_cfg": self._opt_cfg_json(),
                                   **self._vocab_extra(ds)})

        logger.close()
        # first chunk pays the XLA/remote compile; report warm time too
        warm = (t_train - chunk_dts[0] + float(np.median(chunk_dts[1:]))
                if len(chunk_dts) > 1 else t_train)
        return {"params": params, "opt_state": opt_state, "key": key,
                "history": history, "best": best,
                "final_elbo": final_elbo,
                "train_seconds": t_train,
                "warm_train_seconds": warm,
                "cells_per_sec": cells_meter.avg}
