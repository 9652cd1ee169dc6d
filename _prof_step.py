import time
import jax, jax.numpy as jnp, numpy as np
import optax
from vibo_tpu.data import simulate_irt, holdout_split
from vibo_tpu.models import VIBO, VIBOConfig
from vibo_tpu.train import Trainer, TrainConfig
from vibo_tpu.ops import objectives
from vibo_tpu.ops.pallas_elbo import pack_responses

N, M, K, H = 10240, 1024, 4, 256
sim = simulate_irt("2pl", N, M, ability_dim=K, seed=0, missing_rate=0.1)
ds = holdout_split(sim.response, sim.mask, 0.1, seed=0, name="bench")
model = VIBO(VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                        hidden_dim=H, use_pallas=True, compute_dtype="bfloat16"))
packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
row_valid = jnp.asarray((ds.train_mask.sum(-1) > 0).astype(np.float32))

def timeit(make_run, n_small=20, n_large=100, repeats=5):
    # returns per-step seconds via two-point scan
    times = {}
    for n in (n_small, n_large):
        run = make_run(n)
        out = run(); jax.block_until_ready(out)
        best = float("inf")
        for r in range(repeats):
            t0 = time.perf_counter()
            out = run(); jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return (times[n_large] - times[n_small]) / (n_large - n_small)

def scan_of(body_step):
    def make(n):
        @jax.jit
        def run():
            def body(carry, _):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                params, opt_state, aux = body_step(params, opt_state, sub)
                return (params, opt_state, key), aux["elbo"]
            (p, o, k), es = jax.lax.scan(body, (params0, opt0, jax.random.key(1)), None, length=n)
            return es[-1]
        return run
    return make

for tag, max_gn in (("clip10", 10.0), ("noclip", None)):
    trainer = Trainer(model, TrainConfig(lr=5e-3, max_grad_norm=max_gn))
    params0, opt0 = trainer.init_state(jax.random.key(0))
    raw = trainer._packed_raw_step(1.0, 1)
    step = lambda p, o, k: raw(p, o, k, packed, row_valid)
    per = timeit(scan_of(step))
    print(f"full step {tag}: {per*1e6:.1f} us")

# forward+grad only (no optimizer)
trainer = Trainer(model, TrainConfig(lr=5e-3))
params0, opt0 = trainer.init_state(jax.random.key(0))
def gradonly(p, o, k):
    item_eps, theta_eps = model.sample_noise(p, k, N, 1)
    def loss_fn(pp):
        ll, klt, kli = model.elbo_packed_sums(pp, packed, item_eps, theta_eps, row_valid)
        return -objectives.elbo(ll, klt, kli, 1.0)
    l, g = jax.value_and_grad(loss_fn)(p)
    # fold grads into params cheaply to keep scan carry honest without adam
    p = jax.tree.map(lambda a, b: a - 0.0 * b, p, g)
    return p, o, {"elbo": -l}
print(f"fwd+bwd only: {timeit(scan_of(gradonly))*1e6:.1f} us")

def fwdonly(p, o, k):
    item_eps, theta_eps = model.sample_noise(p, k, N, 1)
    ll, klt, kli = model.elbo_packed_sums(p, packed, item_eps, theta_eps, row_valid)
    e = objectives.elbo(ll, klt, kli, 1.0)
    p = jax.tree.map(lambda a: a + 1e-30 * e, p)
    return p, o, {"elbo": e}
print(f"fwd only: {timeit(scan_of(fwdonly))*1e6:.1f} us")
