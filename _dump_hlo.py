import jax, jax.numpy as jnp, numpy as np
from vibo_tpu.data import simulate_irt, holdout_split
from vibo_tpu.models import VIBO, VIBOConfig
from vibo_tpu.train import Trainer, TrainConfig
from vibo_tpu.ops.pallas_elbo import pack_responses

N, M, K, H = 10240, 1024, 4, 256
sim = simulate_irt("2pl", N, M, ability_dim=K, seed=0, missing_rate=0.1)
ds = holdout_split(sim.response, sim.mask, 0.1, seed=0, name="bench")
model = VIBO(VIBOConfig(num_items=M, irt_model="2pl", ability_dim=K,
                        hidden_dim=H, use_pallas=True, compute_dtype="bfloat16"))
packed = jnp.asarray(pack_responses(ds.response, ds.train_mask))
row_valid = jnp.asarray((ds.train_mask.sum(-1) > 0).astype(np.float32))
trainer = Trainer(model, TrainConfig(lr=5e-3))
params, opt = trainer.init_state(jax.random.key(0))
run = trainer.make_scan(1.0, 1, 10, packed=True, donate=False)
txt = run.lower(params, opt, jax.random.key(1), packed, row_valid).compile().as_text()
open("/tmp/step_hlo.txt", "w").write(txt)
print(len(txt))
