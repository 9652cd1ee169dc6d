"""NUTS trajectory tests (models/hmc.py trajectory="nuts").

Parity contract: SURVEY.md section 3.3 names the reference baseline
"HMC/NUTS" (Pyro's NUTS); round-2 verdict missing #5 tracked dynamic
trajectory lengths as the one unimplemented component. These tests cover
the iterative multinomial NUTS draw: structural invariants of the dynamic
path lengths, adaptation hitting the accept target, and (slow) agreement
of the sampled posterior with the fixed-trajectory engine on the same data
— two exact samplers of the same posterior must agree to Monte-Carlo error.
"""

import numpy as np
import pytest

from vibo_tpu.data import simulate_irt
from vibo_tpu.models import hmc


def _sign_align(x, ref):
    return x if np.corrcoef(x, ref)[0, 1] >= 0 else -x


def test_nuts_structural():
    sim = simulate_irt("1pl", 24, 12, ability_dim=1, seed=3,
                       missing_rate=0.0)
    res = hmc.run_hmc(sim.response, sim.mask, hmc.HMCConfig(
        irt_model="1pl", num_warmup=60, num_samples=60, num_chains=2,
        trajectory="nuts", max_tree_depth=4, seed=7))
    d = res["diagnostics"]
    assert d["trajectory"] == "nuts"
    # dynamic path length: at least 1 leapfrog, at most 2^depth - 1
    assert 1.0 <= d["leapfrogs_per_draw"] <= 2 ** 4 - 1
    # multinomial NUTS has no reject step; the dual-averaged accept
    # statistic should sit near the 0.8 target after warmup
    assert 0.4 < res["accept_rate"] <= 1.0
    assert d["divergences"] == 0
    assert res["samples"]["theta"].shape == (120, 24, 1)
    assert np.isfinite(d["rhat_max"])


def test_invalid_trajectory_raises():
    sim = simulate_irt("1pl", 8, 4, ability_dim=1, seed=0,
                       missing_rate=0.0)
    with pytest.raises(ValueError, match="trajectory"):
        hmc.run_hmc(sim.response, sim.mask,
                    hmc.HMCConfig(trajectory="nuts2"))


@pytest.mark.slow
def test_nuts_matches_fixed_hmc():
    """NUTS and fixed-trajectory HMC sample the SAME posterior: their
    per-person posterior means must agree to Monte-Carlo error."""
    sim = simulate_irt("2pl", 64, 32, ability_dim=1, seed=0,
                       missing_rate=0.1)
    base = dict(irt_model="2pl", num_warmup=250, num_samples=250,
                num_chains=2, seed=11)
    r_nuts = hmc.run_hmc(sim.response, sim.mask, hmc.HMCConfig(
        trajectory="nuts", max_tree_depth=6, **base))
    r_fix = hmc.run_hmc(sim.response, sim.mask, hmc.HMCConfig(
        trajectory="fixed", **base))
    for r in (r_nuts, r_fix):
        assert r["diagnostics"]["rhat_max"] < 1.1
        assert r["diagnostics"]["divergences"] == 0
    mu_n = r_nuts["samples"]["theta"].mean(0)[:, 0]
    mu_f = r_fix["samples"]["theta"].mean(0)[:, 0]
    mu_n = _sign_align(mu_n, mu_f)  # (theta, a) sign gauge across runs
    assert np.corrcoef(mu_n, mu_f)[0, 1] > 0.95
    # posterior spread agreement (same posterior, same scale)
    sd_n = r_nuts["samples"]["theta"].std(0)[:, 0].mean()
    sd_f = r_fix["samples"]["theta"].std(0)[:, 0].mean()
    assert 0.7 < sd_n / sd_f < 1.4
