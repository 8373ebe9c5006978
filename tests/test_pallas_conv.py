"""Fused Pallas conv3x3 kernel vs XLA oracle, and the PostProcess route.

The kernel itself (ops/pallas_conv.py) runs in interpreter mode here so
the test is device-independent; the PostProcess integration test checks
the PMCTF_PALLAS_POST routing produces the same numbers as the XLA path.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from learned_pmctf_tpu.ops import pallas_conv as pc


@pytest.mark.parametrize("n,h,c,o", [(1, 8, 64, 64), (2, 6, 1, 64),
                                     (1, 4, 64, 1), (1, 5, 16, 16)])
@pytest.mark.parametrize("act,res", [(None, False), ("leaky_relu", False),
                                     (None, True), ("tanh", True)])
def test_conv3x3_matches_oracle(n, h, c, o, act, res):
    g = np.random.default_rng(0)
    w = 128
    x = jnp.asarray(g.normal(0, 1, (n, h, c, w)), jnp.float32)
    wt = jnp.asarray(g.normal(0, 0.1, (o, c, 3, 3)), jnp.float32)
    b = jnp.asarray(g.normal(0, 1, (o,)), jnp.float32)
    r = (jnp.asarray(g.normal(0, 1, (n, h, o, w)), jnp.float32)
         if res else None)
    with pltpu.force_tpu_interpret_mode():
        got = pc.conv3x3_hcw(x, wt, b, act=act, residual=r)
    ref = pc.conv3x3_hcw_reference(x, wt, b, act=act, residual=r)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_postprocess_pallas_route_matches_xla():
    from learned_pmctf_tpu.models.postprocess import PostProcess
    g = np.random.default_rng(1)
    module = PostProcess(channels=16, num_res=2)
    x = jnp.asarray(g.normal(0, 30, (1, 1, 32, 128)), jnp.float32)
    os.environ["PMCTF_PALLAS_POST"] = "0"
    params = module.init(jax.random.PRNGKey(0), x)
    y_xla = module.apply(params, x)
    try:
        os.environ["PMCTF_PALLAS_POST"] = "1"
        with pltpu.force_tpu_interpret_mode():
            y_pl = module.apply(params, x)
    finally:
        os.environ["PMCTF_PALLAS_POST"] = "0"
    # same params, same math; only reduction order differs
    assert float(jnp.max(jnp.abs(y_xla - y_pl))) < 1e-3
