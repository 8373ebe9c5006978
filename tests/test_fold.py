"""Space-to-depth conv folding: exactness vs the direct convolution."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.ops.fold import (
    fold2, unfold2, fold2_weights, conv2d_folded, fold_small_convs,
)


def _conv_ref(x, w):
    k = w.shape[2]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def test_fold_unfold_roundtrip():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(0, 1, (2, 3, 8, 12)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(unfold2(fold2(x))),
                                  np.asarray(x))


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("cin,cout", [(1, 16), (16, 16), (8, 32)])
def test_folded_conv_matches_direct(k, cin, cout):
    g = np.random.default_rng(k * 100 + cin)
    x = jnp.asarray(g.normal(0, 1, (1, cin, 16, 24)), jnp.float32)
    w = jnp.asarray(g.normal(0, 0.2, (cout, cin, k, k)), jnp.float32)
    b = jnp.asarray(g.normal(0, 0.1, (cout,)), jnp.float32)
    ref = _conv_ref(x, w) + b.reshape(1, -1, 1, 1)
    out = conv2d_folded(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_folded_weight_structure():
    """Folded kernel has the predicted size and structural zeros."""
    w = jnp.ones((2, 3, 3, 3))
    wf, pad = fold2_weights(w)
    assert wf.shape == (8, 12, 3, 3)
    assert pad == ((1, 1), (1, 1))
    # 3x3 folded from 3x3: exactly 9 of 36 (phase,tap) H-combinations
    # live per axis -> nonzero fraction is (9/36)^... just assert ~25%
    frac = float(jnp.mean((wf != 0).astype(jnp.float32)))
    assert 0.2 < frac < 0.3, frac
    w7 = jnp.ones((2, 3, 7, 7))
    wf7, pad7 = fold2_weights(w7)
    assert wf7.shape == (8, 12, 5, 5)
    assert pad7 == ((2, 2), (2, 2))


def test_predict_update_folded_matches_unfolded():
    from learned_pmctf_tpu.models.layers import PredictUpdate
    g = np.random.default_rng(5)
    x = jnp.asarray(g.normal(0, 1, (1, 1, 32, 48)), jnp.float32)
    m = PredictUpdate(1)
    with fold_small_convs(False):
        params = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(params, x)
    with fold_small_convs(True):
        out = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_predict_update_odd_shape_falls_back():
    from learned_pmctf_tpu.models.layers import PredictUpdate
    g = np.random.default_rng(6)
    x = jnp.asarray(g.normal(0, 1, (1, 1, 31, 47)), jnp.float32)
    m = PredictUpdate(1)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)  # odd dims: must not crash
    assert out.shape == x.shape


def test_mebasic_folded_matches_unfolded():
    from learned_pmctf_tpu.models.spynet import MEBasic
    g = np.random.default_rng(7)
    x = jnp.asarray(g.normal(0, 1, (1, 4, 16, 16)), jnp.float32)
    m = MEBasic(in_ch=4)
    with fold_small_convs(False):
        params = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(params, x)
    with fold_small_convs(True):
        out = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_fold_batch_gate():
    """Folding is restricted to batch <= 2: at larger batch XLA picks
    pathological layouts for the 6-D fold intermediates (measured
    32-128x tile-padding HBM expansion at 1080p batch 8)."""
    from learned_pmctf_tpu.ops.fold import foldable
    import jax.numpy as jnp
    assert foldable(jnp.zeros((1, 1, 8, 8)))
    assert foldable(jnp.zeros((2, 1, 8, 8)))
    assert not foldable(jnp.zeros((4, 1, 8, 8)))
    assert not foldable(jnp.zeros((1, 1, 7, 8)))


@pytest.mark.parametrize("mode", ["w2", "2x2w2"])
@pytest.mark.parametrize("k", [3, 5, 7])
def test_width_fold_modes_match_direct(mode, k):
    from learned_pmctf_tpu.ops.fold import (
        fold_by_mode, unfold_by_mode, fold_weights_by_mode)
    g = np.random.default_rng(k)
    x = jnp.asarray(g.normal(0, 1, (2, 5, 16, 24)), jnp.float32)
    w = jnp.asarray(g.normal(0, 0.2, (7, 5, k, k)), jnp.float32)
    ref = _conv_ref(x, w)
    wf, pad, rep = fold_weights_by_mode(w, mode)
    assert rep == {"w2": 2, "2x2w2": 8}[mode]
    yf = jax.lax.conv_general_dilated(
        fold_by_mode(x, mode), wf, (1, 1), pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    out = unfold_by_mode(yf, mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("module_kind", ["postprocess", "pu"])
def test_width_fold_nets_match_nofold(module_kind):
    from learned_pmctf_tpu.ops.fold import fold_width_variants
    g = np.random.default_rng(11)
    x = jnp.asarray(g.normal(0, 1, (1, 1, 32, 64)), jnp.float32)
    if module_kind == "postprocess":
        from learned_pmctf_tpu.models.postprocess import PostProcess
        m = PostProcess()
    else:
        from learned_pmctf_tpu.models.layers import PredictUpdate
        m = PredictUpdate(1)
    params = m.init(jax.random.PRNGKey(0), x)
    # The fold is an exact algebraic identity; compare at pinned f32
    # matmul precision so bf16-MXU reassociation noise (which differs
    # between the folded and direct conv shapes) doesn't mask it.
    with jax.default_matmul_precision("highest"):
        with fold_small_convs(False):
            ref = m.apply(params, x)
        with fold_width_variants(True):
            out = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_param_tree_unchanged_by_folding():
    """Folding is an execution detail: the param tree (names, shapes) is
    identical, so checkpoints and the torch importer are unaffected."""
    from learned_pmctf_tpu.models.layers import PredictUpdate
    x = jnp.zeros((1, 1, 8, 8))
    m = PredictUpdate(1)
    with fold_small_convs(True):
        p1 = jax.tree_util.tree_map(lambda a: a.shape,
                                    m.init(jax.random.PRNGKey(0), x))
    with fold_small_convs(False):
        p2 = jax.tree_util.tree_map(lambda a: a.shape,
                                    m.init(jax.random.PRNGKey(0), x))
    assert p1 == p2
