"""Jittable training steps for pWave (image) and pMCTF (video).

The pMCTF GOP step reproduces the reference's hierarchical schedule
(ref: train_pMCTF_L.py:161-251): forward MCTF analysis over
log2(num_frames) temporal stages, inverse synthesis, then a per-frame
rate-distortion loss with stage-gated terms. The whole GOP graph is
differentiated end-to-end; each pair-coding is wrapped in jax.checkpoint
(rematerialization) so GOP-16 fits in HBM — the TPU answer to the
reference's "memory scales with GOP size" problem (SURVEY.md §3.2).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


class StageGates(NamedTuple):
    """Loss-term gating per curriculum stage. ref: train_pMCTF_L.py:110-118."""

    d_me: float = 0.0      # motion-estimation distortion (stages < 2)
    d_rec: float = 1.0     # reconstruction distortion (stages >= 2)
    r_mv: float = 1.0      # MV rate (stages >= 1)
    r_latent: float = 1.0  # latent rate (stages >= 2)

    @staticmethod
    def for_stage(stage_num: int) -> "StageGates":
        return StageGates(
            d_me=1.0 if stage_num < 2 else 0.0,
            d_rec=1.0 if stage_num >= 2 else 0.0,
            r_mv=1.0 if stage_num >= 1 else 0.0,
            r_latent=1.0 if stage_num >= 2 else 0.0,
        )


def make_pwave_train_step(module, tx):
    """Variable-rate image training step. ref: train_pWave.py:38-113."""

    def loss_fn(params, x, q_index, lmbda):
        out = module.apply(params, x, q_index)
        n, _, h, w = x.shape
        bpp = jnp.sum(out["bits"]) / (n * h * w)
        mse = out["mse"]
        loss = lmbda * mse + bpp
        return loss, {"loss": loss, "mse": mse, "bpp": bpp}

    @jax.jit
    def step(params, opt_state, x, q_index, lmbda):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, x, q_index, lmbda)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def pmctf_gop_loss(module, params, frames, q_index, lmbda,
                   gates: StageGates, me_base: int = 0, rng=None,
                   remat: bool = True, use_scan: bool = True):
    """End-to-end GOP rate-distortion loss.

    frames: list of (B,1,H,W) arrays, length a power of two.
    Returns (loss, metrics). ref: train_pMCTF_L.py:147-246.

    Graph-size control (critical for GOP-16 compile times): within one
    temporal stage every pair shares shapes and parameters, so pairs
    1..n-1 run under ONE lax.scan body (the DPB is the carry); only the
    stage's first pair (empty DPB -> different adaptor branch) is traced
    separately. The inverse synthesis pairs of a stage are independent
    and run under vmap. Per-pair rematerialization keeps GOP-16 in HBM.
    """
    num_frames = len(frames)
    num_stages = max(1, int(math.log2(num_frames)))
    assert 2 ** num_stages == num_frames, num_frames

    def code_pair(params, ref, cur, dpb, code_lt, stage_idx, key):
        rngs = {"noise": key} if key is not None else {}
        return module.apply(params, ref, cur, q_index, code_lt, dpb,
                            stage_idx=stage_idx, rngs=rngs, training=True)

    if remat:
        code_pair = jax.checkpoint(code_pair, static_argnums=(4, 5))

    frames_coded = list(frames)
    mvs = [None] * num_frames
    results = [None] * num_frames

    key_idx = 0

    def next_key():
        nonlocal key_idx
        if rng is None:
            return None
        key = jax.random.fold_in(rng, key_idx)
        key_idx += 1
        return key

    def pack_result(result):
        return {"bpp_H": result["bpp_H"], "bpp_me": result["bpp_me"],
                "me_mse": result["me_mse"], "bpp": result["bpp"]}

    num_pairs = num_frames // 2
    for stage_idx in range(num_stages):
        group_step = 2 ** stage_idx
        code_lt = (stage_idx + 1) == num_stages
        stage = me_base + stage_idx
        fidxs = [g * 2 * group_step for g in range(num_pairs)]

        # first pair of the stage: empty DPB (adaptor_0 branch)
        dpb = {"mv_feature": None, "ref_mv_y": None}
        result = code_pair(params, frames_coded[fidxs[0]],
                           frames_coded[fidxs[0] + group_step], dpb,
                           code_lt, stage, next_key())
        dpb = result["dpb"]
        frames_coded[fidxs[0]] = result["L_t"]
        frames_coded[fidxs[0] + group_step] = result["H_t"]
        mvs[fidxs[0] + group_step] = result["mv_hat"]
        results[fidxs[0] + group_step] = pack_result(result)
        if code_lt:
            results[fidxs[0]] = {"bpp_L": result["bpp_L"],
                                 "me_mse_inv": result["me_mse_inv"]}

        rest = fidxs[1:]
        if rest and use_scan:
            refs = jnp.stack([frames_coded[f] for f in rest])
            curs = jnp.stack([frames_coded[f + group_step] for f in rest])
            keys = jnp.stack([next_key() for _ in rest]) if rng is not None \
                else jnp.zeros((len(rest), 2), jnp.uint32)

            def body(dpb, xs):
                ref, cur, key = xs
                out = code_pair(params, ref, cur, dpb, code_lt, stage,
                                key if rng is not None else None)
                ys = (out["L_t"], out["H_t"], out["mv_hat"],
                      pack_result(out))
                return out["dpb"], ys

            dpb, (l_ts, h_ts, mv_s, packed) = jax.lax.scan(
                body, dpb, (refs, curs, keys))
            for i, f in enumerate(rest):
                frames_coded[f] = l_ts[i]
                frames_coded[f + group_step] = h_ts[i]
                mvs[f + group_step] = mv_s[i]
                results[f + group_step] = jax.tree.map(
                    lambda v, i=i: v[i], packed)
        else:
            for f in rest:
                result = code_pair(params, frames_coded[f],
                                   frames_coded[f + group_step], dpb,
                                   code_lt, stage, next_key())
                dpb = result["dpb"]
                frames_coded[f] = result["L_t"]
                frames_coded[f + group_step] = result["H_t"]
                mvs[f + group_step] = result["mv_hat"]
                results[f + group_step] = pack_result(result)
        num_pairs //= 2

    # SYNTHESIS: inverse temporal lifting; pairs in a stage are
    # independent -> vmap them (one traced body per stage)
    def inv_pair(params, l_t, h_t, mv, stage_idx):
        return module.apply(params, l_t, h_t, mv, stage_idx,
                            method=type(module).inverse_mctf)

    if remat:
        inv_pair = jax.checkpoint(inv_pair, static_argnums=(4,))

    num_pairs = 1
    for stage_idx in reversed(range(num_stages)):
        group_step = 2 ** stage_idx
        fidxs = [g * 2 * group_step for g in range(num_pairs)]
        if len(fidxs) > 1 and use_scan:
            l_ts = jnp.stack([frames_coded[f] for f in fidxs])
            h_ts = jnp.stack([frames_coded[f + group_step] for f in fidxs])
            mv_s = jnp.stack([mvs[f + group_step] for f in fidxs])
            refs, curs = jax.vmap(
                lambda l, h, m: inv_pair(params, l, h, m,
                                         me_base + stage_idx)
            )(l_ts, h_ts, mv_s)
            for i, f in enumerate(fidxs):
                frames_coded[f] = refs[i]
                frames_coded[f + group_step] = curs[i]
        else:
            for f in fidxs:
                ref, cur = inv_pair(params, frames_coded[f],
                                    frames_coded[f + group_step],
                                    mvs[f + group_step],
                                    me_base + stage_idx)
                frames_coded[f] = ref
                frames_coded[f + group_step] = cur
        num_pairs *= 2

    # PER-FRAME RD LOSS (stage-gated)
    rd_loss = 0.0
    log = {"bpp_L": 0.0, "bpp_H": 0.0, "bpp_mv": 0.0, "mse": 0.0,
           "me_mse": 0.0}
    for fidx in range(num_frames):
        d_latent = jnp.mean((frames_coded[fidx] - frames[fidx]) ** 2)
        rb = results[fidx]
        if fidx == 0:
            rate_latent = rb["bpp_L"]
            rate_mv = 0.0
            d_me = 0.0
            log["bpp_L"] += rb["bpp_L"]
        else:
            rate_latent = rb["bpp_H"]
            rate_mv = rb["bpp_me"]
            d_me = rb["me_mse"]
            log["bpp_H"] += rb["bpp_H"] / (num_frames - 1)
            log["bpp_mv"] += rb["bpp_me"] / (num_frames - 1)
            log["me_mse"] += rb["me_mse"] / (num_frames - 1)
        log["mse"] += d_latent / num_frames
        rate = gates.r_latent * rate_latent + gates.r_mv * rate_mv
        dist = gates.d_rec * d_latent + gates.d_me * d_me
        rd_loss = rd_loss + lmbda * dist + rate

    log["rd_loss"] = rd_loss
    return rd_loss, log


def make_pmctf_train_step_split(module, tx, num_frames: int,
                                gates: StageGates, me_base: int = 0,
                                remat: bool = True,
                                return_grads: bool = False):
    """GOP training step split into per-temporal-stage jitted programs.

    Same math as make_pmctf_train_step (grad/step equivalence asserted in
    tests/test_training.py::test_pmctf_split_step_matches_fused), but no
    single XLA program ever contains more than one temporal stage's pair
    bodies: each analysis stage is its own forward program whose backward
    re-runs the stage under jax.vjp — stage-level rematerialization
    ACROSS jit boundaries — and synthesis + the per-frame RD loss run in
    one small value_and_grad program (the inverse-lifting bodies are tiny
    next to a pair coding). Gradients are exact end-to-end: the loss
    program returns cotangents w.r.t. the inter-stage state, which are
    chained backwards through the per-stage VJP programs, and per-program
    parameter gradients are accumulated on device before one optimizer
    apply.

    This bounds compiled-program size by the largest single stage instead
    of the whole GOP graph: the fused GOP-16 step's ~17 MB step MLIR
    SIGKILLed the remote compile helper (docs/curriculum_sustained.log)
    while GOP-8 compiled, so per-stage programs (< GOP-2 sized each) have
    ample margin — and the bound is independent of GOP size.

    RNG draws replicate the fused step exactly: pair j of analysis stage
    k folds the base rng with the same global pair index the fused step's
    sequential counter would assign.

    ref: train_pMCTF_L.py:161-251 (the fused schedule this reproduces).
    """
    num_stages = max(1, int(math.log2(num_frames)))
    assert 2 ** num_stages == num_frames, num_frames
    n = num_frames
    pair_counts = [n >> (k + 1) for k in range(num_stages)]
    key_bases = [sum(pair_counts[:k]) for k in range(num_stages)]

    res_keys = ("bpp_H", "bpp_me", "me_mse")

    def init_state(frames):
        """frames: (n, B, 1, H, W) -> inter-stage state pytree."""
        b, _, h, w = frames.shape[1:]
        return {
            "fc": frames,
            "mvs": jnp.zeros((n, b, 2, h, w), frames.dtype),
            "res": {**{k: jnp.zeros((n,)) for k in res_keys},
                    "bpp_L": jnp.zeros(()), "me_mse_inv": jnp.zeros(())},
        }

    def analysis_fn(k):
        group_step = 2 ** k
        code_lt = (k + 1) == num_stages
        stage = me_base + k
        fidxs = [g * 2 * group_step for g in range(pair_counts[k])]
        kb = key_bases[k]

        def fn(params, state, q_index, rng):
            def cp(params, ref, cur, dpb, key):
                rngs = {"noise": key} if rng is not None else {}
                return module.apply(params, ref, cur, q_index, code_lt,
                                    dpb, stage_idx=stage, rngs=rngs,
                                    training=True)

            cpr = jax.checkpoint(cp) if remat else cp

            def key_for(j):
                return jax.random.fold_in(rng, kb + j) \
                    if rng is not None else None

            fc, mvs = state["fc"], state["mvs"]
            res = dict(state["res"])

            # first pair: empty DPB (adaptor_0 branch)
            dpb = {"mv_feature": None, "ref_mv_y": None}
            out = cpr(params, fc[fidxs[0]], fc[fidxs[0] + group_step],
                      dpb, key_for(0))
            dpb = out["dpb"]
            fc = fc.at[fidxs[0]].set(out["L_t"])
            fc = fc.at[fidxs[0] + group_step].set(out["H_t"])
            mvs = mvs.at[fidxs[0] + group_step].set(out["mv_hat"])
            for rk in res_keys:
                res[rk] = res[rk].at[fidxs[0] + group_step].set(out[rk])
            if code_lt:
                res["bpp_L"] = out["bpp_L"]
                res["me_mse_inv"] = out["me_mse_inv"]

            rest = fidxs[1:]
            if rest:
                refs = jnp.stack([fc[f] for f in rest])
                curs = jnp.stack([fc[f + group_step] for f in rest])
                keys = jnp.stack([key_for(1 + i) for i in range(len(rest))]) \
                    if rng is not None \
                    else jnp.zeros((len(rest), 2), jnp.uint32)

                def body(dpb, xs):
                    ref, cur, key = xs
                    out = cpr(params, ref, cur, dpb,
                              key if rng is not None else None)
                    ys = (out["L_t"], out["H_t"], out["mv_hat"],
                          {rk: out[rk] for rk in res_keys})
                    return out["dpb"], ys

                _, (l_ts, h_ts, mv_s, packed) = jax.lax.scan(
                    body, dpb, (refs, curs, keys))
                ridx = jnp.asarray(rest)
                cidx = jnp.asarray([f + group_step for f in rest])
                fc = fc.at[ridx].set(l_ts).at[cidx].set(h_ts)
                mvs = mvs.at[cidx].set(mv_s)
                for rk in res_keys:
                    res[rk] = res[rk].at[cidx].set(packed[rk])
            return {"fc": fc, "mvs": mvs, "res": res}

        return fn

    def synth_loss_fn(params, state, frames, lmbda):
        fc, mvs, res = state["fc"], state["mvs"], state["res"]
        frames_coded = [fc[i] for i in range(n)]

        def inv_pair(params, l_t, h_t, mv, stage_idx):
            return module.apply(params, l_t, h_t, mv, stage_idx,
                                method=type(module).inverse_mctf)

        if remat:
            inv_pair = jax.checkpoint(inv_pair, static_argnums=(4,))

        num_pairs = 1
        for stage_idx in reversed(range(num_stages)):
            group_step = 2 ** stage_idx
            fidxs = [g * 2 * group_step for g in range(num_pairs)]
            if len(fidxs) > 1:
                l_ts = jnp.stack([frames_coded[f] for f in fidxs])
                h_ts = jnp.stack([frames_coded[f + group_step]
                                  for f in fidxs])
                mv_s = jnp.stack([mvs[f + group_step] for f in fidxs])
                refs, curs = jax.vmap(
                    lambda l, h, m: inv_pair(params, l, h, m,
                                             me_base + stage_idx)
                )(l_ts, h_ts, mv_s)
                for i, f in enumerate(fidxs):
                    frames_coded[f] = refs[i]
                    frames_coded[f + group_step] = curs[i]
            else:
                for f in fidxs:
                    ref, cur = inv_pair(params, frames_coded[f],
                                        frames_coded[f + group_step],
                                        mvs[f + group_step],
                                        me_base + stage_idx)
                    frames_coded[f] = ref
                    frames_coded[f + group_step] = cur
            num_pairs *= 2

        rd_loss = 0.0
        log = {"bpp_L": 0.0, "bpp_H": 0.0, "bpp_mv": 0.0, "mse": 0.0,
               "me_mse": 0.0}
        for fidx in range(n):
            d_latent = jnp.mean((frames_coded[fidx] - frames[fidx]) ** 2)
            if fidx == 0:
                rate_latent = res["bpp_L"]
                rate_mv = 0.0
                d_me = 0.0
                log["bpp_L"] += res["bpp_L"]
            else:
                rate_latent = res["bpp_H"][fidx]
                rate_mv = res["bpp_me"][fidx]
                d_me = res["me_mse"][fidx]
                log["bpp_H"] += res["bpp_H"][fidx] / (n - 1)
                log["bpp_mv"] += res["bpp_me"][fidx] / (n - 1)
                log["me_mse"] += res["me_mse"][fidx] / (n - 1)
            log["mse"] += d_latent / n
            rate = gates.r_latent * rate_latent + gates.r_mv * rate_mv
            dist = gates.d_rec * d_latent + gates.d_me * d_me
            rd_loss = rd_loss + lmbda * dist + rate
        log["rd_loss"] = rd_loss
        return rd_loss, log

    fwd_jits = [jax.jit(analysis_fn(k)) for k in range(num_stages)]

    def make_bwd(k):
        f = analysis_fn(k)

        def bwd(params, state, q_index, rng, cot):
            _, vjp = jax.vjp(lambda p, s: f(p, s, q_index, rng),
                             params, state)
            return vjp(cot)

        return bwd

    bwd_jits = [jax.jit(make_bwd(k)) for k in range(num_stages)]
    sl_vg = jax.jit(jax.value_and_grad(
        synth_loss_fn, argnums=(0, 1), has_aux=True))
    init_jit = jax.jit(init_state)
    add_jit = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))

    def opt_apply(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    opt_jit = jax.jit(opt_apply)

    def step(params, opt_state, frames, q_index, lmbda, rng=None):
        states = [init_jit(frames)]
        for k in range(num_stages):
            states.append(fwd_jits[k](params, states[k], q_index, rng))
        ((_, log), (dparams, dstate)) = sl_vg(params, states[-1],
                                              frames, lmbda)
        for k in reversed(range(num_stages)):
            dp_k, dstate = bwd_jits[k](params, states[k], q_index, rng,
                                       dstate)
            dparams = add_jit(dparams, dp_k)
        params, opt_state = opt_jit(params, opt_state, dparams)
        if return_grads:  # test hook (split vs fused grad equivalence)
            return params, opt_state, log, dparams
        return params, opt_state, log

    return step


def make_pmctf_train_step(module, tx, num_frames: int,
                          gates: StageGates, me_base: int = 0,
                          remat: bool = True):
    """Jitted end-to-end GOP training step. ref: train_pMCTF_L.py:136-251."""

    def loss_fn(params, frames, q_index, lmbda, rng):
        frame_list = [frames[i] for i in range(num_frames)]
        return pmctf_gop_loss(module, params, frame_list, q_index, lmbda,
                              gates, me_base, rng, remat)

    @jax.jit
    def step(params, opt_state, frames, q_index, lmbda, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, frames, q_index, lmbda, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
