"""Time the reference-parity AR LL mode at 1080p (VERDICT r2 item 7).

The 'ar' ll_mode is what any BD-rate comparison against the reference
checkpoint will run. Encode replays the decoder's executables with
teacher-forced symbols (bit-exact by construction, one bulk readback);
decode walks ~2H+W anti-diagonal wavefronts (72x120 LL at padded 1080p ->
262 fronts), each costing one device dispatch + one host readback + one
rANS call. Through the axon tunnel a readback is ~38-70 ms, so the AR LL
decode is tunnel-dominated; on local TPU hardware the same loop costs
sub-ms per front.

Reports: full-frame 'ar'-mode compress and decompress wall time at padded
1080p (1152x1920, decomp 4, production widths), plus the LL-only share.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PWave
    from learned_pmctf_tpu.codec import PWaveCodec
    from learned_pmctf_tpu.codec.image_codec import ar_wavefronts
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    m = PWave(decomp_levels=4, features=112, ar_features=128, ll_mode="ar")
    g = np.random.default_rng(0)
    h, w = 1152, 1920
    x = jnp.asarray(g.integers(0, 256, (1, 1, h, w)), jnp.float32)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, 10))()
    qp = jnp.array([0.02, 0.5]).reshape(2, 1, 1, 1)
    params["params"]["QP"] = qp
    params["params"]["QP_ll"] = qp
    codec = PWaveCodec(m, params)

    ll_h, ll_w = h // 16, w // 16
    fronts = len(ar_wavefronts(ll_h, ll_w))
    print(f"LL {ll_h}x{ll_w}: {fronts} wavefronts "
          f"(reference per-pixel: {ll_h * ll_w} round trips)")

    f = "/tmp/ar_1080p.bin"
    t0 = time.time()
    x_hat_enc, stream = codec.compress(x, q_index=10, file_name=f,
                                       sideinfo=(1, 1, h, w))
    t_enc = time.time() - t0
    print(f"ar-mode 1080p compress:   {t_enc:7.2f} s "
          f"({len(stream)} bytes)", flush=True)

    t0 = time.time()
    out = codec.decompress(file_name=f, padding=128, q_index=10)
    t_dec = time.time() - t0
    err = float(jnp.max(jnp.abs(out["x_hat"] - x_hat_enc)))
    print(f"ar-mode 1080p decompress: {t_dec:7.2f} s (max |err| {err:.2e})")

    # second decode: jit caches warm -> the steady-state number
    t0 = time.time()
    codec.decompress(file_name=f, padding=128, q_index=10)
    t_dec2 = time.time() - t0
    print(f"ar-mode 1080p decompress (warm): {t_dec2:7.2f} s")

    # LL-only share of the warm decode
    t0 = time.time()
    codec.coder.set_stream(stream)
    codec._decode_ar_ll((1, 1, ll_h, ll_w))
    t_ll = time.time() - t0
    print(f"  of which AR LL wavefront loop: {t_ll:7.2f} s "
          f"({t_ll / fronts * 1000:.1f} ms/front)")


if __name__ == "__main__":
    main()
