"""Where do compress_luma's warm 10.7 s go? (VERDICT r4 item 3)

The packed encode design has exactly ONE host readback, yet a warm
1080p luma compress costs ~10.7 s (docs/stream_profile_r4.log). The
replay runs ~130 small jitted programs in sequence; this lab measures

  A. the per-DISPATCH cost of the axon tunnel — N chained tiny programs
     enqueued back-to-back with a single scalar readback at the end
     (same executable repeated, and distinct executables), plus the same
     with a mid-size conv to separate fixed overhead from compute;
  B. a dispatch census of one warm PWaveCodec.compress at 1080p —
     per-phase wall (enqueue loop / bulk fetch / host rANS) with
     jit-call counts, so phase times can be attributed to
     count x per-dispatch cost vs device compute vs host entropy work.

Run: python benchmarks/dispatch_lab.py   (one TPU job at a time)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x))


def probe_dispatch_cost():
    import jax
    import jax.numpy as jnp

    x0 = jnp.ones((64, 64), jnp.float32)

    @jax.jit
    def tiny(x):
        return x * 1.000001 + 0.000001

    # distinct executables (like the replay's many distinct keys)
    distinct = [jax.jit(lambda x, i=i: x * (1.0 + 1e-6 * i)) for i in range(16)]

    big = jnp.ones((1, 1, 1152, 1920), jnp.float32)
    k = jnp.ones((3, 3, 1, 16), jnp.float32) * 0.01

    @jax.jit
    def conv(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))

    # warm everything
    sync(tiny(x0))
    for f in distinct:
        sync(f(x0))
    sync(conv(big))

    for label, fn_chain, n in (
            ("tiny same-exe", lambda x: tiny(x), 64),
            ("tiny distinct-exe", None, 64),
            ("1080p conv16", lambda x: None, 16)):
        t0 = time.perf_counter()
        if label == "tiny same-exe":
            x = x0
            for _ in range(n):
                x = tiny(x)
            sync(x)
        elif label == "tiny distinct-exe":
            x = x0
            for i in range(n):
                x = distinct[i % 16](x)
            sync(x)
        else:
            y = big
            for _ in range(n):
                y = conv(y)[:, :1]
            sync(y)
        dt = time.perf_counter() - t0
        print(f"[dispatch] {label}: {n} chained dispatches + 1 sync "
              f"= {dt*1000:.0f} ms ({dt/n*1000:.1f} ms/dispatch)", flush=True)


def census_compress():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF, PWave
    from learned_pmctf_tpu.codec.image_codec import PWaveCodec
    from learned_pmctf_tpu.entropy.coder import EntropyCoder
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep",
                   warp_mode="fast")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, small, small, 10, dpb0,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0)})

    pw = PWave(bitdepth=module.bitdepth, decomp_levels=module.decomp_levels,
               lossy=module.lossy, ll_mode=module.ll_mode,
               features=module.features, ar_features=module.ar_features)
    codec = PWaveCodec(pw, {"params": params["params"]["hp_coder"]})

    # ---- instrumentation: count + time every jitted call ----------------
    stats = {"n": 0, "wall": 0.0, "by_key": {}}
    orig_jit = codec._jit

    def counting_jit(key, fn, **kw):
        jfn = orig_jit(key, fn, **kw)

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = jfn(*a, **k)
            dt = time.perf_counter() - t0
            stats["n"] += 1
            stats["wall"] += dt
            kk = key if isinstance(key, str) else key[0]
            agg = stats["by_key"].setdefault(kk, [0, 0.0])
            agg[0] += 1
            agg[1] += dt
            return out

        return wrapped

    codec._jit = counting_jit

    rans = {"wall": 0.0, "symbols": 0}
    orig_enc = EntropyCoder.encode_with_indexes
    orig_flush = EntropyCoder.flush

    def timed_enc(self, syms, idx, *a, **k):
        t0 = time.perf_counter()
        out = orig_enc(self, syms, idx, *a, **k)
        rans["wall"] += time.perf_counter() - t0
        rans["symbols"] += int(np.asarray(syms).size)
        return out

    def timed_flush(self):
        t0 = time.perf_counter()
        out = orig_flush(self)
        rans["wall"] += time.perf_counter() - t0
        return out

    EntropyCoder.encode_with_indexes = timed_enc
    EntropyCoder.flush = timed_flush

    import learned_pmctf_tpu.codec.image_codec as ic
    fetch = {"wall": 0.0, "n_arrays": 0, "bytes": 0}
    orig_fetch = ic.bulk_fetch_int32

    def timed_fetch(jit, arrays):
        t0 = time.perf_counter()
        out = orig_fetch(jit, arrays)
        fetch["wall"] += time.perf_counter() - t0
        fetch["n_arrays"] += len(arrays)
        fetch["bytes"] += sum(int(np.prod(a.shape)) * 4 for a in arrays)
        return out

    ic.bulk_fetch_int32 = timed_fetch

    # H_t-like content at 1080p padded geometry
    h, w = 1152, 1920
    base = g.normal(0, 30, (1, 1, h // 8, w // 8))
    x = jnp.asarray(np.kron(base, np.ones((1, 1, 8, 8)))
                    + g.normal(0, 3, (1, 1, h, w)), jnp.float32)

    for run in range(3):
        for d in (stats, rans, fetch):
            for kk in d:
                if kk == "by_key":
                    d[kk] = {}
                else:
                    d[kk] = 0 if isinstance(d[kk], int) else 0.0
        t0 = time.perf_counter()
        x_hat, stream = codec.compress(x, q_index=10)
        sync(x_hat)  # close the async tail
        total = time.perf_counter() - t0
        other = total - stats["wall"] - rans["wall"]
        # note: fetch wall is INSIDE stats (bulk_pack is a counted jit
        # call) only for the pack program; the np.asarray readback is not
        print(f"[compress run{run}] total={total:.2f}s "
              f"dispatch_loop={stats['wall']:.2f}s (n={stats['n']}) "
              f"fetch={fetch['wall']:.2f}s ({fetch['n_arrays']} arrays, "
              f"{fetch['bytes']/1e6:.1f} MB) "
              f"rans={rans['wall']:.2f}s ({rans['symbols']} syms) "
              f"stream={len(stream)/1e3:.0f} kB other={other:.2f}s",
              flush=True)
        if run == 2:
            top = sorted(stats["by_key"].items(), key=lambda kv: -kv[1][1])
            for kk, (cnt, wall) in top[:12]:
                print(f"    {kk:20s} n={cnt:3d} wall={wall*1000:7.0f} ms "
                      f"({wall/cnt*1000:6.1f} ms/call)", flush=True)


def main():
    import jax
    print(f"devices: {jax.devices()}", flush=True)
    probe_dispatch_cost()
    census_compress()


if __name__ == "__main__":
    main()
