"""Tests for utils: stream containers, metrics, eval JSON, schedules, YUV IO."""

import json
import numpy as np
import jax.numpy as jnp

from learned_pmctf_tpu.utils.stream import (
    get_padding_size, get_downsampled_shape, get_rounded_q,
    encode_image, decode_image, encode_p, decode_p, encode_i, decode_i)
from learned_pmctf_tpu.utils.metrics import psnr, yuv_psnr, ms_ssim
from learned_pmctf_tpu.utils.schedules import cosine_scheduler, get_cur_lambda
from learned_pmctf_tpu.utils.yuv import YUVReader, YUVWriter
from learned_pmctf_tpu.utils.eval_json import (
    generate_log_json, dump_json, interpolate_log)


def test_padding_size():
    pl, pr, pt, pb = get_padding_size(1080, 1920, p=128)
    assert (pl, pt) == (0, 0)
    assert (1080 + pb) % 128 == 0 and (1920 + pr) % 128 == 0
    assert get_downsampled_shape(1080, 1920, 64) == (17, 30)


def test_rounded_q():
    q, qi = get_rounded_q(0.1234)
    assert abs(q - 0.12) < 1e-9 and qi == 12


def test_image_container_roundtrip(tmp_path):
    f = str(tmp_path / "x.bin")
    payload = bytes(range(256)) * 3
    encode_image(720, 1280, 3, payload, f)
    h, w, c, stream = decode_image(f)
    assert (h, w, c) == (720, 1280, 3)
    assert stream == payload


def test_p_and_i_containers(tmp_path):
    f = str(tmp_path / "p.bin")
    encode_p(b"motion", 42, f)
    qi, s = decode_p(f)
    assert qi == 42 and s == b"motion"
    f = str(tmp_path / "i.bin")
    encode_i(480, 640, 7, b"intra", f)
    assert decode_i(f) == (480, 640, 7, b"intra")


def test_psnr_and_yuv_weighting():
    a = jnp.zeros((1, 1, 8, 8))
    b = jnp.full((1, 1, 8, 8), 16.0)
    assert abs(float(psnr(a, b)) - (20 * np.log10(255 / 16))) < 1e-3
    assert yuv_psnr(40.0, 30.0, 30.0) == (6 * 40 + 30 + 30) / 8


def test_ms_ssim_identity_and_degradation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, 3, 192, 192)), jnp.float32)
    assert float(ms_ssim(x, x)) > 0.999
    noisy = x + jnp.asarray(rng.normal(0, 20, x.shape), jnp.float32)
    v = float(ms_ssim(x, noisy))
    assert 0.0 < v < 0.99


def test_cosine_scheduler_shape_and_endpoints():
    s = cosine_scheduler(1e-4, 1e-6, epochs=10, niter_per_ep=100,
                         warmup_epochs=1)
    assert len(s) == 1000
    assert s[0] == 0.0 and abs(s[100] - 1e-4) < 2e-6
    assert s[-1] <= 1.2e-6


def test_lambda_interpolation_matches_reference_rule():
    # q=0 -> min*0.003; q=20 -> max*0.003 (image list [1, 35])
    assert abs(get_cur_lambda([1, 35], 0, 21) - 0.003) < 1e-9
    assert abs(get_cur_lambda([1, 35], 20, 21) - 35 * 0.003) < 1e-9


def test_yuv_reader_writer_roundtrip(tmp_path):
    f = str(tmp_path / "v.yuv")
    rng = np.random.default_rng(1)
    frames = [(rng.integers(0, 256, (16, 32)).astype(np.uint8),
               rng.integers(0, 256, (8, 16)).astype(np.uint8),
               rng.integers(0, 256, (8, 16)).astype(np.uint8))
              for _ in range(3)]
    w = YUVWriter(f)
    for y, cb, cr in frames:
        w.write_one_frame(y, cb, cr)
    r = YUVReader(f, 32, 16, start_index=1)
    y, cb, cr = r.read_one_frame()
    np.testing.assert_array_equal(y, frames[1][0])
    np.testing.assert_array_equal(cr, frames[1][2])


def test_generate_log_json(tmp_path):
    log = generate_log_json(
        frame_num=4, frame_types=[0, 1, 1, 1], bits=[1000, 100, 120, 90],
        bpp_mv=[0, 0.01, 0.02, 0.01], psnrs=[40, 36, 35, 36],
        rgb_psnrs=[38, 34, 33, 34], ssims=[0.99, 0.97, 0.96, 0.97],
        frame_pixel_num=10000, test_time=1.5)
    assert log["i_frame_num"] == 1 and log["p_frame_num"] == 3
    assert abs(log["ave_p_frame_bpp"] - (310 / 30000)) < 1e-9
    assert abs(log["ave_all_frame_psnr"] - np.mean([40, 36, 35, 36])) < 1e-9
    f = tmp_path / "log.json"
    with open(f, "w") as fp:
        dump_json(log, fp, float_digits=4)
    json.load(open(f))  # valid json


def test_interpolate_log():
    v = interpolate_log(1.0, 16.0, 5, descending=False)
    np.testing.assert_allclose(v, [1, 2, 4, 8, 16], rtol=1e-6)


class TestBDRate:
    """Bjøntegaard delta (utils/bdrate.py) — the BASELINE.md parity metric."""

    def _curve(self, scale=1.0, boost=0.0):
        rates = np.array([0.05, 0.1, 0.2, 0.4, 0.8]) * scale
        psnrs = np.array([32.0, 34.5, 36.8, 38.9, 40.7]) + boost
        return list(zip(rates, psnrs))

    def test_identical_curves_are_zero(self):
        from learned_pmctf_tpu.utils.bdrate import bd_rate, bd_psnr
        c = self._curve()
        assert abs(bd_rate(c, c)) < 1e-9
        assert abs(bd_psnr(c, c)) < 1e-12

    def test_pure_rate_scale(self):
        """test = anchor with 10% more rate at every quality -> +10%."""
        from learned_pmctf_tpu.utils.bdrate import bd_rate
        a = self._curve()
        t = self._curve(scale=1.10)
        assert abs(bd_rate(a, t) - 10.0) < 1e-6
        assert abs(bd_rate(t, a) - (1 / 1.10 - 1) * 100) < 1e-6

    def test_quality_boost_gives_negative_bdrate_and_positive_bdpsnr(self):
        from learned_pmctf_tpu.utils.bdrate import bd_rate, bd_psnr
        a = self._curve()
        t = self._curve(boost=0.5)
        assert bd_rate(a, t) < -5.0
        assert 0.4 < bd_psnr(a, t) < 0.6

    def test_unit_invariance(self):
        """bpp vs kbps scaling of BOTH curves cancels."""
        from learned_pmctf_tpu.utils.bdrate import bd_rate
        a, t = self._curve(), self._curve(scale=1.2, boost=0.3)
        a_k = [(r * 5e4, q) for r, q in a]
        t_k = [(r * 5e4, q) for r, q in t]
        assert abs(bd_rate(a, t) - bd_rate(a_k, t_k)) < 1e-9

    def test_from_logs(self):
        from learned_pmctf_tpu.utils.bdrate import bd_rate_from_logs
        mk = lambda pts: {i: {"ave_all_frame_bpp": r, "ave_all_frame_psnr": q}
                          for i, (r, q) in enumerate(pts)}
        got = bd_rate_from_logs(mk(self._curve()), mk(self._curve(1.10)))
        assert abs(got - 10.0) < 1e-6
