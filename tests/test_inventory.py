"""SURVEY.md §2 component inventory: every reference component must have
an importable first-class equivalent."""

import importlib

import pytest


INVENTORY = {
    # L0: native entropy backend
    "learned_pmctf_tpu.native": [
        "RansEncoder", "RansDecoder", "pmf_to_quantized_cdf", "build_native"],
    # L1: entropy models
    "learned_pmctf_tpu.entropy": [
        "EntropyCoder", "GaussianEncoder", "FactorizedCoder", "BitEstimator",
        "laplace_bits", "gaussian_bits", "build_bit_estimator_tables",
        "build_indexes_from_scales"],
    # L2: layers
    "learned_pmctf_tpu.models.layers": [
        "Conv2d", "MaskedConv2d", "PredictUpdate", "ResBlock", "DepthConv",
        "ConvFFN", "ConvFFN3", "DepthConvBlock", "DepthConvBlock4",
        "ResidualBlockWithStride", "ResidualBlockUpsample", "SubpelConv",
        "pixel_shuffle"],
    "learned_pmctf_tpu.models.layers_extra": [
        "DynamicDWConv", "MaskedDynamicDWConv", "ConditionalConv", "Conv3d"],
    "learned_pmctf_tpu.models.wavelet": [
        "LearnedLifting1D", "LiftingScheme2D", "TemporalLifting"],
    "learned_pmctf_tpu.ops.lifting": [
        "haar_forward", "haar_backward", "cdf97_forward", "cdf97_backward",
        "CDF97_COEFFS"],
    "learned_pmctf_tpu.models.context": [
        "LSTM2D", "UpsampleModule", "SubbandContext", "ContextFusionSubband",
        "ContextFusionFourStep", "MaskResidual"],
    "learned_pmctf_tpu.models.postprocess": ["PostProcess", "PostProcessCtx"],
    "learned_pmctf_tpu.models.spynet": ["MEBasic", "MESpynet"],
    "learned_pmctf_tpu.models.mv_coder": [
        "MvEnc", "MvDec", "HyperEncoder", "HyperDecoder",
        "four_part_prior_forward", "separate_prior_enc_dec"],
    "learned_pmctf_tpu.ops.warp": ["flow_warp"],
    "learned_pmctf_tpu.ops.resample": [
        "bilinear_upsample", "bilinear_downsample", "avg_pool2"],
    # L3: codec models
    "learned_pmctf_tpu.models.pwave": ["PWave", "interp_q_scale"],
    "learned_pmctf_tpu.models.pmctf": ["PMCTF"],
    "learned_pmctf_tpu.codec": ["PWaveCodec", "PMCTFCodec"],
    # L4: data & IO
    "learned_pmctf_tpu.data": ["VideoFolder", "VideoYCbCr", "DataLoader"],
    "learned_pmctf_tpu.utils.yuv": ["YUVReader", "YUVWriter"],
    "learned_pmctf_tpu.utils.stream": [
        "encode_image", "decode_image", "encode_p", "decode_p", "encode_i",
        "decode_i", "get_padding_size", "get_downsampled_shape",
        "get_rounded_q"],
    "learned_pmctf_tpu.ops.color": [
        "rgb_to_ycbcr", "ycbcr_to_rgb", "yuv420_to_444", "yuv444_to_420",
        "rgb_to_ycbcr_studio", "ycbcr_to_rgb_studio",
        "rgb_to_ycocg_lossless", "ycocg_to_rgb_lossless"],
    "learned_pmctf_tpu.utils.metrics": ["psnr", "yuv_psnr", "ms_ssim"],
    "learned_pmctf_tpu.utils.eval_json": [
        "generate_log_json", "dump_json", "interpolate_log", "str2bool",
        "create_folder"],
    "learned_pmctf_tpu.utils.logger": [
        "get_root_logger", "get_env_info", "dict2str"],
    "learned_pmctf_tpu.utils.visualizer": ["Visualizer", "pwave_visuals"],
    "learned_pmctf_tpu.utils.checkpoint": [
        "save_checkpoint", "load_checkpoint", "load_torch_state_dict"],
    "learned_pmctf_tpu.utils.profiling": ["SpanTimer", "device_trace"],
    # L5: training
    "learned_pmctf_tpu.training.optim": [
        "make_optimizer", "trainable_mask", "decay_mask"],
    "learned_pmctf_tpu.training.steps": [
        "StageGates", "make_pwave_train_step", "make_pmctf_train_step",
        "make_pmctf_train_step_split", "pmctf_gop_loss"],
    "learned_pmctf_tpu.training.curriculum": [
        "CurriculumConfig", "clone_me_stage", "load_from_iframe",
        "PART_PREDICATES"],
    "learned_pmctf_tpu.utils.schedules": [
        "cosine_scheduler", "get_cur_lambda"],
    # new parallel surface
    "learned_pmctf_tpu.parallel": [
        "make_mesh", "data_sharding", "frame_sharding", "replicated"],
}


@pytest.mark.parametrize("module_name", sorted(INVENTORY))
def test_component_importable(module_name):
    mod = importlib.import_module(module_name)
    missing = [s for s in INVENTORY[module_name] if not hasattr(mod, s)]
    assert not missing, f"{module_name} missing {missing}"


def test_cli_entry_points_exist():
    import pathlib
    root = pathlib.Path(__file__).resolve().parent.parent
    for script in ("train_pwave.py", "train_pmctf.py", "test_pmctf_flex.py",
                   "test_pmctf_ca.py", "bench.py", "__graft_entry__.py"):
        assert (root / script).exists(), script
    for script in ("download.py", "extract_clips.py", "average_flow.py",
                   "gist_shot_exclusion.py", "delete_excluded_shots.py",
                   "gist.py"):
        assert (root / "create_dataset" / script).exists(), script
