"""Preprocessing channel math vs closed-form NumPy (the reference's
transforms re-derived independently; reference support/datasets.py:301-582)."""

import numpy as np
import jax.numpy as jnp
import pytest

from wcmc_tpu.data import preprocess, schema, synthetic


def test_raw_layout_is_104_channels(small_raw):
    raw, gt = small_raw
    assert raw.shape[-1] == schema.RAW_CHANNELS
    assert gt.shape[-1] == schema.GT_CHANNELS


def test_llpm_channels(small_raw):
    raw, _ = small_raw
    out = np.asarray(preprocess.preprocess_llpm(jnp.asarray(raw)))
    assert out.shape == raw.shape[:3] + (schema.LLPM_CHANNELS,)
    # column 0: log path weight / 90
    expect = np.log(raw[..., 73:74] + 1e-6) / 90.0
    np.testing.assert_allclose(out[..., :1], expect, rtol=1e-5, atol=1e-6)
    # roughness columns: sqrt
    np.testing.assert_allclose(
        out[..., 31:37], np.sqrt(raw[..., 98:104]), rtol=1e-5, atol=1e-6
    )
    # bounce types / 19
    np.testing.assert_allclose(
        out[..., 25:31], raw[..., 60:66] / 19.0, rtol=1e-5, atol=1e-6
    )


def test_sbmc_channels(small_raw):
    raw, _ = small_raw
    s, p = preprocess.preprocess_sbmc(jnp.asarray(raw))
    s, p = np.asarray(s), np.asarray(p)
    assert s.shape[-1] == schema.SBMC_S_CHANNELS
    assert p.shape[-1] == schema.SBMC_P_CHANNELS

    total = np.maximum(raw[..., 2:5], 0)
    np.testing.assert_allclose(s[..., 0:3], total, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        s[..., 3:6], np.log1p(total) / 10.0, rtol=1e-5, atol=1e-6
    )
    diffuse = np.maximum(raw[..., 5:8], 0)
    spec = np.log1p(np.maximum(total - diffuse, 0)) / 10.0
    np.testing.assert_allclose(s[..., 6:9], spec, rtol=1e-5, atol=1e-6)

    # one-hot bounce bits
    bt = raw[..., 60:66].astype(np.int32)
    np.testing.assert_array_equal(
        p[..., 48:54], (np.bitwise_and(bt, 4) != 0).astype(np.float32)
    )


def test_kpcn_channels_and_factorization(small_raw):
    raw, _ = small_raw
    out = np.asarray(preprocess.preprocess_kpcn(jnp.asarray(raw)))
    assert out.shape == raw.shape[:2] + (schema.KPCN_CHANNELS,)

    spp = raw.shape[2]
    eps = schema.ALBEDO_EPS
    albedo = raw[..., 66:69].mean(2)
    diffuse = np.maximum(raw[..., 5:8], 0).mean(2)
    np.testing.assert_allclose(
        out[..., 0:3], diffuse / (albedo + eps), rtol=1e-4, atol=1e-5
    )
    # depth is normalized to [0, 1]
    assert out[..., 30].min() >= 0 and out[..., 30].max() <= 1.0
    # gradient channels: dx of diffuse at col 0 must be 0 (zero pad)
    assert np.abs(out[:, 0, 4:7]).max() == 0.0


def test_gradients_zero_padding():
    x = jnp.arange(12.0).reshape(3, 4, 1)
    g = np.asarray(preprocess._spatial_gradients(x))
    assert g.shape == (3, 4, 2)
    np.testing.assert_allclose(g[:, 1:, 0], 1.0)   # dx
    np.testing.assert_allclose(g[:, 0, 0], 0.0)
    np.testing.assert_allclose(g[1:, :, 1], 4.0)   # dy
    np.testing.assert_allclose(g[0, :, 1], 0.0)


def test_sanitize_zeroes_nonfinite():
    # corrupt (non-finite) samples are zeroed, not sentinel-capped —
    # see the deviation note on preprocess.sanitize
    # 3e38 is representable in f32 (max 3.4e38) and above the cap;
    # anything that overflows to inf at construction is "corrupt" -> 0
    x = jnp.asarray([np.nan, np.inf, -np.inf, 1.0, 3e38, -3e38])
    out = np.asarray(preprocess.sanitize(x))
    assert np.isfinite(out).all()
    assert (out[[0, 1, 2]] == 0.0).all()
    assert out[3] == 1.0
    assert out[4] == preprocess.FINITE_CAP
    assert out[5] == -preprocess.FINITE_CAP


def test_kpcn_net_inputs_split(small_raw):
    raw, gt = small_raw
    buf = preprocess.preprocess_kpcn(jnp.asarray(raw))
    d = preprocess.kpcn_net_inputs(buf)
    assert d["kpcn_diffuse_in"].shape[-1] == 34
    assert d["kpcn_specular_in"].shape[-1] == 34
    assert d["kpcn_albedo"].shape[-1] == 3
    t = preprocess.kpcn_targets(jnp.asarray(gt))
    assert t["target_diffuse"].shape[-1] == 3
    # recombination of the *targets* reproduces total radiance
    rec = preprocess.kpcn_recombine(
        t["target_diffuse"], t["target_specular"],
        jnp.asarray(gt[..., 6:9]) + schema.ALBEDO_EPS,
    )
    total = gt[..., 0:3]
    np.testing.assert_allclose(np.asarray(rec), total, rtol=2e-3, atol=2e-3)


def test_channel_config_sizes():
    cfg = schema.ChannelConfig("kpcn", use_llpm_buf=False)
    assert cfg.dncnn_in_size == 34
    cfg = schema.ChannelConfig("kpcn", use_llpm_buf=True, pnet_out_size=3)
    assert cfg.dncnn_in_size == 34 + 3 + 2
    assert cfg.pnet_in_size == 36
    cfg = schema.ChannelConfig(
        "kpcn", use_llpm_buf=True, pnet_out_size=6, disentangle="m10r01"
    )
    assert cfg.dncnn_in_size == 34 + 3 + 2
    cfg = schema.ChannelConfig("sbmc", use_llpm_buf=False)
    assert cfg.dncnn_in_size == 3 + 21 + 66
    cfg = schema.ChannelConfig("sbmc", use_sbmc_buf=False, use_llpm_buf=True)
    assert cfg.dncnn_in_size == 3 + 21 + 3 + 2
    cfg = schema.ChannelConfig("lbmc")
    assert cfg.dncnn_in_size == 24
