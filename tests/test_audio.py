"""Audio stack tests: VAE shapes/causality, vocoder vs torch oracle, mel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
    AudioVAEConfig,
    audio_decoder_apply,
    audio_encoder_apply,
    causal_conv2d,
    init_audio_decoder,
    init_audio_encoder,
    init_conv2d,
    patchify_audio,
    unpatchify_audio,
)
from mlx_video_tpu.models.ltx.audio_vae.processing import AudioProcessor
from mlx_video_tpu.models.ltx.audio_vae.vocoder import (
    VocoderConfig,
    _conv_transpose1d,
    init_vocoder,
    vocoder_apply,
)


def tiny_audio_config():
    return AudioVAEConfig(
        ch=16, ch_mult=(1, 2, 4), num_res_blocks=1, in_channels=2, out_ch=2,
        z_channels=4, mel_bins=16, resolution=64,
        decoder_attn_resolutions=(), mid_block_add_attention=True,
    )


class TestAudioPatchify:
    def test_round_trip(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 6, 16, 8)).astype(np.float32))  # (B,T,M,C)
        p = patchify_audio(x)
        assert p.shape == (1, 6, 128)
        np.testing.assert_allclose(np.asarray(unpatchify_audio(p, 8, 16)), np.asarray(x))

    def test_channel_major_packing(self):
        """'b c t f -> b t (c f)': channel varies slower than mel bin."""
        x = np.zeros((1, 1, 2, 3), dtype=np.float32)  # (B,T,M=2,C=3)
        for m in range(2):
            for c in range(3):
                x[0, 0, m, c] = 10 * c + m
        p = np.asarray(patchify_audio(jnp.asarray(x)))[0, 0]
        np.testing.assert_array_equal(p, [0, 1, 10, 11, 20, 21])


class TestCausalConv2d:
    def test_time_causality(self, rng):
        params = init_conv2d(jax.random.key(0), 2, 3, 3)
        x = jnp.asarray(rng.normal(size=(1, 8, 4, 2)).astype(np.float32))
        y1 = causal_conv2d(params, x, 3, 1, causal=True)
        y2 = causal_conv2d(params, x.at[:, 5:].set(0.0), 3, 1, causal=True)
        np.testing.assert_allclose(np.asarray(y1[:, :5]), np.asarray(y2[:, :5]), atol=1e-5)

    def test_shape_preserved(self, rng):
        params = init_conv2d(jax.random.key(0), 2, 5, 3)
        x = jnp.asarray(rng.normal(size=(1, 8, 4, 2)).astype(np.float32))
        assert causal_conv2d(params, x, 3, 1, True).shape == (1, 8, 4, 5)


class TestAudioVAE:
    def test_default_config_has_no_attention(self):
        """The default AudioVAEConfig must be the LTX-2 geometry as the
        reference CONSTRUCTS it (generate.py:1705-1724: no mid-block or
        up-path attention). With attention defaulted on, init created an
        attn block the checkpoint has no weights for and a RANDOM attention
        ran mid-network on every audio decode."""
        from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
            AudioVAEConfig,
            init_audio_decoder,
            init_audio_encoder,
        )

        cfg = AudioVAEConfig()
        assert cfg.mid_block_add_attention is False
        assert cfg.decoder_attn_resolutions == ()
        dec = init_audio_decoder(jax.random.key(0), cfg)
        enc = init_audio_encoder(jax.random.key(0), cfg)
        assert "attn_1" not in dec["mid"] and "attn_1" not in enc["mid"]
        assert all(not stage["attn"] for stage in dec["up"].values())

    def test_encoder_shapes(self, rng):
        cfg = tiny_audio_config()
        params = init_audio_encoder(jax.random.key(0), cfg)
        # time 17 (1+4k causal), mel 16
        spec = jnp.asarray(rng.normal(size=(1, 2, 17, 16)).astype(np.float32))
        lat = audio_encoder_apply(params, cfg, spec)
        # 2 downsamples: time ceil-causal, mel 16 -> 4
        assert lat.shape[0:2] == (1, cfg.z_channels)
        assert lat.shape[3] == 4
        assert np.all(np.isfinite(np.asarray(lat)))

    def test_decoder_shapes(self, rng):
        cfg = tiny_audio_config()
        params = init_audio_decoder(jax.random.key(1), cfg)
        lat = jnp.asarray(rng.normal(size=(1, cfg.z_channels, 5, 4)).astype(np.float32))
        spec = audio_decoder_apply(params, cfg, lat)
        # target time = 5*4 - 3 (causal), mel = config.mel_bins
        assert spec.shape == (1, 2, 17, 16)
        assert np.all(np.isfinite(np.asarray(spec)))

    def test_round_trip_geometry(self, rng):
        cfg = tiny_audio_config()
        enc = init_audio_encoder(jax.random.key(0), cfg)
        dec = init_audio_decoder(jax.random.key(1), cfg)
        spec = jnp.asarray(rng.normal(size=(1, 2, 17, 16)).astype(np.float32))
        lat = audio_encoder_apply(enc, cfg, spec)
        out = audio_decoder_apply(dec, cfg, lat)
        assert out.shape == spec.shape


class TestVocoder:
    def test_conv_transpose_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        cin, cout, k, stride = 4, 3, 8, 4
        pad = (k - stride) // 2
        w = rng.normal(size=(cin, cout, k)).astype(np.float32)
        b = rng.normal(size=(cout,)).astype(np.float32)
        x = rng.normal(size=(2, cin, 20)).astype(np.float32)

        conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride, padding=pad)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w))
            conv.bias.copy_(torch.from_numpy(b))
            ref = conv(torch.from_numpy(x)).numpy()

        params = {"weight": jnp.asarray(np.transpose(w, (2, 0, 1))), "bias": jnp.asarray(b)}
        out = _conv_transpose1d(params, jnp.asarray(np.transpose(x, (0, 2, 1))), stride, pad)
        out = np.transpose(np.asarray(out), (0, 2, 1))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_vocoder_output_length(self, rng):
        cfg = VocoderConfig(
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_initial_channel=32, stereo=True,
        )
        params = init_vocoder(jax.random.key(0), cfg)
        t, mel = 10, 64
        spec = jnp.asarray(rng.normal(size=(1, 2, t, mel)).astype(np.float32))
        wav = vocoder_apply(params, cfg, spec)
        assert wav.shape == (1, 2, t * cfg.upsample_factor)
        out = np.asarray(wav)
        assert np.all(np.isfinite(out)) and np.all(np.abs(out) <= 1.0)

    def test_default_config_factor(self):
        assert VocoderConfig().upsample_factor == 240  # 6*5*2*2*2


class TestAudioProcessor:
    def test_mel_shapes(self, rng):
        proc = AudioProcessor(sample_rate=16000, mel_bins=64, mel_hop_length=160, n_fft=1024)
        wav = rng.normal(size=(2, 16000)).astype(np.float32) * 0.1
        mel = proc.waveform_to_mel(wav, 16000)
        assert mel.shape[0:2] == (1, 2)
        assert mel.shape[3] == 64
        assert np.all(np.isfinite(mel))

    def test_resample_length(self, rng):
        proc = AudioProcessor(sample_rate=16000)
        wav = rng.normal(size=(1, 48000)).astype(np.float32)
        out = proc.resample(wav, 48000)
        assert out.shape == (1, 16000)

    def test_log_clip_floor(self):
        proc = AudioProcessor(sample_rate=16000, mel_bins=8, mel_hop_length=160, n_fft=512)
        silent = np.zeros((1, 8000), dtype=np.float32)
        mel = proc.waveform_to_mel(silent, 16000)
        np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-4)

    def test_save_wav_round_trip(self, tmp_path, rng):
        import wave

        from mlx_video_tpu.models.ltx.audio_vae.processing import save_wav

        wav = (rng.normal(size=(2, 1000)) * 0.3).astype(np.float32)
        p = str(tmp_path / "out.wav")
        save_wav(p, wav, 24000)
        with wave.open(p, "rb") as f:
            assert f.getnchannels() == 2
            assert f.getframerate() == 24000
            assert f.getnframes() == 1000


def _torch_audio_helpers():
    """Torch NCHW transcriptions of the reference audio VAE building blocks
    (causal_conv_2d.py:18-101, resnet.py:100-185 PIXEL norm,
    attention.py:20-77, upsample.py:33-89, downsample.py:16-75)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    def t_conv(p, x, causal=True, k=3, stride=1, pad=None):
        w = torch.as_tensor(np.asarray(p["weight"], np.float32)).permute(3, 2, 0, 1)
        b = torch.as_tensor(np.asarray(p["bias"], np.float32))
        if pad is not None:
            x = F.pad(x, pad)
        elif k > 1:
            pw = ((k - 1) // 2, (k - 1) - (k - 1) // 2)
            ph = (k - 1, 0) if causal else pw
            x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))  # (W_l, W_r, H_t, H_b)
        return F.conv2d(x, w, b, stride=stride)

    def t_pn(x, eps=1e-6):
        return x * torch.rsqrt((x.float() ** 2).mean(1, keepdim=True) + eps)

    def t_res(p, x, causal=True):
        h = t_conv(p["conv1"], F.silu(t_pn(x)), causal)
        h = t_conv(p["conv2"], F.silu(t_pn(h)), causal)
        if "nin_shortcut" in p:
            x = t_conv(p["nin_shortcut"], x, causal, k=1)
        return x + h

    def t_attn(p, x):
        h = t_pn(x)
        q, k, v = (t_conv(p[n], h, k=1) for n in ("q", "k", "v"))
        b, c, t, m = q.shape
        q = q.reshape(b, c, t * m).permute(0, 2, 1)
        k = k.reshape(b, c, t * m).permute(0, 2, 1)
        v = v.reshape(b, c, t * m).permute(0, 2, 1)
        w = torch.softmax(q @ k.transpose(1, 2) * c**-0.5, -1)
        h = (w @ v).permute(0, 2, 1).reshape(b, c, t, m)
        return x + t_conv(p["proj_out"], h, k=1)

    def t_upsample(p, x, causal=True):
        x = x.repeat_interleave(2, 2).repeat_interleave(2, 3)
        x = t_conv(p["conv"], x, causal)
        return x[:, :, 1:, :] if causal else x

    def t_downsample(p, x, causal=True):
        # downsample.py:16-75: strided 3x3; causal pads (2,0) time, (0,1) mel
        pad = (0, 1, 2, 0) if causal else (0, 1, 0, 1)
        return t_conv(p["conv"], x, k=3, stride=2, pad=pad)

    import types

    return types.SimpleNamespace(
        torch=torch, F=F, conv=t_conv, pn=t_pn, res=t_res, attn=t_attn,
        upsample=t_upsample, downsample=t_downsample,
    )


class TestTorchCrossAudioDecoder:
    """Independent PyTorch NCHW transcription of the reference audio VAE
    decoder (audio_vae.py:228-458) must match the JAX channels-last
    implementation on shared weights."""

    def test_decoder_matches(self, rng):
        hp = _torch_audio_helpers()
        torch, F = hp.torch, hp.F
        t_conv, t_pn, t_res, t_attn, t_upsample = hp.conv, hp.pn, hp.res, hp.attn, hp.upsample

        from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
            AudioVAEConfig,
            audio_decoder_apply,
            init_audio_decoder,
        )

        cfg = AudioVAEConfig(
            ch=16, ch_mult=(1, 2, 4), num_res_blocks=1, in_channels=2, out_ch=2,
            z_channels=8, mel_bins=64, resolution=64,
            decoder_attn_resolutions=(32,), mid_block_add_attention=True,
        )
        params = init_audio_decoder(jax.random.key(7), cfg, dtype=jnp.float32)
        lat = rng.normal(size=(1, cfg.z_channels, 5, cfg.mel_bins // 4)).astype(np.float32)

        jx = np.asarray(audio_decoder_apply(params, cfg, jnp.asarray(lat)))

        # torch path: denormalize ('b c t f -> b t (c f)' packing) then decode
        x = torch.as_tensor(lat)  # (B, z, T', M')
        b, z, t_lat, m_lat = x.shape
        stats = params["per_channel_statistics"]
        patched = x.permute(0, 2, 1, 3).reshape(b, t_lat, z * m_lat)
        denorm = patched * torch.as_tensor(np.asarray(stats["std_of_means"], np.float32)) \
            + torch.as_tensor(np.asarray(stats["mean_of_means"], np.float32))
        h = denorm.reshape(b, t_lat, z, m_lat).permute(0, 2, 1, 3)  # (B, z, T', M')

        h = t_conv(params["conv_in"], h)
        h = t_res(params["mid"]["block_1"], h)
        h = t_attn(params["mid"]["attn_1"], h)
        h = t_res(params["mid"]["block_2"], h)
        for level in reversed(range(len(cfg.ch_mult))):
            stage = params["up"][str(level)]
            for i in range(cfg.num_res_blocks + 1):
                h = t_res(stage["block"][str(i)], h)
                if str(i) in stage["attn"]:
                    h = t_attn(stage["attn"][str(i)], h)
            if level != 0:
                h = t_upsample(stage["upsample"], h)
        h = t_conv(params["conv_out"], F.silu(t_pn(h)))

        target_t = max(t_lat * cfg.latent_downsample_factor - (cfg.latent_downsample_factor - 1), 1)
        h = h[:, : cfg.out_ch, : min(h.shape[2], target_t), : cfg.mel_bins]
        pad_t, pad_m = target_t - h.shape[2], cfg.mel_bins - h.shape[3]
        if pad_t > 0 or pad_m > 0:
            h = F.pad(h, (0, max(pad_m, 0), 0, max(pad_t, 0)))
        tx = h[:, :, :target_t, : cfg.mel_bins].numpy()

        assert jx.shape == tx.shape, (jx.shape, tx.shape)
        rel = np.abs(jx - tx).max() / np.abs(tx).max()
        assert rel < 5e-4, rel


class TestTorchCrossAudioEncoder:
    """Same cross-check for the encoder path (audio_vae.py:164-218):
    conv_in -> downsampling path -> mid (attn) -> pixel-norm head -> mean
    split -> per-channel normalize."""

    def test_encoder_matches(self, rng):
        hp = _torch_audio_helpers()
        torch, F = hp.torch, hp.F

        from mlx_video_tpu.models.ltx.audio_vae.audio_vae import (
            AudioVAEConfig,
            audio_encoder_apply,
            init_audio_encoder,
        )

        cfg = AudioVAEConfig(
            ch=16, ch_mult=(1, 2, 4), num_res_blocks=1, in_channels=2, out_ch=2,
            z_channels=8, mel_bins=64, resolution=64,
            attn_resolutions=(32,), mid_block_add_attention=True,
        )
        params = init_audio_encoder(jax.random.key(9), cfg, dtype=jnp.float32)
        spec = rng.normal(size=(1, cfg.in_channels, 17, cfg.mel_bins)).astype(np.float32)

        jx = np.asarray(audio_encoder_apply(params, cfg, jnp.asarray(spec)))

        h = torch.as_tensor(spec)
        h = hp.conv(params["conv_in"], h)
        n_res = len(cfg.ch_mult)
        for level in range(n_res):
            stage = params["down"][str(level)]
            for i in range(cfg.num_res_blocks):
                h = hp.res(stage["block"][str(i)], h)
                if str(i) in stage["attn"]:
                    h = hp.attn(stage["attn"][str(i)], h)
            if level != n_res - 1:
                h = hp.downsample(stage["downsample"], h)
        h = hp.res(params["mid"]["block_1"], h)
        h = hp.attn(params["mid"]["attn_1"], h)
        h = hp.res(params["mid"]["block_2"], h)
        h = hp.conv(params["conv_out"], F.silu(hp.pn(h)))

        means = h[:, : cfg.z_channels]  # double_z mean split
        b, z, t_lat, m_lat = means.shape
        stats = params["per_channel_statistics"]
        patched = means.permute(0, 2, 1, 3).reshape(b, t_lat, z * m_lat)
        normalized = (patched - torch.as_tensor(np.asarray(stats["mean_of_means"], np.float32))) \
            / torch.as_tensor(np.asarray(stats["std_of_means"], np.float32))
        tx = normalized.reshape(b, t_lat, z, m_lat).permute(0, 2, 1, 3).numpy()

        assert jx.shape == tx.shape, (jx.shape, tx.shape)
        rel = np.abs(jx - tx).max() / np.abs(tx).max()
        assert rel < 5e-4, rel
