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
