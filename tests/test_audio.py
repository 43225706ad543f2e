# coding: utf-8
"""Audio front-end golden tests.

The key cross-framework check: our first-party kaldi fbank vs the golden
values the reference stored from torchaudio.compliance.kaldi.fbank
(test/unit/test_tokenizer.py:322-327, wav 260-123440-1.wav + CMVN)."""
from pathlib import Path

import numpy as np
import pytest

from joeys2t_tpu.data.audio_io import get_features, pad_features, read_wav
from joeys2t_tpu.data.augmentation import CMVN, SpecAugment, cmvn_jax, specaugment_jax
from joeys2t_tpu.ops.fbank import fbank_numpy, num_frames

REF_WAV_DIR = Path("/root/reference/test/data/speech/wav")
needs_ref = pytest.mark.skipif(not REF_WAV_DIR.is_dir(), reason="reference fixtures absent")


class TestFbank:
    @needs_ref
    def test_matches_torchaudio_kaldi_golden(self):
        wav, sr = read_wav(REF_WAV_DIR / "260-123440-1.wav")
        assert sr == 16000
        feats = fbank_numpy(wav, sample_rate=sr, num_mel_bins=80)
        assert feats.shape == (172, 80)  # n_frames column in test.tsv
        normed = CMVN(norm_means=True, norm_vars=True, before=True)(feats)
        expected = np.array([
            -1.0788909, -1.0076448, -1.0421542, -1.0393586, -1.0239305,
            -0.9921213, -0.95107234, -0.9340749, -0.9119267, -0.8962079,
        ])
        np.testing.assert_allclose(normed[0, :10], expected, atol=1e-4)

    @needs_ref
    def test_jax_matches_numpy(self):
        from joeys2t_tpu.ops.fbank import fbank_jax

        wav, sr = read_wav(REF_WAV_DIR / "260-123440-0.wav")
        np_feats = fbank_numpy(wav, sample_rate=sr)
        jx_feats = np.asarray(fbank_jax(wav))
        assert np_feats.shape == jx_feats.shape
        np.testing.assert_allclose(np_feats, jx_feats, atol=2e-3)

    def test_num_frames(self):
        # 25ms window / 10ms shift at 16k: 400 samples window, 160 shift
        assert num_frames(400) == 1
        assert num_frames(399) == 0
        assert num_frames(560) == 2
        assert num_frames(16000) == 98

    @needs_ref
    def test_wav_feature_lookup(self):
        feats = get_features(REF_WAV_DIR.parent, "wav/260-123440-1.wav")
        assert feats.shape == (172, 80)


class TestPadFeatures:
    def test_pad_and_trim(self):
        feats = [np.ones((5, 4), np.float32), np.ones((3, 4), np.float32) * 2]
        padded, lengths, _ = pad_features(feats, embed_size=4, pad_index=1)
        assert padded.shape == (2, 5, 4)
        assert lengths == [5, 3]
        # pad value is float(pad_index) == 1.0 (joeynmt/helpers_for_audio.py:152)
        assert padded[1, 4, 0] == 1.0


class TestAugmentation:
    def test_cmvn(self):
        rng = np.random.RandomState(0)
        x = rng.randn(50, 8).astype(np.float32) * 3 + 5
        out = CMVN(norm_means=True, norm_vars=True)(x)
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-2)

    def test_cmvn_jax_matches_numpy(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(1)
        x = rng.randn(40, 8).astype(np.float32)
        np_out = CMVN()(x)
        jx_out = np.asarray(cmvn_jax(jnp.asarray(x)))
        np.testing.assert_allclose(np_out, jx_out, atol=1e-5)

    def test_specaugment_masks(self):
        np.random.seed(3)
        x = np.ones((100, 80), np.float32)
        sa = SpecAugment(freq_mask_n=2, freq_mask_f=27, time_mask_n=2, time_mask_t=40)
        out = sa(x)
        assert out.shape == x.shape
        # masked cells take the mean value (==1.0 here, so count via identity)
        x2 = np.arange(100 * 80, dtype=np.float32).reshape(100, 80)
        out2 = sa(x2)
        assert (out2 != x2).any()  # something was masked

    def test_specaugment_too_few_freqs_is_noop(self):
        x = np.ones((10, 5), np.float32)
        sa = SpecAugment(freq_mask_f=27)
        np.testing.assert_array_equal(sa(x), x)

    def test_specaugment_jax(self):
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(np.random.RandomState(0).randn(60, 80).astype(np.float32))
        out = specaugment_jax(jax.random.PRNGKey(0), x, jnp.int32(60))
        assert out.shape == x.shape
        assert bool((np.asarray(out) != np.asarray(x)).any())


class TestDeviceFrontend:
    @needs_ref
    def test_matches_host_pipeline(self):
        """device_frontend == host fbank+CMVN on real audio (eval mode)."""
        import jax
        import jax.numpy as jnp

        from joeys2t_tpu.ops.frontend import device_frontend

        wav1, sr = read_wav(REF_WAV_DIR / "260-123440-1.wav")
        wav2, _ = read_wav(REF_WAV_DIR / "260-123440-0.wav")
        n = max(len(wav1), len(wav2))
        batch = np.zeros((2, n), np.float32)
        batch[0, :len(wav1)] = wav1
        batch[1, :len(wav2)] = wav2
        lengths = jnp.asarray([len(wav1), len(wav2)])

        feats, frame_lengths = device_frontend(
            jnp.asarray(batch), lengths, training=False)

        host1 = CMVN()(fbank_numpy(wav1, sample_rate=sr))
        host2 = CMVN()(fbank_numpy(wav2, sample_rate=sr))
        assert int(frame_lengths[0]) == host1.shape[0]
        assert int(frame_lengths[1]) == host2.shape[0]
        np.testing.assert_allclose(np.asarray(feats[0, :host1.shape[0]]), host1,
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(feats[1, :host2.shape[0]]), host2,
                                   atol=5e-3)
        # padded frames zeroed
        np.testing.assert_allclose(np.asarray(feats[1, host2.shape[0]:]), 0.0)

    @needs_ref
    def test_training_mode_applies_specaugment(self):
        import jax
        import jax.numpy as jnp

        from joeys2t_tpu.ops.frontend import device_frontend

        wav, sr = read_wav(REF_WAV_DIR / "260-123440-1.wav")
        batch = jnp.asarray(wav[None, :])
        lengths = jnp.asarray([len(wav)])
        f_eval, _ = device_frontend(batch, lengths, training=False)
        f_train, _ = device_frontend(batch, lengths, rng=jax.random.PRNGKey(1),
                                     training=True,
                                     specaugment=(2, 27, 2, 40, 1.0))
        assert bool((np.asarray(f_eval) != np.asarray(f_train)).any())


class TestNativeFbank:
    """C++ fbank (native/fbank.cpp) must match the numpy implementation
    bit-closely on random and real waveforms, including odd frame counts."""

    def test_matches_numpy(self):
        from joeys2t_tpu.native import fbank_native
        from joeys2t_tpu.ops.fbank import fbank_numpy

        if fbank_native(np.zeros(400, np.float32)) is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.RandomState(7)
        for n in (400, 559, 16000, 16000 * 3 + 160):
            wav = (rng.randn(n) * 12000).astype(np.float32)
            a = fbank_numpy(wav)
            b = fbank_native(wav)
            assert a.shape == b.shape
            if a.size:
                np.testing.assert_allclose(a, b, atol=5e-5)

    def test_short_waveform_empty(self):
        from joeys2t_tpu.native import fbank_native

        out = fbank_native(np.zeros(100, np.float32))
        if out is None:
            pytest.skip("native toolchain unavailable")
        assert out.shape == (0, 80)


def _encode_mp3_with_lame(wav: "np.ndarray", sr: int, out_path: Path) -> bool:
    """Encode int16-scale mono audio to mp3 via the system libmp3lame
    (test fixture generation only). Returns False if lame is unavailable."""
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("mp3lame") or "libmp3lame.so.0"
    try:
        lame = ctypes.CDLL(name)
    except OSError:
        return False
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, 1)
    lame.lame_set_mode(gfp, 3)  # mono
    lame.lame_set_brate(gfp, 128)
    assert lame.lame_init_params(gfp) >= 0
    pcm = wav.astype(np.int16)
    n = len(pcm)
    buf = ctypes.create_string_buffer(int(1.25 * n + 7200))
    written = lame.lame_encode_buffer(
        gfp, pcm.ctypes.data_as(ctypes.c_void_p), None, n, buf, len(buf))
    assert written >= 0, written
    out = buf.raw[:written]
    flushed = lame.lame_encode_flush(gfp, buf, len(buf))
    out += buf.raw[:flushed]
    lame.lame_close(gfp)
    out_path.write_bytes(out)
    return True


class TestMp3:
    @needs_ref
    def test_mp3_feature_lookup_roundtrip(self, tmp_path):
        """get_features('x.mp3') decodes via libmpg123 and produces fbank
        features close to the original wav's (mp3 is lossy; compare
        mean-abs over aligned frames). Covers the reference's .mp3 path
        (joeynmt/helpers_for_audio.py:100-127)."""
        from joeys2t_tpu.data.audio_io import get_features, read_mp3

        wav, sr = read_wav(REF_WAV_DIR / "260-123440-1.wav")
        mp3_path = tmp_path / "a.mp3"
        if not _encode_mp3_with_lame(wav, sr, mp3_path):
            pytest.skip("libmp3lame not available to build the fixture")

        decoded, sr2 = read_mp3(mp3_path)
        assert sr2 == sr
        # lame adds ~2100 samples of codec delay + padding; allow 0.25s
        assert abs(len(decoded) - len(wav)) < 0.25 * sr

        feats_mp3 = get_features(tmp_path, "a.mp3")
        feats_wav = get_features(REF_WAV_DIR.parent, "wav/260-123440-1.wav")
        assert feats_mp3.shape[1] == feats_wav.shape[1] == 80
        n = min(len(feats_mp3), len(feats_wav))
        # find the frame offset (encoder delay) with the best alignment
        best = min(
            float(np.mean(np.abs(feats_mp3[off:off + n - 20] - feats_wav[:n - 20])))
            for off in range(0, 20))
        assert best < 1.0, best  # log-mel features, typical range ~5-20
