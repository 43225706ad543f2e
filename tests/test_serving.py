# coding: utf-8
"""Raw-waveform serving (joeys2t_tpu/serving.py): the fully on-device
wav -> text path must run end-to-end on a trained S2T snapshot, and its
on-device features must match the host SpeechProcessor pipeline."""
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))

from s2t_fixtures import REF_SPEECH  # noqa: E402

from joeys2t_tpu.hub_interface import load_model_dir  # noqa: E402
from joeys2t_tpu.serving import Transcriber  # noqa: E402

needs_ref = pytest.mark.skipif(not REF_SPEECH.is_dir(),
                               reason="reference fixtures absent")


@pytest.fixture(scope="module")
def s2t_model_dir(trained_s2t):
    """The shared session snapshot, with a config.yaml dumped alongside it
    so load_model_dir can pick the model up like a published dir."""
    _, pristine_cfg, model_dir = trained_s2t
    import copy

    cfg = copy.deepcopy(pristine_cfg)
    cfg["testing"]["load_model"] = "latest.ckpt"
    with (model_dir / "config.yaml").open("w") as f:
        yaml.safe_dump(cfg, f)
    return model_dir


@needs_ref
def test_transcribe_wavs_end_to_end(s2t_model_dir):
    hub = load_model_dir(s2t_model_dir)
    asr = Transcriber.from_hub(hub)
    wavs = sorted(REF_SPEECH.rglob("*.wav"))[:3]
    assert wavs, REF_SPEECH
    texts = asr.transcribe([w.as_posix() for w in wavs])
    assert len(texts) == len(wavs)
    assert all(isinstance(t, str) for t in texts)


def test_split_at_low_energy_snaps_to_pauses():
    """Cuts land inside deliberately silent gaps, not mid-'speech'."""
    from joeys2t_tpu.serving import split_at_low_energy

    sr = 16000
    rng = np.random.RandomState(0)
    # 65s of loud noise with 0.4s silences centered at 21s and 43s
    wave = rng.randn(65 * sr).astype(np.float32)
    gaps = [(21.0, 0.4), (43.0, 0.4)]
    for center, width in gaps:
        a = int((center - width / 2) * sr)
        wave[a:a + int(width * sr)] = 0.0

    cuts = split_at_low_energy(wave, sr, chunk_seconds=20.0, search_seconds=5.0)
    assert len(cuts) == 2
    for cut, (center, width) in zip(cuts, gaps):
        assert abs(cut / sr - center) <= width, (cut / sr, center)
    # short audio: no cuts
    assert split_at_low_energy(wave[:10 * sr], sr, chunk_seconds=20.0) == []


def test_split_covers_wave_monotonically():
    from joeys2t_tpu.serving import split_at_low_energy

    sr = 16000
    wave = np.random.RandomState(1).randn(97 * sr).astype(np.float32)
    cuts = split_at_low_energy(wave, sr, chunk_seconds=10.0, search_seconds=3.0)
    bounds = [0] + cuts + [len(wave)]
    assert all(b > a for a, b in zip(bounds[:-1], bounds[1:]))
    # interior chunks are bounded by chunk + search; the final chunk may
    # absorb a sub-half-chunk tail (chunk * 1.5 worst case)
    for a, b in zip(bounds[:-1], bounds[1:]):
        assert (b - a) <= 15.1 * sr


@needs_ref
def test_transcribe_long_chunks_and_joins(s2t_model_dir):
    """transcribe_long splits at the quiet points and joins the per-chunk
    transcripts of the SAME batched path used by transcribe()."""
    hub = load_model_dir(s2t_model_dir)
    asr = Transcriber.from_hub(hub)

    wav_path = sorted(REF_SPEECH.rglob("*.wav"))[0]
    from joeys2t_tpu.data.audio_io import read_wav
    wave, sr = read_wav(wav_path)
    # build a "long" recording: utterance, pause, utterance
    long_wave = np.concatenate(
        [wave, np.zeros(int(0.6 * sr), np.float32), wave])
    chunk_s = len(wave) / sr + 0.2  # force a cut inside the pause

    captured = {}
    orig = asr.transcribe

    def spy(chunks, **kw):
        captured["chunks"] = [np.asarray(c) for c in chunks]
        return orig(chunks, **kw)

    asr.transcribe = spy
    text = asr.transcribe_long(long_wave, chunk_seconds=chunk_s,
                               search_seconds=0.5)
    assert isinstance(text, str)
    assert len(captured["chunks"]) == 2
    # the cut landed inside the inserted pause
    cut = len(captured["chunks"][0])
    assert len(wave) <= cut <= len(wave) + int(0.6 * sr)
    # joined text == join of the per-chunk transcripts
    parts = [t.strip() for t in orig([c for c in captured["chunks"]])]
    assert text == " ".join(p for p in parts if p)


@needs_ref
def test_transcribe_beam(s2t_model_dir):
    """beam_size>1 routes through beam search and still returns one
    transcript per input."""
    hub = load_model_dir(s2t_model_dir)
    asr = Transcriber.from_hub(hub)
    wavs = sorted(REF_SPEECH.rglob("*.wav"))[:2]
    texts = asr.transcribe([w.as_posix() for w in wavs], beam_size=3,
                           beam_alpha=1.0)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


@needs_ref
def test_device_features_match_host_pipeline(s2t_model_dir):
    """device_frontend (eval mode) must reproduce the host SpeechProcessor
    features (fbank + utterance CMVN) on real audio."""
    import jax.numpy as jnp

    from joeys2t_tpu.data.audio_io import read_wav
    from joeys2t_tpu.data.augmentation import CMVN
    from joeys2t_tpu.ops.fbank import fbank_numpy
    from joeys2t_tpu.ops.frontend import device_frontend

    wav_path = sorted(REF_SPEECH.rglob("*.wav"))[0]
    wave, sr = read_wav(wav_path)
    host = fbank_numpy(wave, sample_rate=sr)
    host = CMVN(norm_means=True, norm_vars=True)(host)

    dev, fl = device_frontend(jnp.asarray(wave[None, :]),
                              jnp.asarray([len(wave)], jnp.int32),
                              sample_rate=float(sr), training=False)
    n = int(fl[0])
    assert n == host.shape[0]
    np.testing.assert_allclose(host, np.asarray(dev[0, :n]), atol=2e-3)
