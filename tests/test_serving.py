# coding: utf-8
"""Raw-waveform serving (joeys2t_tpu/serving.py): the fully on-device
wav -> text path must run end-to-end on a trained S2T snapshot, and its
on-device features must match the host SpeechProcessor pipeline."""
import dataclasses
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))

from test_s2t_e2e import REF_SPEECH, s2t_cfg  # noqa: E402

from joeys2t_tpu.helpers import make_model_dir  # noqa: E402
from joeys2t_tpu.hub_interface import load_model_dir  # noqa: E402
from joeys2t_tpu.serving import Transcriber  # noqa: E402
from joeys2t_tpu.training import train  # noqa: E402

needs_ref = pytest.mark.skipif(not REF_SPEECH.is_dir(),
                               reason="reference fixtures absent")


@pytest.fixture(scope="module")
def s2t_model_dir():
    tmp = Path(tempfile.mkdtemp())
    cfg = s2t_cfg(tmp)
    make_model_dir(Path(cfg["model_dir"]))
    train(cfg, skip_test=True)
    cfg["testing"]["load_model"] = "latest.ckpt"
    if dataclasses.is_dataclass(cfg["data"].get("special_symbols")):
        cfg["data"]["special_symbols"] = dataclasses.asdict(
            cfg["data"]["special_symbols"])
    with (Path(cfg["model_dir"]) / "config.yaml").open("w") as f:
        yaml.safe_dump(cfg, f)
    return Path(cfg["model_dir"])


@needs_ref
def test_transcribe_wavs_end_to_end(s2t_model_dir):
    hub = load_model_dir(s2t_model_dir)
    asr = Transcriber.from_hub(hub)
    wavs = sorted(REF_SPEECH.rglob("*.wav"))[:3]
    assert wavs, REF_SPEECH
    texts = asr.transcribe([w.as_posix() for w in wavs])
    assert len(texts) == len(wavs)
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
