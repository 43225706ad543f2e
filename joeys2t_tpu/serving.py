# coding: utf-8
"""
Raw-waveform ASR serving: wav in -> text out with the entire compute path
(fbank, CMVN, SpecAugment-off, encoder, KV-cached greedy/beam decode) on
device. This is the deployment face of the fused frontend
(ops/frontend.py); the reference has no equivalent — its inference always
round-trips features through the host (joeynmt/helpers_for_audio.py:100-127).

Usage:
    from joeys2t_tpu.zoo import load
    from joeys2t_tpu.serving import Transcriber
    hub = load("local", model_dir="models/librispeech100h")
    asr = Transcriber.from_hub(hub)
    texts = asr.transcribe(["a.wav", "b.wav"])
"""
import bisect
from pathlib import Path
from typing import List, Optional, Sequence, Union

import numpy as np

from joeys2t_tpu.data.audio_io import read_wav
from joeys2t_tpu.ops.frontend import device_frontend
from joeys2t_tpu.search import transformer_greedy
from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)

# waveform-sample buckets: ~1s steps up to 30s at 16kHz, then exact length
_WAVE_BUCKETS = [16000 * i for i in (1, 2, 3, 4, 5, 6, 8, 10, 12, 15, 20, 30)]


def _bucket_samples(n: int) -> int:
    i = bisect.bisect_left(_WAVE_BUCKETS, n)
    return _WAVE_BUCKETS[i] if i < len(_WAVE_BUCKETS) else n


def split_at_low_energy(wave: np.ndarray, sample_rate: float,
                        chunk_seconds: float = 20.0,
                        search_seconds: float = 5.0,
                        frame_ms: float = 25.0) -> List[int]:
    """Cut points for long-audio chunking, snapped to quiet frames.

    Nominal boundaries every ``chunk_seconds`` are moved to the center of
    the minimum-RMS-energy frame within ±``search_seconds``, so chunks
    break at pauses instead of mid-word and the per-chunk transcripts
    concatenate cleanly. Pure host-side numpy (runs once per utterance;
    the model compute stays on device). Returns interior cut points
    (sample indices), excluding 0 and len(wave).
    """
    n = len(wave)
    chunk = int(chunk_seconds * sample_rate)
    if n <= chunk:
        return []
    frame = max(1, int(frame_ms / 1e3 * sample_rate))
    # frame RMS energy at frame_ms resolution (trailing partial frame kept)
    n_frames = (n + frame - 1) // frame
    padded = np.zeros(n_frames * frame, np.float64)
    padded[:n] = np.asarray(wave, np.float64)
    energy = (padded.reshape(n_frames, frame) ** 2).mean(axis=1)
    search = max(1, int(search_seconds * sample_rate) // frame)

    cuts: List[int] = []
    pos = chunk
    # don't cut when the remaining tail is under half a chunk — a
    # degenerate 1-2s final chunk decodes worse than absorbing it
    while n - pos > chunk // 2:
        center = pos // frame
        lo = max(0, center - search)
        hi = min(n_frames, center + search + 1)
        best = lo + int(np.argmin(energy[lo:hi]))
        cut = min(n - 1, best * frame + frame // 2)
        if cuts and cut <= cuts[-1]:  # monotone guard for tiny chunks
            cut = min(n - 1, cuts[-1] + frame)
        cuts.append(cut)
        pos = cut + chunk
    return cuts


class Transcriber:
    """Batched wav -> text with on-device feature extraction."""

    def __init__(self, params, model, spec, trg_vocab, tokenizer=None,
                 norm_means: bool = True, norm_vars: bool = True,
                 sample_rate: float = 16000.0, num_mel_bins: int = 80):
        self.params = params
        self.model = model
        self.spec = spec
        self.trg_vocab = trg_vocab
        self.tokenizer = tokenizer  # trg tokenizer for post_process (optional)
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        self.sample_rate = sample_rate
        self.num_mel_bins = num_mel_bins

        import jax
        import jax.numpy as jnp

        @jax.jit
        def _encode(params, feats, frame_lengths):
            # zero padded frames so conv subsampling sees silence
            t = feats.shape[1]
            valid = jnp.arange(t)[None, :] < frame_lengths[:, None]
            feats = jnp.where(valid[:, :, None], feats, 0.0)
            return self.model.apply({"params": params}, feats, frame_lengths,
                                    None, method="encode")

        self._encode = _encode  # compiles once per waveform bucket

    @classmethod
    def from_hub(cls, hub) -> "Transcriber":
        """Build from a TranslatorHubInterface (zoo.load / load_model_dir)."""
        assert hub.args.task == "S2T", "Transcriber requires an S2T model"
        data = hub.dataset
        sp = data.tokenizer.get(data.src_lang)
        cmvn = getattr(sp, "cmvn", None)
        return cls(
            params=hub.params, model=hub.model, spec=hub.spec,
            trg_vocab=data._trg_vocab,
            tokenizer=data.tokenizer.get(data.trg_lang),
            norm_means=bool(getattr(cmvn, "norm_means", True)),
            norm_vars=bool(getattr(cmvn, "norm_vars", True)),
        )

    def transcribe(self, wavs: Sequence[Union[str, Path, np.ndarray]],
                   max_output_length: Optional[int] = None,
                   **generate_kwargs) -> List[str]:
        """:param wavs: wav file paths or int16-scaled float waveforms
        :return: one transcript per input"""
        import jax
        import jax.numpy as jnp

        waves = []
        for w in wavs:
            if isinstance(w, (str, Path)):
                wave, sr = read_wav(w)
                assert sr == self.sample_rate, (sr, self.sample_rate)
            else:
                wave = np.asarray(w, np.float32)
            waves.append(wave)

        n_pad = _bucket_samples(max(len(w) for w in waves))
        batch = np.zeros((len(waves), n_pad), np.float32)
        lengths = np.zeros((len(waves),), np.int32)
        for i, w in enumerate(waves):
            batch[i, :len(w)] = w[:n_pad]
            lengths[i] = min(len(w), n_pad)
        return self.transcribe_batch(batch, lengths,
                                     max_output_length=max_output_length,
                                     **generate_kwargs)

    def transcribe_long(self, wav: Union[str, Path, np.ndarray],
                        chunk_seconds: float = 20.0,
                        search_seconds: float = 5.0,
                        separator: str = " ",
                        **generate_kwargs) -> str:
        """Transcribe audio of arbitrary length.

        The reference S2T pipeline filters/truncates long utterances at
        ``max_length`` frames (joeynmt/tokenizers.py:477-484) — it cannot
        transcribe a recording longer than its training window. Here the
        waveform is split at low-energy (pause) points near every
        ``chunk_seconds`` boundary (:func:`split_at_low_energy`), the
        chunks are decoded as ONE batch through the on-device pipeline
        (padded to a common bucket, so a 10-minute recording costs one
        encoder/decoder dispatch), and the chunk transcripts are joined.

        :param wav: path or int16-scaled float waveform
        :param chunk_seconds: nominal chunk length; keep within the
            model's trained utterance-length range
        :param search_seconds: how far a boundary may move to find a pause
        :return: the joined transcript
        """
        if isinstance(wav, (str, Path)):
            wave, sr = read_wav(wav)
            assert sr == self.sample_rate, (sr, self.sample_rate)
        else:
            wave = np.asarray(wav, np.float32)
        cuts = split_at_low_energy(wave, self.sample_rate, chunk_seconds,
                                   search_seconds)
        bounds = [0] + cuts + [len(wave)]
        chunks = [wave[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
        texts = self.transcribe(chunks, **generate_kwargs)
        return separator.join(t for t in (s.strip() for s in texts) if t)

    def transcribe_batch(self, waveforms, lengths,
                         max_output_length: Optional[int] = None,
                         beam_size: int = 1, beam_alpha: float = 1.0,
                         **generate_kwargs) -> List[str]:
        """Batched fast path: ``waveforms`` is a (B, N) float32 array padded
        to a common length (host or already on device — passing a device
        array skips the host->device waveform upload), ``lengths`` the valid
        samples per row. ``beam_size > 1`` decodes with beam search + GNMT
        length penalty ``beam_alpha`` (the published-WER protocol uses
        beam 5); the default stays greedy for throughput."""
        import jax.numpy as jnp

        feats, frame_lengths = device_frontend(
            jnp.asarray(waveforms), jnp.asarray(lengths),
            sample_rate=self.sample_rate, num_mel_bins=self.num_mel_bins,
            norm_means=self.norm_means, norm_vars=self.norm_vars,
            training=False)
        enc, _, enc_mask = self._encode(self.params, feats, frame_lengths)
        if max_output_length is None:
            max_output_length = int(enc.shape[1] * 1.5) + 8
        if beam_size > 1:
            from joeys2t_tpu.search import beam_search
            out, _, _ = beam_search(
                self.params, self.model, self.spec, enc, None, enc_mask,
                beam_size, max_output_length, alpha=beam_alpha, n_best=1,
                **generate_kwargs)
        else:
            out, _, _ = transformer_greedy(
                self.params, self.model, self.spec, enc, enc_mask,
                max_output_length, **generate_kwargs)

        sents = self.trg_vocab.arrays_to_sentences(out, cut_at_eos=True)
        texts = []
        for tokens in sents:
            tokens = [t for t in tokens
                      if t not in (self.trg_vocab.specials[1],
                                   self.trg_vocab.specials[3])]
            if self.tokenizer is not None:
                texts.append(self.tokenizer.post_process(tokens))
            else:
                texts.append(" ".join(tokens))
        return texts
